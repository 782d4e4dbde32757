"""Retrieval evaluation: the minimum end-to-end slice of the framework.

Mirrors the reference eval loop (``CLIP-ViP/src/tasks/run_video_retrieval.py:122-203``):
per-batch forward -> cross-device feature gather -> trim sampler padding ->
similarity matrix -> R@K raw + DSL. Here the gather happens on-device via the
eval step's replicated out_sharding; the metric block is numpy.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

from xpretrain_tpu.utils.logging import LOGGER
from xpretrain_tpu.utils.metrics import retrieval_report


def _host_rows(x) -> np.ndarray:
    """Fetch batch metadata (e.g. clip ids) to host, assembling the global
    value when the array is sharded across processes (the multi-process
    analogue of the reference's ``hvd.allgather`` on ids,
    ``run_video_retrieval.py:137-138``). Process-tiled order matches the
    data-axis shard order, so global row order is preserved."""
    import jax

    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def evaluate_multichoice_by_similarity(
    eval_step: Callable,
    params: Any,
    loader,
    valid_len: int | None = None,
) -> dict[str, float]:
    """MSR-VTT-MC style eval: a retrieval model scores N candidate texts per
    video; prediction = argmax similarity (ref ``hd-vila/src/tasks/
    run_msrvtt_mc.py:145-316``, eval logic ``dataset_video_mc.py:174-194``).

    Batches must carry ``video`` (or the model's visual inputs), text inputs
    shaped [B, n_choice, L] flattened by the caller's collator to
    [B*n_choice, L], plus ``labels`` [B].
    """
    correct, total = 0, 0
    for batch in loader:
        labels = np.asarray(batch.pop("labels"))
        out = eval_step(params, batch)
        vis = np.asarray(out["vis_features"], dtype=np.float32)  # [B, D]
        txt = np.asarray(out["text_features"], dtype=np.float32)  # [B*n_choice, D]
        n_choice = txt.shape[0] // vis.shape[0]
        sims = np.einsum(
            "bd,bcd->bc", vis, txt.reshape(vis.shape[0], n_choice, -1)
        )
        pred = sims.argmax(-1)
        n = len(labels) if valid_len is None else min(len(labels), valid_len - total)
        correct += int((pred[:n] == labels[:n]).sum())
        total += n
    acc = correct / max(total, 1)
    LOGGER.info("multi-choice accuracy: %.4f (%d samples)", acc, total)
    return {"accuracy": acc, "n": total}


def evaluate_retrieval(
    eval_step: Callable,
    params: Any,
    loader,
    valid_len: int | None = None,
    save_feats_path: str | None = None,
) -> dict[str, dict[str, float]]:
    """Run retrieval eval; ``loader`` yields device-ready batches.

    Returns the metric report plus a ``perf`` block with wall time and
    clips/sec (the reference logs wall-clock at ``run_pretrain.py:186``).
    ``save_feats_path`` dumps the gathered features as .npz (the reference's
    ``save_feat`` option, ``run_video_retrieval.py:233``).
    """
    vis_chunks, text_chunks, id_chunks = [], [], []
    start = time.time()
    n_clips = 0
    for batch in loader:
        out = eval_step(params, batch)
        vis_chunks.append(np.asarray(out["vis_features"], dtype=np.float32))
        text_chunks.append(np.asarray(out["text_features"], dtype=np.float32))
        if "ids" in batch:
            id_chunks.append(_host_rows(batch["ids"]))
        n_clips += vis_chunks[-1].shape[0]
    wall = time.time() - start
    vis = np.concatenate(vis_chunks)
    text = np.concatenate(text_chunks)
    ids = np.concatenate(id_chunks) if id_chunks else None
    if valid_len is not None:
        vis, text = vis[:valid_len], text[:valid_len]
        ids = ids[:valid_len] if ids is not None else None
    if save_feats_path is not None:
        extra = {"ids": ids} if ids is not None else {}
        np.savez(save_feats_path, vis_features=vis, text_features=text, **extra)
    sim_t2v = text @ vis.T
    report = retrieval_report(sim_t2v)
    report["perf"] = {"wall_s": wall, "clips_per_s": n_clips / max(wall, 1e-9)}
    LOGGER.info(
        "retrieval eval: t2v R1=%.2f R5=%.2f R10=%.2f (DSL R1=%.2f) | %.1f clips/s",
        report["t2v"]["R1"],
        report["t2v"]["R5"],
        report["t2v"]["R10"],
        report["t2v_dsl"]["R1"],
        report["perf"]["clips_per_s"],
    )
    return report
