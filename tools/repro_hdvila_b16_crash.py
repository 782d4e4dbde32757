#!/usr/bin/env python
"""Minimize the HD-VILA stage-2 b=16 TPU compile crash (r4 verdict ask #8).

The reference stage-2 recipe (batch 16/chip,
``/root/reference/hd-vila/src/configs/pretrain_stage2.json``) reproducibly
kills XLA's ``tpu_compile_helper`` subprocess (exit code 1 — an infra
crash, not a ResourceExhausted) on this toolchain; PERF.md documents it and
the runner auto-falls back to 2×8 grad accumulation
(``cli/run_pretrain_hdvila.py:apply_stage2_batch_fallback``). This tool
produces the committed repro artifact:

1. builds the exact stage-2 train step at a given batch size,
2. attempts lower+compile in THIS process (the helper crash surfaces as a
   jax XlaRuntimeError / internal error, not a Python segfault),
3. on failure, bisects along the model-size axes (BERT depth, encoder
   frames, spatial crop) to the smallest configuration that still crashes,
4. dumps the crashing config + the HLO of the smallest repro to
   ``--out_dir`` (default ``tools/crash_artifacts/``).

Bounded: ``--max_attempts`` caps total compile attempts (cold compiles at
this scale run 10-25 min each). Run on the real chip:
    python tools/repro_hdvila_b16_crash.py --max_attempts 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_step(batch: int, bert_layers: int | None, crop=(640, 1024), n_frm=7):
    """The bench_report stage-2 recipe, parametrized for bisection."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.bert import BertConfig
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig
    from xpretrain_tpu.optim import build_optimizer, get_schedule

    enc_cfg = HdVilaEncoderConfig(
        hidden_size=1024, dtype=jnp.bfloat16, timesformer_frames=n_frm)
    model_kwargs = {}
    if bert_layers is not None:
        bert = BertConfig.bert_large(stage_bounds=(min(12, bert_layers),))
        import dataclasses

        bert = dataclasses.replace(bert, num_hidden_layers=bert_layers)
        model_kwargs["bert"] = bert
    model_cfg = HdVilaModelConfig(stage=2, dtype=jnp.bfloat16, **model_kwargs)
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=0.05)
    rng = np.random.default_rng(0)
    lo = (crop[0] // 4, crop[1] // 4)
    b = batch
    middle = jnp.asarray(rng.integers(0, 255, size=(b, 2, 3, *crop)).astype(np.float32))
    other = jnp.asarray(
        rng.integers(0, 255, size=(b, 2, n_frm - 1, 3, *lo)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 30000, size=(b, 50)).astype(np.int32))
    mask = jnp.ones((b, 50), jnp.int32)
    mlm = np.full((b, 50), -100, np.int32)
    mlm[:, 3:15] = rng.integers(2, 30000, size=(b, 12))
    mlm = jnp.asarray(mlm)
    params = model.init(
        jax.random.PRNGKey(0), middle[:1], other[:1], ids[:1], mask[:1],
        mlm_labels=mlm[:1],
    )["params"]
    tx, _ = build_optimizer(params, get_schedule("cosine", 5e-5, 1000))

    import optax

    def step(params, opt_state, middle, other, ids, mask, mlm):
        def loss_of(p):
            out = model.apply({"params": p}, middle, other, ids, mask, mlm_labels=mlm)
            return out["loss"].astype(jnp.float32)

        loss, g = jax.value_and_grad(loss_of)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, loss

    args = (params, tx.init(params), middle, other, ids, mask, mlm)
    return jax.jit(step, donate_argnums=(0, 1)), args


def attempt(tag: str, batch: int, bert_layers, crop, n_frm, out_dir: str) -> dict:
    import jax

    t0 = time.time()
    rec = {"tag": tag, "batch": batch, "bert_layers": bert_layers,
           "crop": list(crop), "n_frm": n_frm}
    try:
        step, args = build_step(batch, bert_layers, crop, n_frm)
        lowered = step.lower(*args)
        # keep the HLO BEFORE compiling, so a crash still leaves the artifact
        hlo_path = os.path.join(out_dir, f"{tag}.stablehlo.txt")
        with open(hlo_path, "w") as f:
            f.write(lowered.as_text())
        rec["hlo"] = hlo_path
        lowered.compile()
        rec["result"] = "compiled"
    except Exception as e:  # noqa: BLE001
        rec["result"] = "crashed"
        rec["error"] = f"{type(e).__name__}: {str(e)[:500]}"
        rec["traceback_tail"] = traceback.format_exc()[-1000:]
    finally:
        rec["seconds"] = round(time.time() - t0, 1)
        jax.clear_caches()
        import gc

        gc.collect()
    print(json.dumps({k: rec[k] for k in rec if k != "traceback_tail"}), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_attempts", type=int, default=4)
    ap.add_argument("--out_dir", default=os.path.join(os.path.dirname(__file__), "crash_artifacts"))
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    # bisection ladder: full repro first, then progressively smaller slices.
    # Each entry: (tag, batch, bert_layers, crop, n_frm)
    ladder = [
        ("b16_full", 16, None, (640, 1024), 7),          # the crashing recipe
        ("b16_bert12", 16, 12, (640, 1024), 7),          # half the BERT
        ("b16_bert4", 16, 4, (640, 1024), 7),            # minimal fusion tower
        ("b16_crop320", 16, None, (320, 512), 7),        # quarter the pixels
        ("b8_full", 8, None, (640, 1024), 7),            # known-good control
    ]
    results = []
    crashed_smallest = None
    for entry in ladder[: args.max_attempts]:
        rec = attempt(*entry, args.out_dir)
        results.append(rec)
        if rec["result"] == "crashed":
            crashed_smallest = rec
    report = {"results": results, "smallest_crash": crashed_smallest}
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out_dir}/report.json")


if __name__ == "__main__":
    main()
