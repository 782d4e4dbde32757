"""Extended benchmark: per-family throughput on the real TPU chip.

Beyond bench.py's headline metric, measures representative forward configs
of all three model families and writes PERF.md. Run manually:
    python tools/bench_report.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (per chip)


def flops_of(jitted, *args) -> float:
    """Analytic FLOPs of an already-jitted callable on example args."""
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0))
    except Exception:
        return 0.0


def with_mfu(row, flops, t):
    row["tflops"] = round(flops / 1e12, 1)
    row["mfu_pct"] = round(100.0 * flops / max(t, 1e-9) / V5E_PEAK_BF16, 1)
    return row


def median_time(fn, warmup=3, iters=8):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_clipvip(quick=False):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel

    model = CLIPViPModel(CLIPVipConfig.base_patch32(dtype=jnp.bfloat16))
    b = 64 if quick else 256
    f, im, s = 12, 224, 70
    ids = np.zeros((b, s), np.int64)
    ids[:, 0], ids[:, 1:10], ids[:, 10] = 49406, 500, 49407
    ids = jnp.asarray(ids)
    mask = (ids > 0).astype(jnp.int32)

    @jax.jit
    def gen(key):
        return jax.random.randint(key, (b, f, im, im, 3), 0, 255, jnp.int32).astype(jnp.uint8)

    video = gen(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])
    fwd = jax.jit(lambda p, v, i, m: model.apply(p, v, i, m))

    def run():
        return float(np.asarray(fwd(params, video, ids, mask)["vis_features"])[0, 0])

    t = median_time(run)
    return with_mfu(
        {"model": "CLIP-ViP B/32 (12f 224², u8 ingest)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)},
        flops_of(fwd, params, video, ids, mask), t)


def bench_lfvila(quick=False):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D

    cfg = Swin3DConfig(dtype=jnp.bfloat16)  # full 128-dim HTWA encoder
    model = SwinTransformer3D(cfg)
    b = 2 if quick else 8
    video = jnp.zeros((b, 3, 32, 192, 320), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1])
    # reduce on device: fetching full outputs over the device tunnel would
    # dominate the timing
    fwd = jax.jit(lambda p, v: jnp.sum(model.apply(p, v)[0].astype(jnp.float32)))

    def run():
        return float(np.asarray(fwd(params, video)))

    t = median_time(run, warmup=2, iters=5)
    return with_mfu(
        {"model": "LF-VILA Swin3D/HTWA (32f 192×320)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)},
        flops_of(fwd, params, video), t)


def bench_hdvila(quick=False):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoder, HdVilaEncoderConfig

    cfg = HdVilaEncoderConfig(dtype=jnp.bfloat16)
    model = HdVilaEncoder(cfg)
    b, clips, frm = (1, 1, 7) if quick else (4, 2, 7)
    middle = jnp.zeros((b, clips, 3, 640, 1024), jnp.float32)
    other = jnp.zeros((b, clips, frm - 1, 3, 160, 256), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), middle[:1], other[:1])
    fwd = jax.jit(lambda p, m, o: jnp.sum(model.apply(p, m, o).astype(jnp.float32)))

    def run():
        return float(np.asarray(fwd(params, middle, other)))

    t = median_time(run, warmup=2, iters=5)
    return with_mfu(
        {"model": "HD-VILA hybrid encoder (2×7f, 640×1024 middle)", "batch": b * clips,
         "ms": round(t * 1000, 1), "clips_per_s": round(b * clips / t, 1)},
        flops_of(fwd, params, middle, other), t)


def bench_clipvip_train(quick=False):
    """Full pretrain step (fwd+bwd+grouped-AdamW) — the steps/sec metric."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
    from xpretrain_tpu.ops.losses import build_loss_fn
    from xpretrain_tpu.optim import build_optimizer, get_schedule
    from xpretrain_tpu.parallel.mesh import create_mesh
    from xpretrain_tpu.parallel.train_step import TrainState, make_train_step

    # remat off: rematerialization measured slower at these batches (b=32:
    # 188 vs 202 clips/s, b=64: 207 vs 241) and HBM has ample headroom; remat
    # stays available via the --gradient_checkpointing flag when memory-tight.
    model = CLIPViPModel(CLIPVipConfig.base_patch32(dtype=jnp.bfloat16, remat=False))
    b = 16 if quick else 32  # reference pretrain batch/GPU = 32
    f, im, s = 12, 224, 70
    ids = np.zeros((b, s), np.int64)
    ids[:, 0], ids[:, 1:10], ids[:, 10] = 49406, 500, 49407
    ids = jnp.asarray(ids)
    mask = (ids > 0).astype(jnp.int32)

    @jax.jit
    def gen(key):
        return jax.random.randint(key, (b, f, im, im, 3), 0, 255, jnp.int32).astype(jnp.uint8)

    video = gen(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1])["params"]
    sched = get_schedule("cosine", 5e-6, 100000)
    tx, _ = build_optimizer(params, sched, weight_decay=0.2)
    mesh = create_mesh()
    step = make_train_step(
        lambda p, batch, rng: model.apply(
            {"params": p}, batch["video"], batch["ids"], batch["mask"],
            deterministic=False, rngs={"dropout": rng},
        ),
        tx, mesh, build_loss_fn("NCELearnableTempLoss"), donate=False,
    )
    state = TrainState.create(params, tx)
    batch = {"video": video, "ids": ids, "mask": mask}

    def run():
        nonlocal state
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(np.asarray(metrics["loss"]))

    t = median_time(run, warmup=2, iters=5)
    return with_mfu(
        {"model": "CLIP-ViP B/32 TRAIN step (fwd+bwd+AdamW)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)},
        flops_of(step, state, batch, jax.random.PRNGKey(1)), t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="PERF.md")
    args = p.parse_args()
    rows = []
    for fn in (bench_clipvip, bench_clipvip_train, bench_lfvila, bench_hdvila):
        try:
            row = fn(args.quick)
            rows.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{fn.__name__} failed: {e}", flush=True)
    import jax

    with open(args.out, "w") as f:
        f.write("# PERF — throughput + MFU on one chip\n\n")
        f.write(f"Device: {jax.devices()[0]}\n\n")
        f.write("MFU = XLA-analytic FLOPs / wall time / 197 TFLOP/s (v5e bf16 peak).\n")
        f.write("The convolutional HD-VILA path and the u8-ingest CLIP-ViP forward are\n")
        f.write("HBM-bandwidth- and transfer-shaped respectively, so their compute MFU\n")
        f.write("understates hardware utilization; the train row is the roofline-relevant\n")
        f.write("number for BASELINE.json's step-time target.\n\n")
        f.write("| model | batch | step ms | clips/s | TFLOPs | MFU |\n|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['model']} | {r['batch']} | {r['ms']} | {r['clips_per_s']} "
                    f"| {r.get('tflops', 0)} | {r.get('mfu_pct', 0)}% |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
