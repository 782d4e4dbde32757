"""Extended benchmark: per-family throughput on the real TPU chip.

Beyond bench.py's headline metric, measures representative forward configs
of all three model families plus the CLIP-ViP train step, and writes a
markdown table. Run manually:
    python tools/bench_report.py [--quick] [--out PERF_TABLE.md]

Methodology: every row is scan-chained — K iterations inside ONE jit via
``lax.scan`` with a data-dependent carry (XLA cannot hoist the body), a
single scalar fetched per timing, per-step = wall/K. Per-call timings on a
tunneled chip carry ~28 ms RTT plus pytree-size-dependent dispatch overhead
(PERF.md "dispatch overhead") and overstate step time badly for sub-100 ms
steps; scan chaining removes both.
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


def scan_timed(body, args, K, warmup=1, iters=5):
    """Median per-step time + per-step FLOPs of ``body(carry, *args)``
    chained K times inside one jit. ``body`` must return a f32 scalar carry
    derived from its output (data dependence defeats loop hoisting)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_k(c0, *a):
        def step(c, _):
            return body(c, *a), None

        c, _ = jax.lax.scan(step, c0, None, length=K)
        return c

    for i in range(warmup):
        float(run_k(jnp.float32(i), *args))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(run_k(jnp.float32(i + 1), *args))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2] / K
    # XLA cost_analysis counts the while-loop body ONCE (verified against
    # the analytic per-step FLOPs of the unrolled forward), so no /K here.
    return t, flops_of(run_k, jnp.float32(0), *args)


def bench_clipvip(quick=False):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel

    model = CLIPViPModel(CLIPVipConfig.base_patch32(dtype=jnp.bfloat16))
    b = 8 if quick else 24  # measured serving optimum (PERF.md batch sweep)
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

    def body(c, params, video, ids, mask):
        v = video.at[0, 0, 0, 0, 0].set(c.astype(jnp.uint8))
        out = model.apply(params, v, ids, mask)
        return out["vis_features"][0, 0].astype(jnp.float32)

    t, flops = scan_timed(body, (params, video, ids, mask), K=10 if not quick else 3)
    return with_mfu(
        {"model": "CLIP-ViP B/32 (12f 224², u8 ingest, serving batch)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t)


def bench_lfvila(quick=False):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D

    cfg = Swin3DConfig(dtype=jnp.bfloat16)  # full 128-dim HTWA encoder
    model = SwinTransformer3D(cfg)
    b = 2 if quick else 8
    video = jnp.zeros((b, 3, 32, 192, 320), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video[:1])

    def body(c, params, video):
        v = video.at[0, 0, 0, 0, 0].set(c)
        out = model.apply(params, v)[0]
        return jnp.ravel(out)[0].astype(jnp.float32)

    t, flops = scan_timed(body, (params, video), K=5 if quick else 10)
    return with_mfu(
        {"model": "LF-VILA Swin3D/HTWA (32f 192×320)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t)


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

    def body(c, params, middle, other):
        m = middle.at[0, 0, 0, 0, 0].set(c)
        out = model.apply(params, m, other)
        return jnp.ravel(out)[0].astype(jnp.float32)

    t, flops = scan_timed(body, (params, middle, other), K=5 if quick else 10)
    return with_mfu(
        {"model": "HD-VILA hybrid encoder (2×7f, 640×1024 middle)", "batch": b * clips,
         "ms": round(t * 1000, 1), "clips_per_s": round(b * clips / t, 1)}, flops, t)


def bench_clipvip_train(quick=False):
    """Full pretrain step (fwd+bwd+grouped-AdamW) — the steps/sec metric.

    Chained by carrying (params, opt_state) through the scan — the same
    steady-state trajectory ``steps_per_call`` runs in production.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from xpretrain_tpu.models.clip_vip import CLIPVipConfig, CLIPViPModel
    from xpretrain_tpu.ops.losses import build_loss_fn
    from xpretrain_tpu.optim import build_optimizer, get_schedule
    from xpretrain_tpu.optim.optimizer import clamp_logit_scale

    # remat off: rematerialization measured slower at these batches (b=32:
    # 188 vs 202 clips/s, b=64: 207 vs 241) and HBM has ample headroom; remat
    # stays available via the --gradient_checkpointing flag when memory-tight.
    model = CLIPViPModel(CLIPVipConfig.base_patch32(dtype=jnp.bfloat16, remat=False))
    b = 16 if quick else 32  # reference pretrain batch/GPU = 32
    f, im, s = 12, 224, 70
    K = 3 if quick else 5
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
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    @jax.jit
    def run_k(params, opt_state, video, ids, mask):
        def step(carry, _):
            p, o = carry
            p = clamp_logit_scale(p)

            def loss_of(pp):
                out = model.apply({"params": pp}, video, ids, mask)
                return loss_fn(out["vis_features"], out["text_features"], out["logit_scale"])

            loss, g = jax.value_and_grad(loss_of)(p)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (_, _), losses = jax.lax.scan(step, (params, opt_state), None, length=K)
        return losses[-1]

    args = (params, tx.init(params), video, ids, mask)
    float(run_k(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run_k(*args))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] / K
    flops = flops_of(run_k, *args)  # cost model counts the scan body once
    return with_mfu(
        {"model": "CLIP-ViP B/32 TRAIN step (fwd+bwd+AdamW, scan-chained)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="PERF_TABLE.md",
                   help="output table path (PERF.md itself is hand-curated; "
                        "paste the refreshed table into its header section)")
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
        f.write(f"Device: {jax.devices()[0]} — scan-chained timings (see PERF.md)\n\n")
        f.write("| model | batch | step ms | clips/s | TFLOPs | MFU |\n|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['model']} | {r['batch']} | {r['ms']} | {r['clips_per_s']} "
                    f"| {r.get('tflops', 0)} | {r.get('mfu_pct', 0)}% |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
