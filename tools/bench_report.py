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
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


V5E_PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (per chip)
V5E_HBM_BPS = 819e9  # TPU v5e HBM bandwidth ceiling (bytes/s)


def enable_compile_cache(path: str = "/tmp/jax_compile_cache") -> None:
    """Persistent XLA compile cache: LF-VILA-scale steps cold-compile in
    10-25 min on this toolchain (PERF.md); warm reruns skip that.

    ``XPT_NO_COMPILE_CACHE=1`` disables it — needed when a profiling run
    must produce a matched (trace, --xla_dump_to HLO) pair: a cache hit
    skips compilation, so the after-optimizations module (whose op names
    the trace uses) is never dumped."""
    import jax

    if os.environ.get("XPT_NO_COMPILE_CACHE") == "1":
        return
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:  # pragma: no cover - older jax
        pass

# When set (by tools/profile_counters.py), every timed bench also runs ONE
# extra iteration under jax.profiler.trace into TRACE_DIR/traceNN, so the
# on-device op timings can be parsed into measured MXU/HBM utilization.
TRACE_DIR = ""
_TRACE_COUNT = [0]


def _maybe_trace(run_once):
    if not TRACE_DIR:
        return None
    import jax

    d = os.path.join(TRACE_DIR, f"trace{_TRACE_COUNT[0]:02d}")
    _TRACE_COUNT[0] += 1
    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        run_once()
    return d


def cost_of(jitted, *args) -> tuple[float, float]:
    """(analytic FLOPs, bytes accessed) of a jitted callable on example args.

    When ``XPT_HLO_TEXT_DIR`` is set, also writes the optimized HLO text of
    the compiled executable there (``moduleNN.txt``) — the op names match
    the device trace's (same executable), so profiler rows like
    ``copy.17135`` can be attributed to source via their ``metadata``
    (op_name + source_file/line). This is the client-side stand-in for
    ``--xla_dump_to``, which lands on the far side of the axon tunnel.
    """
    try:
        compiled = jitted.lower(*args).compile()
        hlo_dir = os.environ.get("XPT_HLO_TEXT_DIR")
        if hlo_dir:
            os.makedirs(hlo_dir, exist_ok=True)
            n = len([f for f in os.listdir(hlo_dir) if f.endswith(".txt")])
            try:
                with open(os.path.join(hlo_dir, f"module{n:02d}.txt"), "w") as f:
                    f.write(compiled.as_text())
            except Exception:  # pragma: no cover - backend without as_text
                pass
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)), float(analysis.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def flops_of(jitted, *args) -> float:
    return cost_of(jitted, *args)[0]


def with_mfu(row, flops, t, bytes_accessed=0.0):
    row["tflops"] = round(flops / 1e12, 1)
    row["mfu_pct"] = round(100.0 * flops / max(t, 1e-9) / V5E_PEAK_BF16, 1)
    if bytes_accessed:
        # achieved HBM bandwidth against the 819 GB/s v5e ceiling — the
        # second roofline axis; a kernel under BOTH ceilings has scheduling
        # headroom, one near either is roofline-bound (PERF.md HTWA case)
        gbps = bytes_accessed / max(t, 1e-9) / 1e9
        row["hbm_gbps"] = round(gbps, 1)
        row["hbm_pct"] = round(100.0 * gbps * 1e9 / V5E_HBM_BPS, 1)
    return row


def scan_timed(body, args, K, warmup=1, iters=5):
    """Median per-step time + per-step FLOPs/bytes of ``body(carry, *args)``
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
    _maybe_trace(lambda: float(run_k(jnp.float32(7), *args)))
    # XLA cost_analysis counts the while-loop body ONCE (verified against
    # the analytic per-step FLOPs of the unrolled forward), so no /K here.
    flops, nbytes = cost_of(run_k, jnp.float32(0), *args)
    return t, flops, nbytes


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

    t, flops, nbytes = scan_timed(body, (params, video, ids, mask), K=10 if not quick else 3)
    return with_mfu(
        {"model": "CLIP-ViP B/32 (12f 224², u8 ingest, serving batch)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


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

    t, flops, nbytes = scan_timed(body, (params, video), K=5 if quick else 10)
    return with_mfu(
        {"model": "LF-VILA Swin3D/HTWA (32f 192×320)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


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

    t, flops, nbytes = scan_timed(body, (params, middle, other), K=5 if quick else 10)
    return with_mfu(
        {"model": "HD-VILA hybrid encoder (2×7f, 640×1024 middle)", "batch": b * clips,
         "ms": round(t * 1000, 1), "clips_per_s": round(b * clips / t, 1)}, flops, t, nbytes)


def bench_clipvip_train(quick=False, variant="b32", batch=None):
    """Full pretrain step (fwd+bwd+grouped-AdamW) — the steps/sec metric.

    Chained by carrying (params, opt_state) through the scan — the same
    steady-state trajectory ``steps_per_call`` runs in production.
    ``variant``: "b32" (reference pretrain config, batch 32/GPU) or "b16"
    (the fine-tune/B-16 tower, batch 16).
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
    cfg_ctor = CLIPVipConfig.base_patch32 if variant == "b32" else CLIPVipConfig.base_patch16
    model = CLIPViPModel(cfg_ctor(dtype=jnp.bfloat16, remat=False))
    default_b = 32 if variant == "b32" else 16  # reference batch/GPU
    b = batch or (default_b // 2 if quick else default_b)
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
    _maybe_trace(lambda: float(run_k(*args)))
    flops, nbytes = cost_of(run_k, *args)  # cost model counts the scan body once
    return with_mfu(
        {"model": "CLIP-ViP %s TRAIN step (fwd+bwd+AdamW, scan-chained)" % (
            "B/32" if variant == "b32" else "B/16"), "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


def _train_scan_bench(model_apply_loss, params, batch_args, tx, K, iters=5):
    """Scan-chain K full train steps (fwd+bwd+optimizer) carrying
    (params, opt_state); returns (per-step t, flops, bytes)."""
    import jax
    import optax

    # donate the state args (production loops donate too): without donation
    # params+moments are resident TWICE (input buffers + scan carry), which
    # alone breaks the ~450M-param LF-VILA step on a 16 GB chip
    @partial(jax.jit, donate_argnums=(0, 1))
    def run_k(params, opt_state, *args):
        def step(carry, _):
            p, o = carry
            loss, g = jax.value_and_grad(lambda pp: model_apply_loss(pp, *args))(p)
            u, o = tx.update(g, o, p)
            return (optax.apply_updates(p, u), o), loss

        (ps, os_), losses = jax.lax.scan(step, (params, opt_state), None, length=K)
        return ps, os_, losses[-1]

    state = (params, tx.init(params))
    # cost BEFORE running: donation deletes the input buffers
    flops, nbytes = cost_of(run_k, *state, *batch_args)
    ps, os_, loss = run_k(*state, *batch_args)
    float(loss)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        ps, os_, loss = run_k(ps, os_, *batch_args)
        float(loss)
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[len(ts) // 2] / K

    def _one():
        nonlocal ps, os_
        ps, os_, loss = run_k(ps, os_, *batch_args)
        float(loss)

    _maybe_trace(_one)
    return t, flops, nbytes


def bench_lfvila_train(quick=False, batch=None, remat=None, remat_policy=None,
                       moment_dtype=None, param_dtype=None, attn_fold=False,
                       group_windows=True):
    """FULL LF-VILA stage-1 pretrain step: Swin3D/HTWA + 3-stage BERT-large
    + InfoNCE + MTC, fwd+bwd+grouped-AdamW, reference recipe 32f 192×320 /
    4 clips, batch 16/chip (``LF-VILA/src/configs/pretrain_stage1.yaml:32-40``;
    step driven at ``trainer_pretrain.py:283-284``). Closes BASELINE's
    roofline target for the family the encoder-only row could not."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
    from xpretrain_tpu.optim import NO_DECAY_LFVILA, build_optimizer, get_schedule

    b = batch or (4 if quick else 16)  # reference batch/GPU = 16
    # the reference checkpoints the Swin blocks (video_encoder.py:257-266);
    # remat=None probes no-remat first and falls back (OOM at this scale)
    cfg = LfVilaConfig(dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, video=dataclasses.replace(
        cfg.video, dtype=jnp.bfloat16, remat=bool(remat),
        remat_policy=remat_policy, attn_fold=attn_fold,
        group_windows=group_windows))
    model = LfVilaPretrain(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(b, 3, 32, 192, 320)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 30000, size=(b, 4, 50)).astype(np.int32))
    mask = jnp.ones((b, 4, 50), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1], mtc_rng=jax.random.PRNGKey(1)
    )["params"]
    tx, _ = build_optimizer(
        params, get_schedule("cosine", 5e-5, 100000), weight_decay=0.01,
        no_decay_patterns=NO_DECAY_LFVILA, max_grad_norm=1.0,
        moment_dtype=moment_dtype,
    )
    if param_dtype is not None:
        # bf16 param storage for fwd/bwd + fp32 masters in the opt state
        # (the r3-verdict byte-budget lever; see optim.master_weights)
        from xpretrain_tpu.optim import cast_params_for_storage, master_weights

        params = cast_params_for_storage(params, param_dtype)
        tx = master_weights(tx)

    def apply_loss(p, video, ids, mask):
        out = model.apply(
            {"params": p}, video, ids, mask, mtc_rng=jax.random.PRNGKey(7)
        )
        return out["loss"].astype(jnp.float32)

    K = 2 if quick else 4
    t, flops, nbytes = _train_scan_bench(apply_loss, params, (video, ids, mask), tx, K)
    tag = " remat" if remat else ""
    if attn_fold:
        tag += " fold"
    if group_windows:
        tag += " grouped"
    if moment_dtype is not None:
        tag += " bf16-moments"
    if param_dtype is not None:
        tag += " bf16-params"
    return with_mfu(
        {"model": f"LF-VILA stage-1 TRAIN step (Swin3D+BERT-L+ITC/MTC{tag})", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


def bench_hdvila_train(quick=False, batch=None, remat=False, s2d_stem=False):
    """FULL HD-VILA stage-1 pretrain step: hybrid 2-ResNet50 + TimeSformer
    encoder + staged BERT-large + ITC, fwd+bwd+grouped-AdamW, reference
    recipe 2 clips × 7 frames at 640×1024, batch 8/chip
    (``hd-vila/src/configs/pretrain_stage1.json:44-49``; loop
    ``run_pretrain_stage1_group.py:342-423``)."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig
    from xpretrain_tpu.optim import build_optimizer, get_schedule

    b = batch or (2 if quick else 8)  # reference batch/GPU = 8
    enc_cfg = HdVilaEncoderConfig(
        hidden_size=1024, dtype=jnp.bfloat16, remat=remat, s2d_stem=s2d_stem
    )
    model_cfg = HdVilaModelConfig(stage=1, dtype=jnp.bfloat16)
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=0.05)
    rng = np.random.default_rng(0)
    middle = jnp.asarray(rng.integers(0, 255, size=(b, 2, 3, 640, 1024)).astype(np.float32))
    other = jnp.asarray(rng.integers(0, 255, size=(b, 2, 6, 3, 160, 256)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 30000, size=(b, 50)).astype(np.int32))
    mask = jnp.ones((b, 50), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), middle[:1], other[:1], ids[:1], mask[:1]
    )["params"]
    tx, _ = build_optimizer(
        params, get_schedule("cosine", 5e-5, 100000), weight_decay=0.01, max_grad_norm=1.0
    )

    def apply_loss(p, middle, other, ids, mask):
        out = model.apply({"params": p}, middle, other, ids, mask)
        return out["loss"].astype(jnp.float32)

    K = 2 if quick else 4
    t, flops, nbytes = _train_scan_bench(apply_loss, params, (middle, other, ids, mask), tx, K)
    return with_mfu(
        {"model": "HD-VILA stage-1 TRAIN step (hybrid enc+BERT-L+ITC%s%s)"
         % (", remat" if remat else "", ", s2d stem" if s2d_stem else ""), "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


def bench_hdvila_train_stage2(quick=False, batch=None, remat=False, grad_accum=1):
    """HD-VILA stage-2 pretrain step: MLM over the fused tower, stage-1
    modules frozen (recipe ``configs/presets/hdvila_pretrain_stage2.json``
    mirroring ``hd-vila/src/configs/pretrain_stage2.json``: batch 16/chip,
    use_itm 0, lse clip agg, pixel random sampling 160).

    ``grad_accum=2, batch=8`` measures the production stand-in for the
    reference b=16 recipe on this chip (the true b=16 step dies in the
    reproducible ``tpu_compile_helper`` infra crash — PERF.md): each scan
    update is one MultiSteps microbatch; the reported row is per *effective*
    b=16 optimizer step (2 updates). Trajectory equivalence to a true b=16
    step is asserted on CPU in ``tests/test_grad_accum_equivalence.py``."""
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.cli.run_pretrain_hdvila import HdVilaPretrainModel
    from xpretrain_tpu.models.hd_vila.e2e import HdVilaEncoderConfig
    from xpretrain_tpu.models.hd_vila.modeling import HdVilaModelConfig
    from xpretrain_tpu.optim import build_optimizer, get_schedule

    b = batch or (4 if quick else 16)
    enc_cfg = HdVilaEncoderConfig(hidden_size=1024, dtype=jnp.bfloat16, remat=remat)
    model_cfg = HdVilaModelConfig(
        stage=2, pixel_random_sampling_size=160, score_agg_func="lse", dtype=jnp.bfloat16
    )
    model = HdVilaPretrainModel(enc_cfg, model_cfg, temp=0.05)
    rng = np.random.default_rng(0)
    middle = jnp.asarray(rng.integers(0, 255, size=(b, 2, 3, 640, 1024)).astype(np.float32))
    other = jnp.asarray(rng.integers(0, 255, size=(b, 2, 6, 3, 160, 256)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 30000, size=(b, 50)).astype(np.int32))
    mask = jnp.ones((b, 50), jnp.int32)
    mlm = np.full((b, 50), -100, np.int32)
    mlm[:, 2:9] = rng.integers(2, 30000, size=(b, 7))
    mlm = jnp.asarray(mlm)
    params = model.init(
        jax.random.PRNGKey(0), middle[:1], other[:1], ids[:1], mask[:1],
        mlm_labels=mlm[:1], sample_rng=jax.random.PRNGKey(2),
    )["params"]
    frozen = (
        "encoder/cnn", "encoder/grid_encoder", "encoder/timesformer",
        "transformer/t_proj", "transformer/v_proj", "bert/embeddings", "pooler1",
    ) + tuple(f"layer_{i}/" for i in range(12))
    tx, _ = build_optimizer(
        params, get_schedule("linear", 5e-5, 100000), weight_decay=1e-3,
        max_grad_norm=5.0, frozen_patterns=frozen, grad_accum_steps=grad_accum,
    )

    def apply_loss(p, middle, other, ids, mask, mlm):
        out = model.apply(
            {"params": p}, middle, other, ids, mask,
            mlm_labels=mlm, sample_rng=jax.random.PRNGKey(3),
        )
        return out["loss"].astype(jnp.float32)

    K = (2 if quick else 4) * grad_accum
    t, flops, nbytes = _train_scan_bench(
        apply_loss, params, (middle, other, ids, mask, mlm), tx, K)
    # report per effective optimizer step (grad_accum microbatch updates)
    t, flops, nbytes = t * grad_accum, flops * grad_accum, nbytes * grad_accum
    tag = ", remat" if remat else ""
    if grad_accum > 1:
        tag += f", accum {grad_accum}x{b}"
    return with_mfu(
        {"model": "HD-VILA stage-2 TRAIN step (MLM, stage-1 frozen%s)" % tag,
         "batch": b * grad_accum,
         "ms": round(t * 1000, 1), "clips_per_s": round(b * grad_accum / t, 1)},
        flops, t, nbytes)


def bench_lfvila_train_stage2(quick=False, batch=None, remat=True):
    """LF-VILA stage-2 pretrain step: MLM+VTM over the fusion tower, video
    encoder + BERT stages 0-1 frozen (recipe
    ``configs/presets/lfvila_pretrain_stage2.yaml`` mirroring
    ``pretrain_stage2.yaml``: batch 48/chip, final_num_patches 6)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.lf_vila.pretrain import LfVilaConfig, LfVilaPretrain
    from xpretrain_tpu.optim import NO_DECAY_LFVILA, build_optimizer, get_schedule

    b = batch or (8 if quick else 48)
    cfg = LfVilaConfig(stage=2, final_num_patches=6, dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, video=dataclasses.replace(
        cfg.video, dtype=jnp.bfloat16, remat=bool(remat)))
    model = LfVilaPretrain(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(b, 3, 32, 192, 320)).astype(np.float32))
    ids = jnp.asarray(rng.integers(2, 30000, size=(b, 4, 50)).astype(np.int32))
    mask = jnp.ones((b, 4, 50), jnp.int32)
    mlm = np.full((b, 4 * 50), -100, np.int32)
    mlm[:, 3:20] = rng.integers(2, 30000, size=(b, 17))
    mlm = jnp.asarray(mlm)
    params = model.init(
        jax.random.PRNGKey(0), video[:1], ids[:1], mask[:1], mlm_labels=mlm[:1]
    )["params"]
    frozen = ("video_encoder", "sent_embedding") + tuple(
        f"layer_{i}/" for i in range(12)
    )
    tx, _ = build_optimizer(
        params, get_schedule("linear", 5e-5, 100000), weight_decay=0.05,
        no_decay_patterns=NO_DECAY_LFVILA, max_grad_norm=1.0, frozen_patterns=frozen,
    )

    def apply_loss(p, video, ids, mask, mlm):
        out = model.apply({"params": p}, video, ids, mask, mlm_labels=mlm)
        return out["loss"].astype(jnp.float32)

    K = 2 if quick else 3
    t, flops, nbytes = _train_scan_bench(apply_loss, params, (video, ids, mask, mlm), tx, K)
    return with_mfu(
        {"model": "LF-VILA stage-2 TRAIN step (MLM+VTM, stage-1 frozen)", "batch": b,
         "ms": round(t * 1000, 1), "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


def _bench_clipvip_variant(factory, label, b, f=12, im=224, s=70, K=10):
    import jax
    import jax.numpy as jnp

    from xpretrain_tpu.models.clip_vip import CLIPViPModel

    model = CLIPViPModel(factory(dtype=jnp.bfloat16))
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

    t, flops, nbytes = scan_timed(body, (params, video, ids, mask), K=K)
    return with_mfu(
        {"model": label, "batch": b, "ms": round(t * 1000, 1),
         "clips_per_s": round(b / t, 1)}, flops, t, nbytes)


def bench_clipvip_b16(quick=False):
    """B/16 inference WITH MFU (round-2 verdict: the '—' cells). Exercises
    the proxy-kernel VMEM head-group model at S=2356."""
    from xpretrain_tpu.models.clip_vip import CLIPVipConfig

    return _bench_clipvip_variant(
        CLIPVipConfig.base_patch16, "CLIP-ViP B/16 inference (u8 ingest, scan-chained)",
        b=4 if quick else 8, K=3 if quick else 8)


def bench_clipvip_l14(quick=False):
    """L/14 inference WITH MFU (S=3076, head-group 2)."""
    from xpretrain_tpu.models.clip_vip import CLIPVipConfig

    return _bench_clipvip_variant(
        CLIPVipConfig.large_patch14, "CLIP-ViP L/14 inference (u8 ingest, scan-chained)",
        b=2 if quick else 4, K=3 if quick else 6)


def main():
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--out", default="PERF_TABLE.md",
                   help="output table path (PERF.md itself is hand-curated; "
                        "paste the refreshed table into its header section)")
    args = p.parse_args()
    rows = []
    benches = (
        bench_clipvip, bench_clipvip_train, bench_clipvip_b16, bench_clipvip_l14,
        bench_lfvila, bench_hdvila, bench_hdvila_train, bench_lfvila_train,
        bench_hdvila_train_stage2, bench_lfvila_train_stage2,
    )
    for fn in benches:
        try:
            row = fn(args.quick)
            rows.append(row)
            print(json.dumps(row), flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{fn.__name__} failed: {type(e).__name__}: {str(e)[:300]}", flush=True)
            if fn is bench_lfvila_train:
                # HBM headroom probe: reference recipe remats the Swin blocks
                try:
                    row = bench_lfvila_train(args.quick, remat=True)
                    rows.append(row)
                    print(json.dumps(row), flush=True)
                except Exception as e2:  # noqa: BLE001
                    print(f"bench_lfvila_train remat failed: {str(e2)[:300]}", flush=True)
    import jax

    with open(args.out, "w") as f:
        f.write(f"Device: {jax.devices()[0]} — scan-chained timings (see PERF.md)\n\n")
        f.write("| model | batch | step ms | clips/s | TFLOPs | MFU | HBM GB/s | HBM % |\n"
                "|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['model']} | {r['batch']} | {r['ms']} | {r['clips_per_s']} "
                    f"| {r.get('tflops', 0)} | {r.get('mfu_pct', 0)}% "
                    f"| {r.get('hbm_gbps', '—')} | {r.get('hbm_pct', '—')}% |\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
