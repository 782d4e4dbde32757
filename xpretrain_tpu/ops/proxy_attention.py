"""Fused Pallas kernel for CLIP-ViP's proxy video attention.

The ViP vision tower attends over [M proxy tokens ⊕ N frames × L patches]
(S = M + N·L = 592 for B/32 12-frame): patches see [proxies ⊕ own frame],
proxies see everything (ref ``CLIP-ViP/src/modeling/CLIP_ViP.py:332-381``).
Round 1 ran this as one XLA attention with a 592² additive mask
(``clip_vip/model.py:_masked_full``) at ~50% MXU: the [B, H, S, S] score
tensor round-trips HBM between the QKᵀ matmul, the mask add, the softmax,
and the PV matmul.

Kernel design (v2, measured on v5e at B/32 production shape, batch 256):

- One grid cell per batch item (heads grouped adaptively to the VMEM
  budget); q/k/v/o live in VMEM for the whole cell — one HBM pass total.
- Inside the cell the frame loop is STATICALLY UNROLLED: per frame, slice
  the [HG, L, D] blocks, concatenate [proxies ⊕ frame] keys/values on the
  sublane axis, and run ONE batched [HG, L, M+L] matmul + softmax + PV.
  This skips the exp/max/sum over the ~90% masked-out score columns that
  dominated v1's VPU time (softmax over S² = 350K elements per head vs
  ~32K useful), and never materializes a mask at all.
- The M proxy rows attend the full sequence as one [HG, M, S] block.

v1 (full S² scores + iota mask, per-(b,h) grid): 7.65 ms/layer.
v2 (this file): 4.51 ms/layer — 1.7× — at batch 256, H=12, S=592, D=64.
Head-batching the per-frame ops was the main win (4 heads: 5.65 ms,
12 heads: 4.51 ms); frame-pair grouping (G=2 blocks with a block-diagonal
bias) measured within noise of G=1 and is not worth the extra mask.

The public ``proxy_flash_attention`` carries a ``jax.custom_vjp``; the
backward kernel recomputes each frame's P block in VMEM and accumulates
dq/dk/dv per frame (plus the proxy-row terms), so the S² score tensor
never exists in HBM in either direction — gradients are exact.
"""

from __future__ import annotations

import contextlib
import contextvars
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9

# Per-cell VMEM budget for picking the head group; the hard limit is 16 MiB
# and the compiler needs headroom for temporaries and double buffering.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _proxy_bias(S: int, M: int, L: int, dtype=jnp.float32) -> Array:
    """Additive 0/NEG_INF proxy mask from iota arithmetic (trace-time free)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    allowed = (i < M) | (j < M) | ((i - M) // L == (j - M) // L)
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)


def _attention_xla(q: Array, k: Array, v: Array, M: int, L: int, scale: float) -> Array:
    S = q.shape[-2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale + _proxy_bias(S, M, L)
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


# Empirical Mosaic scoped-stack model for this kernel: ~32 bytes per
# HG·S·D element (calibrated from compiler OOM reports: B/16 S=2356 HG=6
# reported 27.66 MiB ≈ 32·6·2356·64; the shipping B/32 S=592 HG=12 sits at
# 14.5 MiB, just under the 16 MiB hard limit). Cap with margin.
_STACK_BYTES_PER_ELEM = 32
_STACK_LIMIT_BYTES = 14 * 1024 * 1024

# The packed-layout kernels measure ~64 bytes per HG·S·D element (the
# [S,HG,D]→[HG,S,D] VMEM relayout keeps sublane/lane-padded copies of
# q/k/v/o live: 29.07 MiB reported at HG=12, S=592, D=64). They therefore
# request a raised per-kernel scoped-VMEM limit via
# ``CompilerParams(vmem_limit_bytes=...)`` — v5e has 128 MiB of VMEM and
# the 16 MiB default is just a conservative compiler default.
_PACKED_STACK_BYTES_PER_ELEM = 64
_PACKED_VMEM_LIMIT_BYTES = 96 * 1024 * 1024
_PACKED_STACK_LIMIT_BYTES = int(_PACKED_VMEM_LIMIT_BYTES * 0.85)


def _head_group(
    H: int,
    S: int,
    D: int,
    n_bufs: int,
    stack_bytes_per_elem: int = _STACK_BYTES_PER_ELEM,
    stack_limit_bytes: int = _STACK_LIMIT_BYTES,
) -> int:
    """Largest divisor of H whose buffers AND scoped stack fit VMEM.

    Two constraints: n_bufs [HG, S, D] bf16 io buffers within the budget,
    and the kernel's fp32 temporaries (softmax/concat stack) within the
    scoped-vmem limit per the empirical model above. The stack
    constraint is what caps HG at long S (e.g. B/16's S=2356 → HG=3).
    """
    import os

    override = os.environ.get("XPT_PROXY_HG")
    if override:
        # perf-sweep hook (tools/bench_proxy_hg.py): force a head-group size;
        # clamped to a divisor of H, NOT to the VMEM model — an infeasible
        # value surfaces as a compile failure (a measured-negative data point)
        hg = max(1, min(int(override), H))
        while H % hg:
            hg -= 1
        return hg
    per_head = n_bufs * S * D * 2
    hg = max(1, _VMEM_BUDGET_BYTES // per_head)
    hg = min(hg, max(1, stack_limit_bytes // (stack_bytes_per_elem * S * D)))
    while H % hg:
        hg -= 1
    return hg


def _head_group_packed(H: int, S: int, D: int, n_bufs: int) -> int:
    return _head_group(
        H, S, D, n_bufs,
        stack_bytes_per_elem=_PACKED_STACK_BYTES_PER_ELEM,
        stack_limit_bytes=_PACKED_STACK_LIMIT_BYTES,
    )


def proxy_attention_cost(
    B: int, H: int, S: int, D: int, M: int, L: int, itemsize: int, backward: bool = False
) -> tuple[int, int, int]:
    """Analytic (flops, bytes_accessed, transcendentals) of one kernel call.

    Attached to the ``pallas_call`` as a ``pl.CostEstimate`` so XLA's cost
    analysis — and through it the profiler's per-op FLOP/byte attribution
    (``tools/profile_counters.py``) — sees the custom call's real work
    instead of zeros (r4 verdict weak #3: 13.1% of CLIP-ViP's busy time was
    attributed 0 FLOPs, understating whole-step MXU).

    FLOPs: per (b, h) the forward runs the proxy-row block (QKᵀ + PV over
    [M, S]: ``4·M·S·D``) plus N frame blocks ([L, M+L]: ``4·L·(M+L)·D``
    each). The backward recomputes P and runs 5 matmuls per block
    (dV, dP, dQ, dK + recompute) → 2.5× forward. Bytes: q/k/v(+dO) in,
    o (dq/dk/dv) out — one HBM pass each, the kernel's whole point.
    Transcendentals: one exp per score element.
    """
    N = (S - M) // L
    score_elems = B * H * (M * S + N * L * (M + L))
    matmul_flops = 4 * score_elems * D  # QKᵀ + PV, 2 flops/MAC
    n_tensors = 7 if backward else 4  # q,k,v,do -> dq,dk,dv | q,k,v -> o
    flops = (matmul_flops * 5) // 2 if backward else matmul_flops
    bytes_accessed = n_tensors * B * H * S * D * itemsize
    return flops, bytes_accessed, score_elems


def _cost_estimate(dims: tuple[int, int, int, int], itemsize: int, M: int, L: int,
                   backward: bool = False):
    from jax.experimental import pallas as pl

    B, H, S, D = dims
    flops, nbytes, transcendentals = proxy_attention_cost(
        B, H, S, D, M, L, itemsize, backward
    )
    return pl.CostEstimate(
        flops=flops, bytes_accessed=nbytes, transcendentals=transcendentals
    )


def _cell_fwd(qb: Array, kb: Array, vb: Array, M: int, L: int, scale: float) -> Array:
    """Shared forward cell body: q/k/v [HG, S, D] in VMEM -> out [HG, S, D]."""
    HG, S, D = qb.shape
    N = (S - M) // L
    kp = kb[:, :M]  # [HG, M, D] proxies
    vp = vb[:, :M]
    bm = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    pv = lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # proxy rows attend the full sequence
    sp = bm(qb[:, :M], kb) * scale  # [HG, M, S]
    wp = jax.nn.softmax(sp, axis=-1).astype(vb.dtype)
    outs = [pv(wp, vb)]  # [HG, M, D]
    # per-frame blocks: softmax over the M+L *allowed* columns only
    for f in range(N):
        r0 = M + f * L
        qf = jax.lax.slice(qb, (0, r0, 0), (HG, r0 + L, D))
        kcat = jnp.concatenate(
            [kp, jax.lax.slice(kb, (0, r0, 0), (HG, r0 + L, D))], axis=1
        )  # [HG, M+L, D]
        vcat = jnp.concatenate(
            [vp, jax.lax.slice(vb, (0, r0, 0), (HG, r0 + L, D))], axis=1
        )
        s = bm(qf, kcat) * scale  # [HG, L, M+L]
        w = jax.nn.softmax(s, axis=-1).astype(vb.dtype)
        outs.append(pv(w, vcat))  # [HG, L, D]
    return jnp.concatenate(outs, axis=1)


def _attention_pallas(
    q: Array, k: Array, v: Array, M: int, L: int, scale: float, interpret: bool = False
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    HG = _head_group(H, S, D, n_bufs=4)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        out = _cell_fwd(q_ref[0], k_ref[0], v_ref[0], M, L, scale)
        o_ref[0] = out.astype(o_ref.dtype)

    spec = lambda: pl.BlockSpec(
        (1, HG, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, H // HG),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        cost_estimate=_cost_estimate((B, H, S, D), q.dtype.itemsize, M, L),
        interpret=interpret,
    )(q, k, v)


def _attention_pallas_packed(
    q: Array, k: Array, v: Array, M: int, L: int, scale: float, head_dim: int,
    interpret: bool = False,
) -> Array:
    """Layout-preserving forward: q/k/v are the raw [B, S, H·D] projection
    outputs (heads contiguous on the feature axis). The [S, HG·D] block is
    relayouted to [HG, S, D] *inside VMEM*, so the four per-layer HBM
    transposes of the [B,H,S,D] path (q/k/v in, o out — ~4×2×22 MB of HBM
    traffic per layer at B/32 serving shapes) never happen."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, E = q.shape
    D = head_dim
    H = E // D
    HG = _head_group_packed(H, S, D, n_bufs=4)
    # [B,S,E] -> [B,S,H,D] is a bitcast (same HBM bytes): heads are
    # contiguous on the feature axis. The head split costs nothing; only the
    # [S,HG,D] -> [HG,S,D] relayout happens, inside VMEM.
    q4 = q.reshape(B, S, H, D)
    k4 = k.reshape(B, S, H, D)
    v4 = v.reshape(B, S, H, D)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        relayout = lambda r: r[0].transpose(1, 0, 2)
        out = _cell_fwd(relayout(q_ref), relayout(k_ref), relayout(v_ref), M, L, scale)
        o_ref[0] = out.transpose(1, 0, 2).astype(o_ref.dtype)

    spec = lambda: pl.BlockSpec(
        (1, S, HG, D), lambda b, h: (b, 0, h, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H // HG),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, S, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_VMEM_LIMIT_BYTES
        ),
        cost_estimate=_cost_estimate((B, H, S, D), q.dtype.itemsize, M, L),
        interpret=interpret,
    )(q4, k4, v4)
    return out.reshape(B, S, E)


def _cell_bwd(
    qb: Array, kb: Array, vb: Array, dob: Array, M: int, L: int, scale: float
) -> tuple[Array, Array, Array]:
    """Shared backward cell body — q/k/v/dO [HG, S, D] in VMEM.

    Standard softmax-attention backward — dV = Pᵀ dO; dP = dO Vᵀ;
    dS = P ⊙ (dP − rowsum(dP ⊙ P)); dQ = dS K·scale; dK = dSᵀ Q·scale —
    computed per frame block (P is [L, M+L], recomputed in VMEM) plus the
    proxy-row block (P is [M, S]). The proxy keys/values receive gradient
    from every frame block AND the proxy rows; those terms are accumulated
    across the unrolled frame loop before the single store.
    """
    HG, S, D = qb.shape
    N = (S - M) // L
    dob = dob.astype(jnp.float32)
    kp = kb[:, :M]
    vp = vb[:, :M]
    bm = lambda a, b: jax.lax.dot_general(  # contract last dims
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    mm = lambda a, b: jax.lax.dot_general(  # [.., X, Y] @ [.., Y, Z]
        a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    tm = lambda a, b: jax.lax.dot_general(  # aᵀ b over rows
        a, b, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )

    # ---- proxy rows: P_p [HG, M, S] over the full sequence ----
    sp = bm(qb[:, :M], kb) * scale
    p_p = jax.nn.softmax(sp, axis=-1)
    do_p = dob[:, :M]
    dv_full = tm(p_p, do_p)  # [HG, S, D]
    dp_p = bm(do_p, vb.astype(jnp.float32))  # [HG, M, S]
    ds_p = p_p * (dp_p - jnp.sum(dp_p * p_p, axis=-1, keepdims=True))
    dq_p = mm(ds_p, kb.astype(jnp.float32)) * scale  # [HG, M, D]
    dk_full = tm(ds_p, qb[:, :M].astype(jnp.float32)) * scale  # [HG, S, D]

    # ---- per-frame blocks ----
    dkp_acc = jnp.zeros((HG, M, D), jnp.float32)
    dvp_acc = jnp.zeros((HG, M, D), jnp.float32)
    dq_parts = [dq_p]
    dk_parts = []
    dv_parts = []
    for f in range(N):
        r0 = M + f * L
        qf = jax.lax.slice(qb, (0, r0, 0), (HG, r0 + L, D))
        kcat = jnp.concatenate(
            [kp, jax.lax.slice(kb, (0, r0, 0), (HG, r0 + L, D))], axis=1
        )
        vcat = jnp.concatenate(
            [vp, jax.lax.slice(vb, (0, r0, 0), (HG, r0 + L, D))], axis=1
        )
        do_f = jax.lax.slice(dob, (0, r0, 0), (HG, r0 + L, D))
        s = bm(qf, kcat) * scale  # [HG, L, M+L]
        p = jax.nn.softmax(s, axis=-1)
        dv_cat = tm(p, do_f)  # [HG, M+L, D]
        dp = bm(do_f, vcat.astype(jnp.float32))  # [HG, L, M+L]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_parts.append(mm(ds, kcat.astype(jnp.float32)) * scale)  # [HG, L, D]
        dk_cat = tm(ds, qf.astype(jnp.float32)) * scale  # [HG, M+L, D]
        dkp_acc = dkp_acc + jax.lax.slice(dk_cat, (0, 0, 0), (HG, M, D))
        dvp_acc = dvp_acc + jax.lax.slice(dv_cat, (0, 0, 0), (HG, M, D))
        dk_parts.append(jax.lax.slice(dk_cat, (0, M, 0), (HG, M + L, D)))
        dv_parts.append(jax.lax.slice(dv_cat, (0, M, 0), (HG, M + L, D)))

    dq = jnp.concatenate(dq_parts, axis=1)
    dk = dk_full + jnp.concatenate([dkp_acc] + dk_parts, axis=1)
    dv = dv_full + jnp.concatenate([dvp_acc] + dv_parts, axis=1)
    return dq, dk, dv


def _attention_pallas_bwd(
    q: Array, k: Array, v: Array, d_out: Array, M: int, L: int, scale: float,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused backward in the [B, H, S, D] layout (see ``_cell_bwd``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape
    # 7 io buffers + the fp32 dq/dk/dv part lists (≈6 bf16-buffer equivalents)
    # + per-frame fp32 temporaries; 16 keeps HG·buffers under the VMEM limit.
    HG = _head_group(H, S, D, n_bufs=16)

    def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        dq, dk, dv = _cell_bwd(q_ref[0], k_ref[0], v_ref[0], do_ref[0], M, L, scale)
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    spec = lambda: pl.BlockSpec(
        (1, HG, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((B, H, S, D), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, H // HG),
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=(spec(), spec(), spec()),
        out_shape=(shape, shape, shape),
        cost_estimate=_cost_estimate((B, H, S, D), q.dtype.itemsize, M, L, backward=True),
        interpret=interpret,
    )(q, k, v, d_out)


def _attention_pallas_bwd_packed(
    q: Array, k: Array, v: Array, d_out: Array, M: int, L: int, scale: float,
    head_dim: int, interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused backward in the packed [B, S, H·D] layout (see ``_cell_bwd``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, E = q.shape
    D = head_dim
    H = E // D
    HG = _head_group_packed(H, S, D, n_bufs=16)
    q4 = q.reshape(B, S, H, D)
    k4 = k.reshape(B, S, H, D)
    v4 = v.reshape(B, S, H, D)
    do4 = d_out.reshape(B, S, H, D)

    def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        relayout = lambda r: r[0].transpose(1, 0, 2)
        dq, dk, dv = _cell_bwd(
            relayout(q_ref), relayout(k_ref), relayout(v_ref), relayout(do_ref),
            M, L, scale,
        )
        dq_ref[0] = dq.transpose(1, 0, 2).astype(dq_ref.dtype)
        dk_ref[0] = dk.transpose(1, 0, 2).astype(dk_ref.dtype)
        dv_ref[0] = dv.transpose(1, 0, 2).astype(dv_ref.dtype)

    spec = lambda: pl.BlockSpec(
        (1, S, HG, D), lambda b, h: (b, 0, h, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((B, S, H, D), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, H // HG),
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=(spec(), spec(), spec()),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_VMEM_LIMIT_BYTES
        ),
        cost_estimate=_cost_estimate((B, H, S, D), q.dtype.itemsize, M, L, backward=True),
        interpret=interpret,
    )(q4, k4, v4, do4)
    return dq.reshape(B, S, E), dk.reshape(B, S, E), dv.reshape(B, S, E)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret)


def _flash_fwd(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret), (q, k, v)


def _flash_bwd(M, L, scale, interpret, res, d_out):
    q, k, v = res
    return _attention_pallas_bwd(q, k, v, d_out, M, L, scale, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_packed(q, k, v, M, L, scale, head_dim, interpret):
    return _attention_pallas_packed(q, k, v, M, L, scale, head_dim, interpret)


def _flash_packed_fwd(q, k, v, M, L, scale, head_dim, interpret):
    return _attention_pallas_packed(q, k, v, M, L, scale, head_dim, interpret), (q, k, v)


def _flash_packed_bwd(M, L, scale, head_dim, interpret, res, d_out):
    q, k, v = res
    return _attention_pallas_bwd_packed(q, k, v, d_out, M, L, scale, head_dim, interpret)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def proxy_flash_attention_packed(
    q: Array,  # [B, S, H·D] raw projection output, S = M + N*L
    k: Array,
    v: Array,
    M: int,
    N: int,
    L: int,
    scale: float,
    head_dim: int,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """Proxy attention in the packed [B, S, H·D] layout (differentiable).

    Equivalent to ``split -> proxy_flash_attention -> merge`` with the head
    split/merge done inside VMEM instead of as HBM layout transposes.

    **Measured negative — not wired into the model.** Full-model A/B at
    B/32 serving shapes (b=24, S=592) on v5e: 685 clips/s packed vs 1068
    clips/s for the [B,H,S,D] kernel + XLA transposes. Isolated kernel A/B
    confirms the decomposition: the v2 kernel measures the same with and
    without its surrounding transposes (XLA fuses them into the adjacent
    projection matmuls), while the packed kernel pays a real in-VMEM
    [S,HG,D]→[HG,S,D] relayout per call (sublane-dim transpose: ~64 B/elem
    scoped stack, 29.07 MiB at HG=12/S=592, needs a raised
    ``vmem_limit_bytes``, and Mosaic compiles it ~15× slower). Kept as a
    tested reference point so the layout question stays settled by data;
    use :func:`proxy_flash_attention` in models."""
    B, S, E = q.shape
    assert S == M + N * L, (q.shape, M, N, L)
    assert E % head_dim == 0
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas or interpret:
        try:
            return _flash_packed(q, k, v, M, L, scale, head_dim, interpret)
        except Exception as e:  # pragma: no cover - unsupported backends
            import warnings

            warnings.warn(
                f"proxy_flash_attention_packed pallas kernel failed "
                f"({type(e).__name__}: {e}); falling back to the XLA path",
                RuntimeWarning,
                stacklevel=2,
            )
    H = E // head_dim
    split = lambda x: x.reshape(B, S, H, head_dim).transpose(0, 2, 1, 3)
    out = _attention_xla(split(q), split(k), split(v), M, L, scale)
    return out.transpose(0, 2, 1, 3).reshape(B, S, E)


# Trace-time override for the backend-driven Pallas/XLA choice below.
# ``jax.export`` lowers for a *target* platform that may differ from
# ``jax.default_backend()`` (e.g. a portable CPU+TPU artifact built on a TPU
# host); the Pallas custom-call cannot lower for CPU, and the fallback
# except-clause below cannot catch that lowering-time error (it fires inside
# ``Lowered.lower``, after tracing). Exporters wrap tracing in one of these
# contexts to pin the path regardless of the local backend
# (`serving/artifact.py`). A ContextVar (not a module global) so a
# concurrent trace on another thread cannot observe the override.
_FORCED_PATH: "contextvars.ContextVar[str | None]" = contextvars.ContextVar(
    "xpt_proxy_attention_forced_path", default=None
)


@contextlib.contextmanager
def force_xla_attention():
    """Within this context, proxy attention traces the pure-XLA path."""
    token = _FORCED_PATH.set("xla")
    try:
        yield
    finally:
        _FORCED_PATH.reset(token)


@contextlib.contextmanager
def force_pallas_attention():
    """Within this context, proxy attention traces the Pallas kernel even
    when the local backend is not TPU (exports targeting TPU from another
    host, `serving/artifact.py`). The resulting HLO embeds a
    ``tpu_custom_call`` and only runs on TPU."""
    token = _FORCED_PATH.set("pallas")
    try:
        yield
    finally:
        _FORCED_PATH.reset(token)


def proxy_flash_attention(
    q: Array,  # [B, H, S, D], S = M + N*L
    k: Array,
    v: Array,
    M: int,
    N: int,
    L: int,
    scale: float,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """Proxy attention output [B, H, S, D]; differentiable (exact VJP)."""
    assert q.shape[-2] == M + N * L, (q.shape, M, N, L)
    forced = _FORCED_PATH.get()
    if forced == "xla":
        use_pallas = False
        interpret = False
    elif forced == "pallas":
        # no fallback: a lowering-time failure must surface to the exporter
        return _flash(q, k, v, M, L, scale, interpret)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas or interpret:
        try:
            return _flash(q, k, v, M, L, scale, interpret)
        except Exception as e:  # pragma: no cover - unsupported backends
            import warnings

            warnings.warn(
                f"proxy_flash_attention pallas kernel failed ({type(e).__name__}: {e}); "
                "falling back to the XLA path",
                RuntimeWarning,
                stacklevel=2,
            )
    return _attention_xla(q, k, v, M, L, scale)
