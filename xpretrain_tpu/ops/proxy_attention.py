"""Fused Pallas kernel for CLIP-ViP's proxy video attention.

The ViP vision tower attends over [M proxy tokens ⊕ N frames × L patches]
(S = M + N·L = 592 for B/32 12-frame): patches see [proxies ⊕ own frame],
proxies see everything (ref ``CLIP-ViP/src/modeling/CLIP_ViP.py:332-381``).
Round 1 ran this as one XLA attention with a 592² additive mask
(``clip_vip/model.py:_masked_full``) at ~50% MXU: the [B, H, S, S] score
tensor round-trips HBM between the QKᵀ matmul, the mask add, the softmax,
and the PV matmul.

This kernel fuses all four per (batch, head) grid cell. S is small enough
that q/k/v (~220 KB bf16) plus the fp32 score tile (~1.4 MB) sit in VMEM
together, so no online-softmax machinery is needed — one shot per cell, and
the mask is *computed* from (M, N, L) with iota arithmetic instead of being
loaded, so scores and mask cause zero HBM traffic.

The public ``proxy_flash_attention`` carries a ``jax.custom_vjp`` whose
backward recomputes the attention in plain XLA (the standard softmax
backward) — gradients are exact and training pays the same backward cost as
the unfused path while the forward takes the kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9


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


def _attention_pallas(
    q: Array, k: Array, v: Array, M: int, L: int, scale: float, interpret: bool = False
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0, 0]  # [S, D]
        kb = k_ref[0, 0]
        scores = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores * scale + _proxy_bias(S, M, L)
        weights = jax.nn.softmax(scores, axis=-1).astype(v_ref.dtype)
        out = jax.lax.dot_general(
            weights, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = out.astype(o_ref.dtype)

    spec = lambda: pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _attention_pallas_bwd(
    q: Array, k: Array, v: Array, d_out: Array, M: int, L: int, scale: float,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Fused backward: recomputes P in-kernel, emits (dq, dk, dv) per (b, h).

    Standard softmax-attention backward — dV = Pᵀ dO; dP = dO Vᵀ;
    dS = P ⊙ (dP − rowsum(dP ⊙ P)); dQ = dS K·scale; dK = dSᵀ Q·scale —
    with all S² temporaries living in VMEM (~4 fp32 tiles ≈ 5.6 MB at S=592).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, S, D = q.shape

    def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        qb = q_ref[0, 0]
        kb = k_ref[0, 0]
        vb = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        mm = lambda a, b, dims: jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32
        )
        scores = mm(qb, kb, ((1,), (1,))) * scale + _proxy_bias(S, M, L)
        p = jax.nn.softmax(scores, axis=-1)
        dv_ref[0, 0] = mm(p, do, ((0,), (0,))).astype(dv_ref.dtype)
        dp = mm(do, vb, ((1,), (1,)))
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, 0] = (mm(ds, kb.astype(jnp.float32), ((1,), (0,))) * scale).astype(
            dq_ref.dtype
        )
        dk_ref[0, 0] = (mm(ds, qb.astype(jnp.float32), ((0,), (0,))) * scale).astype(
            dk_ref.dtype
        )

    spec = lambda: pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, H, S, D), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=(spec(), spec(), spec()),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, d_out)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret)


def _flash_fwd(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret), (q, k, v)


def _flash_bwd(M, L, scale, interpret, res, d_out):
    q, k, v = res
    return _attention_pallas_bwd(q, k, v, d_out, M, L, scale, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


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
