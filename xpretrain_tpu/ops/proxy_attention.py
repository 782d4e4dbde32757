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


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret)


def _flash_fwd(q, k, v, M, L, scale, interpret):
    return _attention_pallas(q, k, v, M, L, scale, interpret), (q, k, v)


def _flash_bwd(M, L, scale, interpret, res, d_out):
    # standard softmax-attention backward in XLA (recompute, fp32 probs):
    # dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ⊙ (dP − rowsum(dP ⊙ P));
    # dQ = dS K · scale;  dK = dSᵀ Q · scale
    q, k, v = res
    S = q.shape[-2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale + _proxy_bias(S, M, L)
    p = jax.nn.softmax(scores, axis=-1)
    do32 = d_out.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


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
