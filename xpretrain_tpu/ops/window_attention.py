"""Pallas window-attention kernel for the HTWA/Swin3D encoder.

The blockwise-attention north-star op (BASELINE.json; SURVEY.md §5.7).
Window MSA works on [B·nW, H, N, d] with N = wd·wh·ww ≤ 480: small enough
that a whole (window, head) attention fits VMEM, large enough that XLA's
unfused path round-trips the [B·nW, H, N, N] score tensor through HBM.
The kernel fuses scores + relative-position bias + shifted-window mask +
fp32 softmax + value contraction per (window, head) grid cell, so scores
never touch HBM.

``window_attention(q, k, v, bias, mask)`` is the public entry; the XLA
fallback computes the identical math for CPU tests and non-TPU backends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def window_attention_xla(
    q: Array,  # [Bn, H, N, d]
    k: Array,
    v: Array,
    bias: Array,  # [H, N, N]
    mask: Optional[Array] = None,  # [nW, N, N]; window w = Bn index % nW
) -> Array:
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    scores = scores + bias[None].astype(scores.dtype)
    if mask is not None:
        nW = mask.shape[0]
        Bn = q.shape[0]
        scores = scores.reshape(Bn // nW, nW, *scores.shape[1:]) + mask[None, :, None].astype(
            scores.dtype
        )
        scores = scores.reshape(Bn, *scores.shape[2:])
    weights = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _window_group(Bn: int, nW: int, N: int, target_rows: int = 512) -> int:
    """Windows per grid cell: batch G windows so one cell holds ~target_rows
    query rows. Small Swin windows (N=30 at early HTWA stages) otherwise
    explode the grid (B·nW·H ≈ 32k cells) and the launch overhead eats the
    fusion win — measured round 1. G must divide both nW (so a cell's
    shifted-window masks are one contiguous mask block) and Bn."""
    G = max(1, target_rows // max(N, 1))
    while G > 1 and (nW % G or Bn % G):
        G -= 1
    return G


def window_attention_pallas(
    q: Array,
    k: Array,
    v: Array,
    bias: Array,
    mask: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, H, N, d = q.shape
    scale = d**-0.5
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    if not has_mask:
        mask = jnp.zeros((1, N, N), jnp.float32)
    G = _window_group(Bn, nW, N)

    def kernel(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref):
        qb = q_ref[:, 0].astype(jnp.float32)  # [G, N, d]
        kb = k_ref[:, 0].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [G, N, N] block-diagonal over the window group
        scores = scores + b_ref[0][None] + m_ref[:]
        weights = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            weights,
            v_ref[:, 0].astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, 0] = out.astype(o_ref.dtype)

    grid = (Bn // G, H)
    qkv_spec = lambda: pl.BlockSpec(
        (G, 1, N, d), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    # windows are laid out bn = batch*nW + window, so G consecutive rows map
    # to G consecutive masks; G | nW keeps each cell inside one mask block
    mask_spec = pl.BlockSpec(
        (G, N, N), lambda b, h: (b % (nW // G), 0, 0), memory_space=pltpu.VMEM
    ) if G <= nW else pl.BlockSpec(
        (nW, N, N), lambda b, h: (0, 0, 0), memory_space=pltpu.VMEM
    )
    if G > nW:
        # one cell spans several batch samples: tile the mask up to G rows
        mask = jnp.tile(mask, (G // nW, 1, 1))
        mask_spec = pl.BlockSpec((G, N, N), lambda b, h: (0, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qkv_spec(),
            qkv_spec(),
            qkv_spec(),
            pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0), memory_space=pltpu.VMEM),
            mask_spec,
        ],
        out_specs=pl.BlockSpec(
            (G, 1, N, d), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bn, H, N, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32), mask.astype(jnp.float32))


def window_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array,
    mask: Optional[Array] = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            return window_attention_pallas(q, k, v, bias, mask, interpret)
        except Exception as e:  # pragma: no cover
            # Fallback keeps training alive on unsupported backends, but a
            # silent one would hide a real kernel regression as a perf change.
            import warnings

            warnings.warn(
                f"window_attention_pallas failed ({type(e).__name__}: {e}); "
                "falling back to the XLA path",
                RuntimeWarning,
                stacklevel=2,
            )
    return window_attention_xla(q, k, v, bias, mask)
