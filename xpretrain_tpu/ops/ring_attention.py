"""Ring attention over an ICI sequence axis (TPU-native long-context op).

The reference scales sequence length purely algorithmically on one device
(proxy attention, divided space-time, HTWA windows — SURVEY §5.7) and has no
sequence parallelism anywhere. This module supplies the natural TPU
extension SURVEY names for longer-than-32-frame videos: exact softmax
attention whose **sequence axis is sharded over a mesh axis**, with K/V
blocks rotating around the ring via ``lax.ppermute`` (neighbour ICI
transfers, never a global collective) and a numerically stable online
softmax merging the partial results — the standard blockwise/ring recipe
(Liu et al. 2023, "Ring Attention with Blockwise Transformers").

Memory per device is O(S/p · S/p) for scores instead of O(S²); activations,
Q, K, V, and the output all stay sharded over the ring. The op is fully
differentiable (``ppermute`` transposes to the inverse permutation, the
online-softmax rescaling is plain arithmetic), so the same function serves
train and eval. Composes with data parallelism on a ``(data, seq)`` mesh.

Complements (does not replace) the existing parallelism surface:
``--tp`` shards heads/MLPs, ``--cp`` shards the Swin3D temporal axis with
windows that mostly avoid communication, ring attention shards DENSE
attention — the fusion-tower case where every token attends to every token.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_NEG_BIG = -1e30  # finite "−inf": keeps exp() exact zeros without NaN risk


def _ring_attention_local(
    q: Array, k: Array, v: Array, bias_k: Optional[Array], axis_name: str
) -> Array:
    """Per-device body (inside shard_map): q/k/v are the LOCAL blocks
    [B, H, S/p, D]; ``bias_k`` is the local additive key bias [B, 1, 1, S/p]
    (padding mask), rotated alongside K/V so every device applies the bias
    of the block it is currently attending to."""
    p = lax.psum(1, axis_name)
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale

    # running online-softmax state, fp32 for stability
    m = jnp.full(q.shape[:-1] + (1,), _NEG_BIG, jnp.float32)   # row max
    l = jnp.zeros(q.shape[:-1] + (1,), jnp.float32)            # row denom
    o = jnp.zeros(q.shape[:-1] + (q.shape[-1],), jnp.float32)  # unnormalized out
    perm = [(i, (i + 1) % p) for i in range(p)]

    for _ in range(p):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if bias_k is not None:
            s = s + bias_k.astype(jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        pexp = jnp.exp(s - m_new)
        l = l * alpha + pexp.sum(axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", pexp, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m = m_new
        # rotate K/V (and their bias) one step around the ring
        k = lax.ppermute(k, axis_name, perm)
        v = lax.ppermute(v, axis_name, perm)
        if bias_k is not None:
            bias_k = lax.ppermute(bias_k, axis_name, perm)

    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


def make_ring_attention(
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    data_axis: Optional[str] = None,
):
    """Build ``fn(q, k, v, attention_mask=None) -> out`` computing exact
    softmax attention with the sequence dimension sharded over
    ``mesh[seq_axis]``.

    ``q``/``k``/``v`` are [B, H, S, D] (S divisible by the ring size);
    ``attention_mask`` is the [B, S] 1/0 keep mask (expanded to an additive
    key bias internally, sharded over the ring like K). The result is
    numerically identical to dense ``softmax(QKᵀ/√d + bias)V`` — asserted,
    with gradients, in ``tests/test_ring_attention.py``.
    """
    qkv_spec = (
        P(data_axis, None, seq_axis, None)
        if data_axis is not None
        else P(None, None, seq_axis, None)
    )
    bias_spec = (
        P(data_axis, None, None, seq_axis)
        if data_axis is not None
        else P(None, None, None, seq_axis)
    )

    def fn(q: Array, k: Array, v: Array, attention_mask: Optional[Array] = None) -> Array:
        p = mesh.shape[seq_axis]
        if q.shape[2] % p:
            raise ValueError(f"sequence {q.shape[2]} not divisible by ring size {p}")
        if attention_mask is not None:
            bias = ((1.0 - attention_mask.astype(jnp.float32)) * _NEG_BIG)[:, None, None, :]
            body = shard_map(
                lambda qq, kk, vv, bb: _ring_attention_local(qq, kk, vv, bb, seq_axis),
                mesh=mesh,
                in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
                out_specs=qkv_spec,
                check_vma=False,
            )
            return body(q, k, v, bias)
        body = shard_map(
            lambda qq, kk, vv: _ring_attention_local(qq, kk, vv, None, seq_axis),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )
        return body(q, k, v)

    return fn
