"""Shared transformer building blocks (flax.linen), bf16-compute friendly.

These are the common pieces reused by all three model families. Layers keep
fp32 params with a configurable compute ``dtype`` (bf16 on TPU replaces the
reference's apex fp16 O2); softmax and layernorm statistics accumulate in
fp32.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e9  # additive-mask fill; large but finite so bf16 stays well-behaved


def quick_gelu(x: Array) -> Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict[str, Callable[[Array], Array]] = {
    "quick_gelu": quick_gelu,
    "gelu": nn.gelu,
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
    "relu": nn.relu,
}


def dot_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    mask: Optional[Array] = None,
    dropout_rng: Optional[Array] = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
) -> Array:
    """Scaled dot-product attention over [..., Q, D] x [..., K, D].

    Scores and softmax run in fp32 regardless of the input dtype; ``mask`` is
    additive (0 keep / NEG_INF drop), broadcastable to [..., Q, K].
    """
    scores = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    weights = weights.astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", weights, v)


class MultiHeadAttention(nn.Module):
    """Standard multi-head self-attention with separate q/k/v/out projections.

    The separate projections (rather than one fused qkv) keep param naming
    aligned with CLIP/BERT checkpoints for the weight converter; XLA fuses
    the three gemms regardless.
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self) -> None:
        if self.embed_dim % self.num_heads:
            raise ValueError(f"embed_dim {self.embed_dim} % heads {self.num_heads} != 0")
        dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")

    def _split(self, x: Array) -> Array:
        b, s, _ = x.shape
        return x.reshape(b, s, self.num_heads, -1).transpose(0, 2, 1, 3)  # [B,H,S,D]

    def __call__(
        self,
        hidden_states: Array,
        mask: Optional[Array] = None,
        deterministic: bool = True,
        kv_states: Optional[Array] = None,
    ) -> Array:
        head_dim = self.embed_dim // self.num_heads
        scale = head_dim**-0.5
        kv = hidden_states if kv_states is None else kv_states
        q = self._split(self.q_proj(hidden_states))
        k = self._split(self.k_proj(kv))
        v = self._split(self.v_proj(kv))
        rng = self.make_rng("dropout") if (self.dropout_rate > 0 and not deterministic) else None
        out = dot_attention(
            q, k, v, scale, mask, rng, self.dropout_rate, deterministic
        )  # [B,H,Q,D]
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)
        return self.out_proj(out)


class TransformerMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = ACT2FN[self.act](x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)


def make_causal_mask(seq_len: int, dtype: jnp.dtype = jnp.float32) -> Array:
    """Additive causal mask [1, 1, S, S] (upper triangle = NEG_INF)."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), NEG_INF, dtype=dtype), k=1)
    return mask[None, None]


def expand_padding_mask(attention_mask: Array, dtype: jnp.dtype = jnp.float32) -> Array:
    """[B, S] 1/0 keep mask -> additive [B, 1, 1, S]."""
    return ((1.0 - attention_mask.astype(dtype)) * NEG_INF)[:, None, None, :]
