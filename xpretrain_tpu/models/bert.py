"""Staged BERT encoder (flax): the shared text/fusion backbone.

One implementation covers both reference forks:

- HD-VILA's two-stage split — ``stage1`` = first half (text-only tower),
  ``stage2`` = second half (cross-modal fusion)
  (``hd-vila/src/modeling/Transformers.py:421-529``, ``forward_stage``
  ``:474-513``).
- LF-VILA's three-stage split — ``stage0`` per-sentence local layers,
  ``stage1`` cross-sentence global layers, ``stage2`` cross-modal fusion
  (``LF-VILA/src/models/bert.py:557-612``).

Layer ranges are expressed as ``stage_bounds``: a tuple of split points; the
encoder exposes ``forward_range(hidden, mask, start, end)``. Standard HF BERT
checkpoint layout (separate query/key/value projections, post-LN blocks) is
kept so the weight converter is a pure renaming.

LF-VILA's optional DeepSpeed block-sparse attention
(``LF-VILA/src/models/bert.py:75-111``) maps to ``attention_window``: 0 =
dense, else block-local banded attention computed with static reshapes
(XLA-fusable; the Pallas blockwise kernel in ``ops/`` is the optimized path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from xpretrain_tpu.models.common import ACT2FN, expand_padding_mask

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    # stage split points, e.g. (6,) -> stages [0,6) and [6,12);
    # (8, 12) -> [0,8), [8,12), [12, num_layers)
    stage_bounds: tuple = ()
    attention_window: int = 0  # 0 = dense; >0 = block-local attention

    @staticmethod
    def bert_base(**overrides) -> "BertConfig":
        return BertConfig(**overrides)

    @staticmethod
    def bert_large(**overrides) -> "BertConfig":
        return BertConfig(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            **overrides,
        )

    def stage_range(self, stage: int) -> tuple[int, int]:
        bounds = (0,) + tuple(self.stage_bounds) + (self.num_hidden_layers,)
        return bounds[stage], bounds[stage + 1]


class BertEmbeddings(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        token_type_ids: Optional[Array] = None,
        position_ids: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        seq_len = input_ids.shape[1]
        words = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        if position_ids is None:
            position_ids = jnp.arange(seq_len)[None]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(position_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        types = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_type_embeddings"
        )(token_type_ids)
        x = words + pos + types
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        return nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)


def _block_local_mask(seq_len: int, window: int) -> Array:
    """Additive mask restricting attention to same/adjacent blocks of size
    ``window`` (the fixed-pattern block-sparse equivalent, ref DeepSpeed
    fixed sparsity with 16 local blocks at ``pretrain_stage1.yaml:129-137``)."""
    import numpy as np

    blocks = (seq_len + window - 1) // window
    idx = np.arange(seq_len) // window
    ok = np.abs(idx[:, None] - idx[None, :]) <= 1
    # global attention for block 0 (the CLS block), both directions
    ok[idx == 0] = True
    ok[:, idx == 0] = True
    return jnp.asarray(np.where(ok, 0.0, -1e9), jnp.float32)[None, None]


class BertSelfAttention(nn.Module):
    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, mask: Optional[Array], deterministic: bool = True) -> Array:
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)
        split = lambda x: x.reshape(*x.shape[:2], h, d).transpose(0, 2, 1, 3)
        q = split(dense("query")(hidden))
        k = split(dense("key")(hidden))
        v = split(dense("value")(hidden))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d**-0.5)
        if cfg.attention_window > 0:
            scores = scores + _block_local_mask(hidden.shape[1], cfg.attention_window)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        weights = jax.nn.softmax(scores, axis=-1)
        weights = nn.Dropout(cfg.attention_probs_dropout_prob)(
            weights, deterministic=deterministic
        ).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        return out.transpose(0, 2, 1, 3).reshape(*hidden.shape[:2], cfg.hidden_size)


class BertLayer(nn.Module):
    """Post-LN BERT block with HF param layout."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array, mask: Optional[Array], deterministic: bool = True) -> Array:
        cfg = self.config
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name=name)
        attn_out = BertSelfAttention(cfg, dtype=self.dtype, name="attention_self")(
            hidden, mask, deterministic
        )
        attn_out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="attention_output_dense")(
            attn_out
        )
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(attn_out, deterministic=deterministic)
        hidden = ln("attention_output_LayerNorm")(hidden + attn_out)
        inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(hidden)
        inter = ACT2FN[cfg.hidden_act](inter)
        out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        out = nn.Dropout(cfg.hidden_dropout_prob)(out, deterministic=deterministic)
        return ln("output_LayerNorm")(hidden + out)


class StagedBertEncoder(nn.Module):
    """BERT encoder whose layers run in configurable [start, end) ranges."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self) -> None:
        layer_cls = nn.remat(BertLayer, static_argnums=(3,)) if self.remat else BertLayer
        self.layers = [
            layer_cls(self.config, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.config.num_hidden_layers)
        ]

    def __call__(
        self,
        hidden: Array,
        mask: Optional[Array] = None,
        stage: Optional[int] = None,
        deterministic: bool = True,
    ) -> Array:
        if stage is None:
            start, end = 0, self.config.num_hidden_layers
        else:
            start, end = self.config.stage_range(stage)
        for i in range(start, end):
            hidden = self.layers[i](hidden, mask, deterministic)
        return hidden


class BertPooler(nn.Module):
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        return jnp.tanh(nn.Dense(self.hidden_size, dtype=self.dtype, name="dense")(hidden[:, 0]))


class BertMLMHead(nn.Module):
    """Transform + decoder to vocab (untied, matching the reference's
    cloned-not-tied heads at ``hd-vila/src/modeling/modeling_stage.py:345-360``)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: Array) -> Array:
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="transform_dense")(hidden)
        x = ACT2FN[cfg.hidden_act](x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="transform_LayerNorm")(x)
        return nn.Dense(cfg.vocab_size, dtype=self.dtype, name="decoder")(x)


class StagedBertModel(nn.Module):
    """Embeddings + staged encoder; ``stage=None`` runs all layers.

    ``inputs_embeds`` bypasses the embedding table for stages that consume
    already-embedded sequences (LF-VILA stages 1/2, HD-VILA stage 2 fusion).
    """

    config: BertConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    with_pooler: bool = False

    def setup(self) -> None:
        self.embeddings = BertEmbeddings(self.config, dtype=self.dtype)
        self.encoder = StagedBertEncoder(self.config, dtype=self.dtype, remat=self.remat)
        if self.with_pooler:
            self.pooler = BertPooler(self.config.hidden_size, dtype=self.dtype)

    def __call__(
        self,
        input_ids: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        token_type_ids: Optional[Array] = None,
        inputs_embeds: Optional[Array] = None,
        stage: Optional[int] = None,
        embed: bool = True,
        deterministic: bool = True,
    ) -> Array:
        if inputs_embeds is None:
            hidden = self.embeddings(input_ids, token_type_ids, deterministic=deterministic)
        else:
            hidden = inputs_embeds
        mask = None
        if attention_mask is not None:
            mask = expand_padding_mask(attention_mask)
        return self.encoder(hidden, mask, stage, deterministic)

    def pool(self, hidden: Array) -> Array:
        return self.pooler(hidden)
