"""HD-VILA two-stage BERT transformer + pretraining/task heads (flax).

TPU-native re-design of ``hd-vila/src/modeling/modeling_stage.py``:

- :class:`VisualInputEmbedding` — temporal mean-pool of the grid, learned
  2-D row/col position embeddings, train-time pixel random sampling
  (ref ``:41-154``).
- :class:`HdVilaBaseModel` — ``forward_stage1`` text-only through the first
  half of a BERT (+pooler1); ``forward_stage2`` text⊕visual through the
  second half (+pooler2) (ref ``:157-312``; layer split
  ``Transformers.py:430-437``).
- :class:`HdVilaForPreTraining` — stage-1 ITC features via mean-pooled text
  (``bert_mean``) and mean-pooled raw grid through ``t_proj``/``v_proj``;
  stage-2 MLM + ITM over clip-aggregated (mean/max/lse) fusion outputs
  (ref ``:315-462``).
- Task heads: sequence classification, multiple-choice, regression, and
  retrieval-rerank wrappers (ref ``:482-751``).

The ``clip_num`` axis stays a leading batch-like axis: every clip fuses with
the (repeated) text independently, then logits aggregate over clips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from xpretrain_tpu.models.bert import (
    BertConfig,
    BertMLMHead,
    BertPooler,
    StagedBertModel,
)
from xpretrain_tpu.models.clip_vip.model import l2_normalize
from xpretrain_tpu.ops.losses import itm_loss as itm_xent
from xpretrain_tpu.ops.losses import mlm_loss as masked_lm_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HdVilaModelConfig:
    bert: BertConfig = dataclasses.field(
        default_factory=lambda: BertConfig.bert_large(stage_bounds=(12,))
    )
    stage: int = 1
    max_grid_row_position_embeddings: int = 100
    max_grid_col_position_embeddings: int = 100
    pixel_random_sampling_size: int = 160
    score_agg_func: str = "mean"  # mean | max | lse
    bert_mean: bool = True
    temp: float = 0.05
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "HdVilaModelConfig":
        base = dict(
            bert=BertConfig(
                hidden_size=64,
                num_hidden_layers=4,
                num_attention_heads=4,
                intermediate_size=128,
                stage_bounds=(2,),
                vocab_size=1000,
            )
        )
        base.update(overrides)
        return HdVilaModelConfig(**base)


class VisualInputEmbedding(nn.Module):
    """Grid -> visual token sequence (ref ``modeling_stage.py:41-154``)."""

    config: HdVilaModelConfig

    @nn.compact
    def __call__(
        self,
        grid: Array,  # [B, n_frm, H, W, C]
        sample_rng: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        bert = cfg.bert
        grid = grid.mean(axis=1)  # temporal mean pool -> [B, H, W, C]
        B, H, W, C = grid.shape
        row = nn.Embed(
            cfg.max_grid_row_position_embeddings, bert.hidden_size,
            dtype=cfg.dtype, name="row_position_embeddings",
        )(jnp.arange(H))
        col = nn.Embed(
            cfg.max_grid_col_position_embeddings, bert.hidden_size,
            dtype=cfg.dtype, name="col_position_embeddings",
        )(jnp.arange(W))
        grid = grid + row[None, :, None] + col[None, None, :]
        tokens = grid.reshape(B, H * W, C)

        if (
            not deterministic
            and sample_rng is not None
            and 0 < cfg.pixel_random_sampling_size < H * W
        ):
            # train-time pixel random sampling (ref :79-89): a shared sorted
            # subset of token positions — without-replacement via permutation
            idx = jnp.sort(
                jax.random.permutation(sample_rng, H * W)[: cfg.pixel_random_sampling_size]
            )
            tokens = tokens[:, idx]

        token_type = self.param(
            "token_type_embedding", nn.initializers.normal(0.02), (1, 1, bert.hidden_size),
            jnp.float32,
        )
        tokens = tokens + token_type.astype(tokens.dtype)
        tokens = nn.LayerNorm(epsilon=bert.layer_norm_eps, dtype=cfg.dtype, name="LayerNorm")(tokens)
        return nn.Dropout(bert.hidden_dropout_prob)(tokens, deterministic=deterministic)


class HdVilaBaseModel(nn.Module):
    """Two-stage BERT with separate poolers (ref ``:157-312``)."""

    config: HdVilaModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.bert = StagedBertModel(cfg.bert, dtype=cfg.dtype)
        self.pooler1 = BertPooler(cfg.bert.hidden_size, dtype=cfg.dtype)
        self.pooler2 = BertPooler(cfg.bert.hidden_size, dtype=cfg.dtype)
        self.visual_embeddings = VisualInputEmbedding(cfg)

    def forward_stage1(
        self, text_input_ids: Array, attention_mask: Array, deterministic: bool = True
    ) -> tuple[Array, Array]:
        hidden = self.bert(
            input_ids=text_input_ids,
            attention_mask=attention_mask,
            stage=0,
            deterministic=deterministic,
        )
        return hidden, self.pooler1(hidden)

    def forward_stage2(
        self,
        text_hidden: Array,  # [clips*B, Lt, C] (text repeated per clip)
        visual_inputs: Array,  # [clips*B, n_frm, H, W, C]
        attention_mask: Array,  # [clips*B, Lt]
        sample_rng: Optional[Array] = None,
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        visual_tokens = self.visual_embeddings(visual_inputs, sample_rng, deterministic)
        visual_mask = jnp.ones(visual_tokens.shape[:2], attention_mask.dtype)
        full_mask = jnp.concatenate([attention_mask, visual_mask], axis=1)
        hidden = jnp.concatenate([text_hidden, visual_tokens], axis=1)
        hidden = self.bert(
            inputs_embeds=hidden,
            attention_mask=full_mask,
            stage=1,
            deterministic=deterministic,
        )
        return hidden, self.pooler2(hidden)


def _agg_clips(x: Array, method: str) -> Array:
    if method == "mean":
        return x.mean(axis=0)
    if method == "max":
        return x.max(axis=0)
    if method == "lse":
        return jax.nn.logsumexp(x, axis=0)
    raise ValueError(f"bad score_agg_func {method!r}")


class HdVilaForPreTraining(nn.Module):
    """ITC (stage 1) + MLM/ITM (stage 2) heads (ref ``:315-462``)."""

    config: HdVilaModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.bert_model = HdVilaBaseModel(cfg)
        self.cls = BertMLMHead(cfg.bert, dtype=cfg.dtype)
        self.seq_relationship = nn.Dense(2, dtype=cfg.dtype)
        self.t_proj = nn.Dense(cfg.bert.hidden_size, dtype=cfg.dtype)
        self.v_proj = nn.Dense(cfg.bert.hidden_size, dtype=cfg.dtype)

    def __call__(
        self,
        visual_inputs: Array,  # [B, clips, n_frm, H, W, C] from HdVilaEncoder
        text_input_ids: Array,
        text_input_mask: Array,
        mlm_labels: Optional[Array] = None,
        itm_labels: Optional[Array] = None,
        sample_rng: Optional[Array] = None,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        cfg = self.config
        B, clips = visual_inputs.shape[:2]
        text_hidden, pooled1 = self.bert_model.forward_stage1(
            text_input_ids, text_input_mask, deterministic
        )
        if cfg.bert_mean:
            # masked mean over tokens, then pooler1's dense+tanh (ref :385-387)
            mask = text_input_mask[..., None].astype(text_hidden.dtype)
            mean_text = (text_hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
            pooled1 = self._pool1_transform(mean_text)

        # ITC features: mean-pooled raw grid over (clips, frm, H, W)
        visual_pooled = visual_inputs.mean(axis=(1, 2, 3, 4))
        out: dict[str, Array] = {
            "text_features": l2_normalize(self.t_proj(pooled1)),
            "vis_features": l2_normalize(self.v_proj(visual_pooled)),
        }
        if cfg.stage == 1:
            return out

        # stage 2: repeat text per clip, fuse each clip independently
        text_rep = jnp.tile(text_hidden, (clips, 1, 1))
        mask_rep = jnp.tile(text_input_mask, (clips, 1))
        vis_flat = visual_inputs.transpose(1, 0, 2, 3, 4, 5).reshape(
            clips * B, *visual_inputs.shape[2:]
        )
        seq_out, pooled2 = self.bert_model.forward_stage2(
            text_rep, vis_flat, mask_rep, sample_rng, deterministic
        )
        Lt = text_input_mask.shape[1]
        seq_out = seq_out.reshape(clips, B, *seq_out.shape[1:])
        pooled2 = pooled2.reshape(clips, B, -1)
        out["vtoken_output"] = seq_out[:, :, Lt:]

        seq_agg = _agg_clips(seq_out, cfg.score_agg_func)
        pooled_agg = _agg_clips(pooled2, cfg.score_agg_func)
        mlm_logits = self.cls(seq_agg[:, :Lt])
        itm_logits = self.seq_relationship(pooled_agg)
        out["mlm_logits"] = mlm_logits
        out["itm_logits"] = itm_logits

        if mlm_labels is not None:
            labels = mlm_labels
            if itm_labels is not None:
                # negatives pairs carry no MLM signal (ref :431)
                labels = jnp.where(itm_labels[:, None] == 0, -100, labels)
            out["mlm_loss"] = masked_lm_loss(mlm_logits, labels)
            sel = labels != -100
            correct = (jnp.argmax(mlm_logits, -1) == labels) & sel
            out["mlm_acc"] = jnp.sum(correct) / jnp.maximum(jnp.sum(sel), 1)
        if itm_labels is not None:
            out["itm_loss"] = itm_xent(itm_logits, itm_labels)
            out["itm_acc"] = jnp.mean((jnp.argmax(itm_logits, -1) == itm_labels).astype(jnp.float32))
        return out

    def _pool1_transform(self, mean_text: Array) -> Array:
        """Apply pooler1's dense+tanh to the mean-pooled text (ref :385-387)."""
        return self.bert_model.pooler1(mean_text[:, None])

    def forward_text(self, text_input_ids: Array, text_input_mask: Array) -> Array:
        """Text tower alone: stage-0 BERT -> pooled -> t_proj -> L2 norm.

        Identical math to the text half of ``__call__`` (the stage-1 ITC
        features); the serving-export surface (``serving/artifact.py``)."""
        text_hidden, pooled1 = self.bert_model.forward_stage1(
            text_input_ids, text_input_mask, True
        )
        if self.config.bert_mean:
            mask = text_input_mask[..., None].astype(text_hidden.dtype)
            mean_text = (text_hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
            pooled1 = self._pool1_transform(mean_text)
        return l2_normalize(self.t_proj(pooled1))

    def project_visual(self, visual_inputs: Array) -> Array:
        """ITC video projection of the encoder grid: mean-pool -> v_proj -> L2."""
        visual_pooled = visual_inputs.mean(axis=(1, 2, 3, 4))
        return l2_normalize(self.v_proj(visual_pooled))


class HdVilaForSequenceClassification(nn.Module):
    """QA-as-classification head over the fused [CLS] (ref ``:482-546``)."""

    config: HdVilaModelConfig
    num_labels: int

    def setup(self) -> None:
        cfg = self.config
        self.bert_model = HdVilaBaseModel(cfg)
        self.dropout = nn.Dropout(cfg.bert.hidden_dropout_prob)
        self.classifier = nn.Sequential(
            [
                nn.Dense(cfg.bert.hidden_size * 2, dtype=cfg.dtype),
                nn.relu,
                nn.Dense(self.num_labels, dtype=cfg.dtype),
            ]
        )

    def __call__(
        self,
        visual_inputs: Array,
        text_input_ids: Array,
        text_input_mask: Array,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        B, clips = visual_inputs.shape[:2]
        text_hidden, _ = self.bert_model.forward_stage1(
            text_input_ids, text_input_mask, deterministic
        )
        text_rep = jnp.tile(text_hidden, (clips, 1, 1))
        mask_rep = jnp.tile(text_input_mask, (clips, 1))
        vis_flat = visual_inputs.transpose(1, 0, 2, 3, 4, 5).reshape(
            clips * B, *visual_inputs.shape[2:]
        )
        _, pooled2 = self.bert_model.forward_stage2(
            text_rep, vis_flat, mask_rep, None, deterministic
        )
        # clip aggregation happens on LOGITS, matching the reference's eval
        # pooling (run_video_qa.py:270-280 pools model logits with
        # score_agg_func before argmax) — pooling features pre-MLP would
        # differ for max/lse and for the nonlinear classifier.
        pooled = self.dropout(pooled2, deterministic=deterministic)
        logits = self.classifier(pooled).reshape(clips, B, -1)
        return {"logits": _agg_clips(logits, self.config.score_agg_func)}


class HdVilaForMultipleChoice(nn.Module):
    """N-way multiple choice: each choice fused separately (ref ``:549-623``)."""

    config: HdVilaModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.bert_model = HdVilaBaseModel(cfg)
        self.dropout = nn.Dropout(cfg.bert.hidden_dropout_prob)
        self.classifier = nn.Sequential(
            [nn.Dense(cfg.bert.hidden_size * 2, dtype=cfg.dtype), nn.relu, nn.Dense(1, dtype=cfg.dtype)]
        )

    def __call__(
        self,
        visual_inputs: Array,  # [B, clips, n_frm, H, W, C]
        text_input_ids: Array,  # [B, n_choice, Lt]
        text_input_mask: Array,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        B, n_choice, Lt = text_input_ids.shape
        clips = visual_inputs.shape[1]
        ids = text_input_ids.reshape(B * n_choice, Lt)
        mask = text_input_mask.reshape(B * n_choice, Lt)
        text_hidden, _ = self.bert_model.forward_stage1(ids, mask, deterministic)
        # repeat each sample's clips across its choices
        vis = jnp.repeat(visual_inputs, n_choice, axis=0)  # [B*n_choice, clips, ...]
        text_rep = jnp.tile(text_hidden, (clips, 1, 1))
        mask_rep = jnp.tile(mask, (clips, 1))
        vis_flat = vis.transpose(1, 0, 2, 3, 4, 5).reshape(clips * B * n_choice, *vis.shape[2:])
        _, pooled2 = self.bert_model.forward_stage2(
            text_rep, vis_flat, mask_rep, None, deterministic
        )
        # logits-level clip aggregation (see HdVilaForSequenceClassification)
        pooled = self.dropout(pooled2, deterministic=deterministic)
        logits = self.classifier(pooled).reshape(clips, B * n_choice)
        logits = _agg_clips(logits, self.config.score_agg_func).reshape(B, n_choice)
        return {"logits": logits}


class HdVilaForRegression(nn.Module):
    """Scalar regression head (ref ``:625-678``)."""

    config: HdVilaModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.bert_model = HdVilaBaseModel(cfg)
        self.regressor = nn.Sequential(
            [nn.Dense(cfg.bert.hidden_size * 2, dtype=cfg.dtype), nn.relu, nn.Dense(1, dtype=cfg.dtype)]
        )

    def __call__(self, visual_inputs, text_input_ids, text_input_mask, deterministic=True):
        B, clips = visual_inputs.shape[:2]
        text_hidden, _ = self.bert_model.forward_stage1(
            text_input_ids, text_input_mask, deterministic
        )
        text_rep = jnp.tile(text_hidden, (clips, 1, 1))
        mask_rep = jnp.tile(text_input_mask, (clips, 1))
        vis_flat = visual_inputs.transpose(1, 0, 2, 3, 4, 5).reshape(
            clips * B, *visual_inputs.shape[2:]
        )
        _, pooled2 = self.bert_model.forward_stage2(
            text_rep, vis_flat, mask_rep, None, deterministic
        )
        # logits-level clip aggregation (see HdVilaForSequenceClassification)
        logits = self.regressor(pooled2).reshape(clips, B)
        return {"logits": _agg_clips(logits, self.config.score_agg_func)}


class HdVilaForVideoTextRetrieval(nn.Module):
    """Fusion-rerank retrieval head (ref ``:694-751``)."""

    config: HdVilaModelConfig

    def setup(self) -> None:
        cfg = self.config
        self.bert_model = HdVilaBaseModel(cfg)
        self.classifier = nn.Sequential(
            [nn.Dense(cfg.bert.hidden_size * 2, dtype=cfg.dtype), nn.relu, nn.Dense(1, dtype=cfg.dtype)]
        )
        self.t_proj = nn.Dense(cfg.bert.hidden_size, dtype=cfg.dtype)
        self.v_proj = nn.Dense(cfg.bert.hidden_size, dtype=cfg.dtype)

    def __call__(self, visual_inputs, text_input_ids, text_input_mask, deterministic=True):
        B, clips = visual_inputs.shape[:2]
        text_hidden, pooled1 = self.bert_model.forward_stage1(
            text_input_ids, text_input_mask, deterministic
        )
        text_rep = jnp.tile(text_hidden, (clips, 1, 1))
        mask_rep = jnp.tile(text_input_mask, (clips, 1))
        vis_flat = visual_inputs.transpose(1, 0, 2, 3, 4, 5).reshape(
            clips * B, *visual_inputs.shape[2:]
        )
        _, pooled2 = self.bert_model.forward_stage2(
            text_rep, vis_flat, mask_rep, None, deterministic
        )
        # logits-level clip aggregation (see HdVilaForSequenceClassification)
        logits = self.classifier(pooled2).reshape(clips, B)
        logits = _agg_clips(logits, self.config.score_agg_func)
        visual_pooled = visual_inputs.mean(axis=(1, 2, 3, 4))
        return {
            "logits": logits,
            "text_features": l2_normalize(self.t_proj(pooled1)),
            "vis_features": l2_normalize(self.v_proj(visual_pooled)),
        }
