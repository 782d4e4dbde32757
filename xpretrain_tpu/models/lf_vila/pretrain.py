"""LF-VILA pretraining model: HTWA video encoder + 3-stage BERT + MTC/VTM/MLM.

TPU-native re-design of ``LF-VILA/src/models/lfvila_pretrain.py:51-285`` and
``text_encoder.py:12-123``:

- Stage 1 (contrastive): Swin3D features are MaxPool(2,3)-downsampled and
  clip-mean-pooled to clip-level features (``downsample_video_embd``
  ``:154-166``); text runs per-sentence through BERT layers [0, 8) then —
  with sentence position/segment embeddings re-applied and a mean-CLS token
  prepended — globally through layers [8, 12). Losses: global InfoNCE +
  Multimodal Temporal Contrastive (``ops.losses.mtc_loss``).
- Stage 2 (fusion): video tokens get separable space/time position embeds,
  half the batch's video embeddings are rolled for VTM, and text⊕video runs
  through BERT layers [12, 24) with MLM (positive half only) + VTM heads.

Under pjit, the train-step loss sees the logically-global feature arrays, so
the reference's ``SyncFunction`` allgather (``:219-226``) is implicit.
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
from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D
from xpretrain_tpu.ops.losses import mlm_loss as masked_lm_loss
from xpretrain_tpu.ops.losses import mtc_loss, nce_loss

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LfVilaConfig:
    video: Swin3DConfig = dataclasses.field(default_factory=Swin3DConfig)
    bert: BertConfig = dataclasses.field(
        default_factory=lambda: BertConfig.bert_large(stage_bounds=(8, 12), type_vocab_size=8)
    )
    stage: int = 1
    sample_clip: int = 4  # sentences/clips per long-form sample
    sample_frame: int = 32
    final_num_patches: int = 6
    temp: float = 0.05
    time_temp: float = 0.05
    num_key: int = 2
    num_value: int = 2
    num_other_neg: int = 3
    use_time_match: bool = True
    ct_global_loss_weight: float = 1.0
    ct_time_loss_weight: float = 1.0
    mlm_loss_weight: float = 1.0
    vtm_loss_weight: float = 10.0
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**overrides) -> "LfVilaConfig":
        # bert.hidden_size must equal the Swin num_features (as in the real
        # config: Swin 128*2^3 = 1024 = BERT-large hidden) — the fusion stage
        # concatenates video tokens into the text stream with no projection
        base = dict(
            video=Swin3DConfig.tiny(),
            bert=BertConfig(
                hidden_size=256,
                num_hidden_layers=6,
                num_attention_heads=4,
                intermediate_size=256,
                stage_bounds=(2, 4),
                type_vocab_size=8,
                vocab_size=1000,
            ),
        )
        base.update(overrides)
        return LfVilaConfig(**base)


class VideoTokenPos(nn.Module):
    """Separable spatial+temporal pos embeds for fusion-stage video tokens
    (ref ``lfvila_pretrain.py:18-28``)."""

    num_patches: int
    num_frames: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video_embd: Array) -> Array:  # [B, N, P, C]
        s_pos = self.param(
            "s_pos_embed",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            (1, 1, self.num_patches, self.hidden_size),
        )
        t_pos = self.param(
            "t_pos_embed",
            lambda key, shape: 0.02 * jax.random.normal(key, shape),
            (1, self.num_frames, 1, self.hidden_size),
        )
        x = video_embd + s_pos.astype(video_embd.dtype) + t_pos.astype(video_embd.dtype)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class SentEmbedding(nn.Module):
    """Sentence-level position+segment embeddings re-applied over the
    concatenated sentence stream (ref ``lfvila_pretrain.py:30-48``)."""

    config: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, inputs_embeds: Array, token_type_ids: Array, deterministic: bool = True
    ) -> Array:
        cfg = self.config
        seq_len = inputs_embeds.shape[1]
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embeddings",
        )(jnp.arange(seq_len)[None])
        seg = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype, name="segment_embeddings"
        )(token_type_ids)
        x = inputs_embeds + pos + seg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm")(x)
        return nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)


class LfVilaPretrain(nn.Module):
    """The two-stage LF-VILA pretraining model."""

    config: LfVilaConfig

    def setup(self) -> None:
        cfg = self.config
        self.video_encoder = SwinTransformer3D(cfg.video)
        self.text_encoder = StagedBertModel(cfg.bert, dtype=cfg.dtype, with_pooler=True)
        self.cls = BertMLMHead(cfg.bert, dtype=cfg.dtype)
        self.seq_relationship = nn.Dense(2, dtype=cfg.dtype)
        hidden = cfg.bert.hidden_size
        self.video_local_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.text_local_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.video_global_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.text_global_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.sent_embedding = SentEmbedding(cfg.bert, dtype=cfg.dtype)
        if cfg.stage == 2:
            self.video_token_pos = VideoTokenPos(
                cfg.final_num_patches, cfg.sample_frame, hidden, dtype=cfg.dtype
            )

    # ---- video helpers ---------------------------------------------------

    def downsample_video_embd(self, video_embd: Array) -> tuple[Array, Array]:
        """[B, N, H, W, C] -> (clip feats [B, sample_clip, C], tokens [B, N, X, C]);
        MaxPool(2,3)/stride 1 over (H, W) then per-clip mean (ref ``:154-166``)."""
        cfg = self.config
        B, N, H, W, C = video_embd.shape
        x = video_embd.reshape(B * N, H, W, C)
        x = nn.max_pool(x, window_shape=(2, 3), strides=(1, 1))
        x = x.reshape(B, N, -1, C)  # [B, N, X, C]
        clips = x.reshape(B, cfg.sample_clip, N // cfg.sample_clip, -1, C).mean(axis=(2, 3))
        return clips, x

    def shuffle_embd_for_vtm(self, video_embd: Array) -> tuple[Array, Array]:
        """Roll the first half of the batch to build VTM negatives (ref ``:168-173``)."""
        B = video_embd.shape[0]
        neg = jnp.roll(video_embd[: B // 2], 1, axis=0)
        out = jnp.concatenate([neg, video_embd[B // 2 :]], axis=0)
        labels = jnp.concatenate(
            [jnp.zeros((B // 2,), jnp.int32), jnp.ones((B - B // 2,), jnp.int32)]
        )
        return out, labels

    # ---- forward ---------------------------------------------------------

    def __call__(
        self,
        video_frames: Array,  # [B, C, N, H, W]
        text_ids: Array,  # [B, M, L]
        attention_mask: Array,  # [B, M, L]
        mlm_labels: Optional[Array] = None,  # [B, M*L]
        mtc_rng: Optional[Array] = None,
        stage: Optional[int] = None,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        cfg = self.config
        stage = cfg.stage if stage is None else stage

        video_global_embd, video_local_embd = self.video_encoder(
            video_frames, deterministic=deterministic
        )
        video_local_feat1, _ = self.downsample_video_embd(video_local_embd)
        video_local_feat2, video_stage1_embd = self.downsample_video_embd(video_global_embd)

        B, M, L = text_ids.shape
        text_local_embd = self.text_encoder(
            text_ids.reshape(B * M, L),
            attention_mask=attention_mask.reshape(B * M, L),
            stage=0,
            deterministic=deterministic,
        ).reshape(B, M, L, -1)

        out: dict[str, Array] = {}
        if stage == 1:
            text_local_feat = text_local_embd[:, :, 0, :]
            out["video_local_feat"] = l2_normalize(self.video_local_proj(video_local_feat1))
            out["text_local_feat"] = l2_normalize(self.text_local_proj(text_local_feat))

        # sentence embeddings + mean-CLS + global text encoding; segment id =
        # sentence index repeated over its L tokens (ref :253 repeat_interleave)
        seg_ids = jnp.repeat(jnp.arange(M), L)[None].repeat(B, axis=0)  # [B, M*L]
        text_stream = self.sent_embedding(
            text_local_embd.reshape(B, M * L, -1), seg_ids, deterministic
        )
        # mean of per-sentence CLS positions AFTER sentence embeddings
        # (ref lfvila_pretrain.py:203-205 reassigns before taking the mean)
        text_local_cls = text_stream.reshape(B, M, L, -1)[:, :, 0, :].mean(axis=1)  # [B, C]
        text_global_embd = jnp.concatenate([text_local_cls[:, None], text_stream], axis=1)
        global_mask = jnp.concatenate(
            [jnp.ones((B, 1), attention_mask.dtype), attention_mask.reshape(B, M * L)], axis=1
        )
        text_global_embd = self.text_encoder(
            inputs_embeds=text_global_embd,
            attention_mask=global_mask,
            stage=1,
            deterministic=deterministic,
        )

        if stage == 1:
            text_global_feat = text_global_embd[:, 0]
            video_global_feat = video_local_feat2.mean(axis=1)
            video_global_feat = l2_normalize(self.video_global_proj(video_global_feat))
            text_global_feat = l2_normalize(self.text_global_proj(text_global_feat))
            out["video_global_feat"] = video_global_feat
            out["text_global_feat"] = text_global_feat

            ct_global = cfg.ct_global_loss_weight * nce_loss(
                video_global_feat, text_global_feat, cfg.temp
            )
            out["ct_global_loss"] = ct_global
            if cfg.use_time_match and mtc_rng is not None:
                out["ct_time_loss"] = cfg.ct_time_loss_weight * mtc_loss(
                    out["video_local_feat"],
                    out["text_local_feat"],
                    mtc_rng,
                    cfg.num_key,
                    cfg.num_value,
                    cfg.num_other_neg,
                    cfg.time_temp,
                )
            else:
                out["ct_time_loss"] = jnp.zeros(())
            out["loss"] = out["ct_global_loss"] + out["ct_time_loss"]
            return out

        # ---- stage 2: fusion ----
        video_tokens = self.video_token_pos(video_stage1_embd)  # [B, N, P, C]
        video_tokens = video_tokens.reshape(B, -1, video_tokens.shape[-1])
        video_tokens, vtm_labels = self.shuffle_embd_for_vtm(video_tokens)

        fusion_mask = jnp.concatenate(
            [global_mask, jnp.ones((B, video_tokens.shape[1]), global_mask.dtype)], axis=1
        )
        fusion_input = jnp.concatenate([text_global_embd, video_tokens], axis=1)
        fusion_output = self.text_encoder(
            inputs_embeds=fusion_input,
            attention_mask=fusion_mask,
            stage=2,
            deterministic=deterministic,
        )

        mlm_logits = self.cls(fusion_output[:, : 1 + M * L])
        vtm_logits = self.seq_relationship(self.text_encoder.pool(fusion_output))
        out["vtm_logits"] = vtm_logits
        out["mlm_logits"] = mlm_logits

        if mlm_labels is not None:
            # CLS position is never masked; MLM computed on the positive
            # (un-rolled) half of the VTM batch only (ref text_encoder.py:88-92)
            full_labels = jnp.concatenate(
                [jnp.full((B, 1), -100, mlm_labels.dtype), mlm_labels], axis=1
            )
            pos_half = slice(B // 2, None)
            out["mlm_loss"] = cfg.mlm_loss_weight * masked_lm_loss(
                mlm_logits[pos_half], full_labels[pos_half]
            )
            # acc over the same positive half as the loss: the rolled half has
            # mismatched video context, so scoring it would deflate the metric
            mask_sel = full_labels[pos_half] != -100
            correct = (
                jnp.argmax(mlm_logits[pos_half], -1) == full_labels[pos_half]
            ) & mask_sel
            out["mlm_acc"] = jnp.sum(correct) / jnp.maximum(jnp.sum(mask_sel), 1)
        else:
            out["mlm_loss"] = jnp.zeros(())
            out["mlm_acc"] = jnp.zeros(())

        vtm_logits_f32 = vtm_logits.astype(jnp.float32)
        logz = jax.nn.logsumexp(vtm_logits_f32, axis=-1)
        gold = jnp.take_along_axis(vtm_logits_f32, vtm_labels[:, None], axis=-1)[:, 0]
        out["vtm_loss"] = cfg.vtm_loss_weight * jnp.mean(logz - gold)
        out["vtm_acc"] = jnp.mean((jnp.argmax(vtm_logits, -1) == vtm_labels).astype(jnp.float32))
        out["loss"] = out["mlm_loss"] + out["vtm_loss"]
        return out
