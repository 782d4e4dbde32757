"""LF-VILA downstream task models (flax).

TPU-native re-design of the reference task wrappers:

- :class:`LfVilaRetrieval` — stage-1-only dual encoder for paragraph→video
  retrieval fine-tune (``LF-VILA/src/models/lfvila_retrieval.py:19-109``).
- :class:`LfVilaQAMultichoice` — per-choice fusion QA with a frame-level
  span classifier (``lfvila_qa_multichoice.py:17-109`` +
  ``text_encoder.py:125-237``).
- :class:`LfVilaQAClassification` — open-ended QA as classification with
  label smoothing (``lfvila_qa_classification.py`` +
  ``text_encoder.py:239-324``).
- :class:`LfVilaVideoClassification` — video-only classification
  (``lfvila_video_classification.py:16-68``).

All share the pretrain model's encoders and helpers; the contrastive
retrieval loss sees the pjit-global batch (SyncFunction equivalent).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from xpretrain_tpu.models.bert import BertMLMHead, BertPooler, StagedBertModel
from xpretrain_tpu.models.clip_vip.model import l2_normalize
from xpretrain_tpu.models.lf_vila.pretrain import (
    LfVilaConfig,
    SentEmbedding,
    VideoTokenPos,
)
from xpretrain_tpu.models.lf_vila.swin3d import SwinTransformer3D
from xpretrain_tpu.ops.losses import label_smoothing_xent, nce_loss

Array = jax.Array


class _LfVilaBase(nn.Module):
    """Shared encoders + the MaxPool(2,3) video downsample helper."""

    config: LfVilaConfig

    def setup(self) -> None:
        cfg = self.config
        self.video_encoder = SwinTransformer3D(cfg.video)
        self.text_encoder = StagedBertModel(cfg.bert, dtype=cfg.dtype, with_pooler=True)
        self.sent_embedding = SentEmbedding(cfg.bert, dtype=cfg.dtype)

    def downsample_video_embd(self, video_embd: Array) -> tuple[Array, Array]:
        cfg = self.config
        B, N, H, W, C = video_embd.shape
        x = video_embd.reshape(B * N, H, W, C)
        x = nn.max_pool(x, window_shape=(2, 3), strides=(1, 1))
        x = x.reshape(B, N, -1, C)
        clips = x.reshape(B, cfg.sample_clip, N // cfg.sample_clip, -1, C).mean(axis=(2, 3))
        return clips, x

    def encode_text_global(
        self, text_ids: Array, attention_mask: Array, deterministic: bool = True
    ) -> tuple[Array, Array]:
        """Per-sentence stage-0 -> SentEmbedding -> mean-CLS prepend -> stage-1.

        -> (global hidden [B, 1+M*L, C], global mask [B, 1+M*L]).
        """
        B, M, L = text_ids.shape
        local = self.text_encoder(
            text_ids.reshape(B * M, L),
            attention_mask=attention_mask.reshape(B * M, L),
            stage=0,
            deterministic=deterministic,
        ).reshape(B, M, L, -1)
        seg_ids = jnp.repeat(jnp.arange(M), L)[None].repeat(B, axis=0)
        stream = self.sent_embedding(local.reshape(B, M * L, -1), seg_ids, deterministic)
        cls = stream.reshape(B, M, L, -1)[:, :, 0, :].mean(axis=1)
        hidden = jnp.concatenate([cls[:, None], stream], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((B, 1), attention_mask.dtype), attention_mask.reshape(B, M * L)], axis=1
        )
        hidden = self.text_encoder(
            inputs_embeds=hidden, attention_mask=mask, stage=1, deterministic=deterministic
        )
        return hidden, mask


class LfVilaRetrieval(_LfVilaBase):
    """Stage-1 dual encoder with InfoNCE (ref ``lfvila_retrieval.py``)."""

    def setup(self) -> None:
        super().setup()
        hidden = self.config.bert.hidden_size
        self.video_global_proj = nn.Dense(hidden, dtype=self.config.dtype)
        self.text_global_proj = nn.Dense(hidden, dtype=self.config.dtype)

    def __call__(
        self,
        video_frames: Array,  # [B, C, N, H, W]
        text_ids: Array,  # [B, M, L]
        attention_mask: Array,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        cfg = self.config
        video_global_embd, _ = self.video_encoder(video_frames, deterministic=deterministic)
        clips, _ = self.downsample_video_embd(video_global_embd)
        text_hidden, _ = self.encode_text_global(text_ids, attention_mask, deterministic)
        video_feat = l2_normalize(self.video_global_proj(clips.mean(axis=1)))
        text_feat = l2_normalize(self.text_global_proj(text_hidden[:, 0]))
        loss = cfg.ct_global_loss_weight * nce_loss(video_feat, text_feat, cfg.temp)
        return {
            "video_global_feat": video_feat,
            "text_global_feat": text_feat,
            "ct_global_loss": loss,
            "loss": loss,
        }

    def forward_video(self, video_frames: Array) -> Array:
        """Video tower alone: [B, C, N, H, W] -> L2-normalized [B, hidden].

        The serving-export surface (``serving/artifact.py``) — identical math
        to the video half of ``__call__``."""
        video_global_embd, _ = self.video_encoder(video_frames, deterministic=True)
        clips, _ = self.downsample_video_embd(video_global_embd)
        return l2_normalize(self.video_global_proj(clips.mean(axis=1)))

    def forward_text(self, text_ids: Array, attention_mask: Array) -> Array:
        """Text tower alone: [B, M, L] ids + mask -> L2-normalized [B, hidden]."""
        text_hidden, _ = self.encode_text_global(text_ids, attention_mask, True)
        return l2_normalize(self.text_global_proj(text_hidden[:, 0]))


class LfVilaQAMultichoice(_LfVilaBase):
    """Per-choice fusion + span classifier (ref ``lfvila_qa_multichoice.py``)."""

    def setup(self) -> None:
        super().setup()
        cfg = self.config
        self.video_token_pos = VideoTokenPos(
            cfg.final_num_patches, cfg.sample_frame, cfg.bert.hidden_size, dtype=cfg.dtype
        )
        self.classifier = nn.Dense(1, dtype=cfg.dtype)
        self.span_classifier = nn.Dense(2, dtype=cfg.dtype)
        self.dropout = nn.Dropout(cfg.bert.hidden_dropout_prob)

    def __call__(
        self,
        video_frames: Array,  # [B, C, N, H, W]
        text_ids: Array,  # [B, n_choice, M, L]
        attention_mask: Array,
        labels: Optional[Array] = None,
        span_labels: Optional[Array] = None,
        span_label_weights: Optional[Array] = None,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        cfg = self.config
        N = video_frames.shape[2]
        video_global_embd, _ = self.video_encoder(video_frames, deterministic=deterministic)
        _, video_stage1_embd = self.downsample_video_embd(video_global_embd)

        B, n_choice, M, L = text_ids.shape
        text_hidden, text_mask = self.encode_text_global(
            text_ids.reshape(B * n_choice, M, L),
            attention_mask.reshape(B * n_choice, M, L),
            deterministic,
        )  # [B*n_choice, 1+M*L, C]

        video_tokens = self.video_token_pos(video_stage1_embd)
        video_tokens = video_tokens.reshape(B, -1, video_tokens.shape[-1])
        video_rep = jnp.repeat(video_tokens, n_choice, axis=0)  # per choice
        fusion = jnp.concatenate([text_hidden, video_rep], axis=1)
        mask = jnp.concatenate(
            [text_mask, jnp.ones(video_rep.shape[:2], text_mask.dtype)], axis=1
        )
        fusion = self.text_encoder(
            inputs_embeds=fusion, attention_mask=mask, stage=2, deterministic=deterministic
        )

        # span prediction over per-frame mean of the final patch tokens
        P = cfg.final_num_patches
        vid_out = fusion[:, -N * P :].reshape(-1, N, P, fusion.shape[-1]).mean(axis=2)
        span_pred = self.span_classifier(vid_out).reshape(B, n_choice, N, 2)
        span_pred = span_pred.max(axis=1)  # [B, N, 2]

        pooled = self.text_encoder.pool(fusion)
        pooled = self.dropout(pooled, deterministic=deterministic)
        logits = self.classifier(pooled).reshape(B, n_choice)

        out = {"logits": logits, "span_prediction": span_pred}
        if labels is not None:
            logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
            gold = jnp.take_along_axis(logits.astype(jnp.float32), labels[:, None], axis=-1)[:, 0]
            out["loss"] = jnp.mean(logz - gold)
            out["acc"] = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        if span_labels is not None:
            flat = span_pred.reshape(-1, 2).astype(jnp.float32)
            lbl = span_labels.reshape(-1)
            logz = jax.nn.logsumexp(flat, axis=-1)
            gold = jnp.take_along_axis(flat, lbl[:, None], axis=-1)[:, 0]
            per = logz - gold
            weights = span_label_weights.reshape(-1) if span_label_weights is not None else 1.0
            out["span_loss"] = jnp.mean(per * weights)
            out["span_acc"] = jnp.mean((jnp.argmax(flat, -1) == lbl).astype(jnp.float32))
        return out


class LfVilaQAClassification(_LfVilaBase):
    """Open-ended QA as classification with label smoothing."""

    num_labels: int = 1000
    label_smoothing: float = 0.1

    def setup(self) -> None:
        super().setup()
        cfg = self.config
        self.video_token_pos = VideoTokenPos(
            cfg.final_num_patches, cfg.sample_frame, cfg.bert.hidden_size, dtype=cfg.dtype
        )
        self.classifier = nn.Dense(self.num_labels, dtype=cfg.dtype)
        self.dropout = nn.Dropout(cfg.bert.hidden_dropout_prob)

    def __call__(
        self,
        video_frames: Array,
        text_ids: Array,  # [B, M, L]
        attention_mask: Array,
        labels: Optional[Array] = None,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        video_global_embd, _ = self.video_encoder(video_frames, deterministic=deterministic)
        _, video_stage1_embd = self.downsample_video_embd(video_global_embd)
        text_hidden, text_mask = self.encode_text_global(text_ids, attention_mask, deterministic)
        video_tokens = self.video_token_pos(video_stage1_embd)
        B = video_tokens.shape[0]
        video_tokens = video_tokens.reshape(B, -1, video_tokens.shape[-1])
        fusion = jnp.concatenate([text_hidden, video_tokens], axis=1)
        mask = jnp.concatenate(
            [text_mask, jnp.ones(video_tokens.shape[:2], text_mask.dtype)], axis=1
        )
        fusion = self.text_encoder(
            inputs_embeds=fusion, attention_mask=mask, stage=2, deterministic=deterministic
        )
        pooled = self.dropout(self.text_encoder.pool(fusion), deterministic=deterministic)
        logits = self.classifier(pooled)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = label_smoothing_xent(logits, labels, self.label_smoothing)
            out["acc"] = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return out


class LfVilaVideoClassification(nn.Module):
    """Video-only classification (COIN/LVU, ref ``lfvila_video_classification.py``)."""

    config: LfVilaConfig
    num_labels: int = 180

    def setup(self) -> None:
        cfg = self.config
        self.video_encoder = SwinTransformer3D(cfg.video)
        hidden = cfg.bert.hidden_size
        self.video_global_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.video_frame_proj = nn.Dense(hidden, dtype=cfg.dtype)
        self.classifier = nn.Dense(self.num_labels, dtype=cfg.dtype)

    def __call__(
        self, video_frames: Array, labels: Optional[Array] = None, deterministic: bool = True
    ) -> dict[str, Array]:
        video_global_embd, _ = self.video_encoder(video_frames, deterministic=deterministic)
        B, N, H, W, C = video_global_embd.shape
        x = video_global_embd.reshape(B * N, H, W, C)
        x = nn.max_pool(x, window_shape=(2, 3), strides=(1, 1))
        x = x.reshape(B, N, -1, C)
        video_feat = x.mean(axis=(1, 2))
        frame_feat = x.mean(axis=2)
        video_feat = l2_normalize(self.video_global_proj(video_feat))
        frame_feat = l2_normalize(self.video_frame_proj(frame_feat))
        logits = self.classifier(video_feat)
        out = {
            "video_global_feat": video_feat,
            "video_frame_feat": frame_feat,
            "logits": logits,
        }
        if labels is not None:
            logits32 = logits.astype(jnp.float32)
            logz = jax.nn.logsumexp(logits32, axis=-1)
            gold = jnp.take_along_axis(logits32, labels[:, None], axis=-1)[:, 0]
            out["loss"] = jnp.mean(logz - gold)
            out["acc"] = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return out
