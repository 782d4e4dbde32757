"""HD-VILA hybrid high-res/low-res end-to-end encoder (flax).

TPU-native re-design of ``hd-vila/src/modeling/e2e_model.py:16-216``:
one full-resolution middle frame per clip through a ResNet-50; the T−1
low-res neighbor frames through a second ResNet up to stage 3; divided
space-time TimeSformer over the concatenated temporal sequence (middle
inserted centrally); high-res spatial + temporal branches fused by a 1×1
conv (``extract_features`` ``:111-141``).

Normalization (ImageNet mean/std on 0-255 inputs, ref ``:26-27, 103-109``)
happens on device in the forward — the ingest path uploads uint8 frames and
the normalize folds into the first convolution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from xpretrain_tpu.models.hd_vila.resnet import ResNet
from xpretrain_tpu.models.hd_vila.timesformer import TimeSformer, TimeSformerConfig

Array = jax.Array

IMAGENET_MEAN_255 = (123.675, 116.28, 103.53)
IMAGENET_STD_255 = (58.395, 57.12, 57.375)


@dataclasses.dataclass(frozen=True)
class HdVilaEncoderConfig:
    resnet_depth: int = 50
    hidden_size: int = 768
    backbone_channel_in_size: int = 2048  # ResNet-50 stage-4 channels
    backbone_stage3_channels: int = 1024
    timesformer_depth: int = 4
    timesformer_heads: int = 16
    timesformer_frames: int = 7
    timesformer_hw: tuple = (10, 16)
    dtype: Any = jnp.float32
    # rematerialize ResNet/TimeSformer blocks in backward (the reference's
    # ``with_cp`` option); needed to fit the reference per-chip batch (16)
    # of the stage-1/2 train steps in one v5e's 16 GB HBM
    remat: bool = False
    # space-to-depth stem for both ResNets (same ``conv1/kernel`` params,
    # bit-equivalent output; raises stem MXU occupancy — see resnet.StemConv)
    s2d_stem: bool = False

    @staticmethod
    def tiny(**overrides) -> "HdVilaEncoderConfig":
        base = dict(
            resnet_depth=18,
            hidden_size=64,
            backbone_channel_in_size=512,
            backbone_stage3_channels=256,
            timesformer_depth=1,
            timesformer_heads=4,
        )
        base.update(overrides)
        return HdVilaEncoderConfig(**base)


class HdVilaEncoder(nn.Module):
    config: HdVilaEncoderConfig

    def setup(self) -> None:
        cfg = self.config
        self.cnn = ResNet(
            depth=cfg.resnet_depth, dtype=cfg.dtype, remat=cfg.remat,
            s2d_stem=cfg.s2d_stem,
        )
        self.cnn_low = ResNet(
            depth=cfg.resnet_depth, dtype=cfg.dtype, remat=cfg.remat,
            s2d_stem=cfg.s2d_stem,
        )
        conv1x1 = lambda feats, name: nn.Conv(
            feats, (1, 1), use_bias=False, dtype=cfg.dtype, name=name
        )
        self.grid_encoder_conv = conv1x1(cfg.hidden_size, "grid_encoder_conv")
        self.grid_encoder_low_conv = conv1x1(cfg.hidden_size, "grid_encoder_low_conv")
        self.grid_encoder_combine_conv = conv1x1(cfg.hidden_size, "grid_encoder_combine_conv")
        self.timesformer = TimeSformer(
            TimeSformerConfig(
                depth=cfg.timesformer_depth,
                num_frames=cfg.timesformer_frames,
                H=cfg.timesformer_hw[0],
                W=cfg.timesformer_hw[1],
                embed_dim=cfg.hidden_size,
                num_heads=cfg.timesformer_heads,
                dtype=cfg.dtype,
                remat=cfg.remat,
            )
        )

    # ---- helpers ---------------------------------------------------------

    def normalize(self, images: Array) -> Array:
        mean = jnp.asarray(IMAGENET_MEAN_255, images.dtype).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD_255, images.dtype).reshape(1, 3, 1, 1)
        return (images - mean) / std

    def _grid_encoder(self, x: Array) -> Array:
        """1×1 conv + 2×2 maxpool + GELU on NCHW stage-4 features."""
        x = x.transpose(0, 2, 3, 1)
        x = self.grid_encoder_conv(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.gelu(x, approximate=False).transpose(0, 3, 1, 2)

    def _grid_encoder_low(self, x: Array) -> Array:
        x = x.transpose(0, 2, 3, 1)
        x = nn.gelu(self.grid_encoder_low_conv(x), approximate=False)
        return x.transpose(0, 3, 1, 2)

    def _combine(self, x: Array) -> Array:
        x = x.transpose(0, 2, 3, 1)
        return nn.gelu(self.grid_encoder_combine_conv(x), approximate=False).transpose(0, 3, 1, 2)

    @staticmethod
    def _downsample_quarter(x: Array) -> Array:
        """F.interpolate(scale_factor=1/4) equivalent: nearest with the
        torch 'nearest' index rule floor(i * 4)."""
        return x[:, :, ::4, ::4]

    # ---- forward ---------------------------------------------------------

    def extract_features(
        self, img_middle: Optional[Array], img_other: Optional[Array]
    ) -> tuple[tuple[Array, ...], Array]:
        """img_middle: [B, clips, 3, H, W]; img_other: [B, clips, T-1, 3, H/4, W/4].

        Returns (stage_features of the middle frame, fused grid [B*clips,
        hidden, H/64, W/64]).
        """
        if img_middle is None:
            return self._extract_other_only(img_other)
        if img_other is None:
            return self._extract_middle_only(img_middle)
        b, clips, c, h, w = img_middle.shape
        frm = img_other.shape[2] + 1
        middle = self.normalize(img_middle.reshape(-1, c, h, w))
        other = self.normalize(img_other.reshape(-1, c, *img_other.shape[-2:]))

        stage_features = self.cnn(middle)
        grid_hi = self._grid_encoder(stage_features[-1])
        mid3 = self._downsample_quarter(stage_features[-2])
        mid3 = self._grid_encoder_low(mid3)

        other = self.cnn_low.forward_to_stage(other, stage=2)
        other = self._grid_encoder_low(other)

        mid3 = mid3[:, None]  # [B*clips, 1, C, H', W']
        other = other.reshape(b * clips, frm - 1, *other.shape[1:])
        half = frm // 2
        temporal = jnp.concatenate([other[:, :half], mid3, other[:, half:]], axis=1)
        temporal = self.timesformer(temporal)[:, half]

        fused = self._combine(jnp.concatenate([grid_hi, temporal], axis=1))
        return stage_features, fused

    def _extract_middle_only(self, img_middle: Array):
        b, clips, c, h, w = img_middle.shape
        middle = self.normalize(img_middle.reshape(-1, c, h, w))
        stage_features = self.cnn(middle)
        grid_hi = self._grid_encoder(stage_features[-1])
        mid3 = self._grid_encoder_low(self._downsample_quarter(stage_features[-2]))
        temporal = self.timesformer(mid3[:, None])[:, 0]
        fused = self._combine(jnp.concatenate([grid_hi, temporal], axis=1))
        return stage_features, fused

    def _extract_other_only(self, img_other: Array):
        b, clips, frm, c, h, w = img_other.shape
        other = self.normalize(img_other.reshape(-1, c, h, w))
        other = self.cnn_low.forward_to_stage(other, stage=2)
        other = self._grid_encoder_low(other)
        other = other.reshape(b * clips, frm, *other.shape[1:])
        temporal = self.timesformer(other)[:, frm // 2]
        return (), temporal

    def __call__(
        self, img_middle: Optional[Array], img_other: Optional[Array]
    ) -> Array:
        """-> visual grid [B, clips, 1, H', W', hidden] ready for the BERT
        fusion stage (the ``visual_features`` permute at ``e2e_model.py:80-86``)."""
        if img_middle is not None:
            b, clips = img_middle.shape[:2]
        else:
            b, clips = img_other.shape[:2]
        _, fused = self.extract_features(img_middle, img_other)
        c, h, w = fused.shape[-3:]
        fused = fused.reshape(b, clips, 1, c, h, w)
        return fused.transpose(0, 1, 2, 4, 5, 3)  # [B, clips, 1, H', W', C]
