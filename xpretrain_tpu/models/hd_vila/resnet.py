"""ResNet backbone (flax) with stage-partial forwards and frozen BN.

Capability parity with the mmdetection ResNet the reference vendors
(``hd-vila/src/modeling/resnet_mmdetection.py:398-805``): depths
18/34/50/101/152, ``out_indices`` multi-stage outputs, and the
stage-partial forwards HD-VILA's hybrid pipeline uses
(``forward_to_stage`` ``:746-761``, ``forward_stage_out`` ``:763-780``,
``forward_in_stage`` ``:782-793``).

BatchNorm is implemented as a frozen affine transform over stored running
statistics — the reference always runs with ``norm_eval=True``
(``:473, 795-804``), so batch statistics are never updated; on TPU this
folds into the convolution at compile time. Stage freezing is an optimizer
concern here (see ``optim.optimizer.param_group_labels``), not module state.

Param naming mirrors the torchvision/mmdet checkpoint layout
(``layer{1-4}_{b}_conv{1-3}`` etc.) so the converter is a renaming.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BN with fixed running stats (the ``norm_eval=True`` behavior)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x * inv.astype(x.dtype)) + (bias - mean * inv).astype(x.dtype)


def _conv(features: int, kernel: int, stride: int = 1, name: str | None = None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = _conv(self.planes, 3, self.stride, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2", dtype=self.dtype)(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, "downsample_conv", self.dtype)(x)
            identity = FrozenBatchNorm(self.planes, name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        # pytorch-style: stride on the 3x3
        out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, "conv3", self.dtype)(out)
        out = FrozenBatchNorm(self.planes * self.expansion, name="bn3", dtype=self.dtype)(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, "downsample_conv", self.dtype)(x)
            identity = FrozenBatchNorm(
                self.planes * self.expansion, name="downsample_bn", dtype=self.dtype
            )(identity)
        return nn.relu(out + identity)


class StemConv(nn.Module):
    """The 7×7/s2 stem conv, optionally computed as a space-to-depth
    4×4/s1 conv (the MLPerf-ResNet TPU stem transform).

    The parameter stays the reference-layout ``(7,7,in,64)`` kernel (so
    checkpoints and the converter are unchanged); in s2d mode the kernel is
    zero-padded to 8×8 and re-blocked at forward time (64·192 floats —
    negligible), and the input is 2×2 space-to-depth'd so the MXU sees 12
    input channels instead of 3. Bit-identical to the direct conv (see
    tests/test_hdvila_encoder.py::test_s2d_stem_equivalence).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:  # x: NHWC
        in_c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, in_c, self.features),
            jnp.float32,
        )
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        B, H, W, C = x.shape
        # out[i,j] = Σ w7[di,dj]·x[2i+di−3, 2j+dj−3].  Pad the kernel to 8×8
        # with a zero leading row/col (w8[d]=w7[d−1]) and the input by
        # (4 left, 2 right) so indices align to 2×2 blocks, then contract the
        # block parity into channels: a 4×4 VALID conv over [H/2, W/2, 4C].
        w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w = w8.reshape(4, 2, 4, 2, in_c, self.features)
        w = w.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * in_c, self.features)
        x = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        Hp, Wp = x.shape[1], x.shape[2]
        x = x.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp // 2, Wp // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )


class ResNet(nn.Module):
    """Input NCHW (reference convention); internally NHWC for TPU convs."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_channels: int = 64
    dtype: jnp.dtype = jnp.float32
    # per-block rematerialization, the TPU analogue of the reference's
    # ``with_cp`` torch.utils.checkpoint option (resnet_mmdetection.py:182-183)
    remat: bool = False
    # compute the 7×7/s2 stem as a space-to-depth 4×4/s1 conv (same params,
    # same output; raises the stem's MXU occupancy on 3-channel inputs)
    s2d_stem: bool = False

    def setup(self) -> None:
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        self._block_type = block_type
        blocks = []
        for stage_idx, n_blocks in enumerate(stage_blocks):
            planes = self.base_channels * 2**stage_idx
            stage = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage_idx > 0) else 1
                expansion = 4 if block_type == "bottleneck" else 1
                needs_down = b == 0 and (stride != 1 or stage_idx > 0 or expansion != 1)
                cls = Bottleneck if block_type == "bottleneck" else BasicBlock
                if self.remat:
                    cls = nn.remat(cls)
                stage.append(
                    cls(
                        planes,
                        stride,
                        needs_down,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{b}",
                    )
                )
            blocks.append(stage)
        self.stages = blocks
        self.conv1 = StemConv(
            self.base_channels, dtype=self.dtype, s2d=self.s2d_stem, name="conv1"
        )
        self.bn1 = FrozenBatchNorm(self.base_channels, name="bn1", dtype=self.dtype)

    def _stem(self, x: Array) -> Array:
        x = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
        x = self.conv1(x)
        x = nn.relu(self.bn1(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    def _run_stage(self, x: Array, stage_idx: int) -> Array:
        for block in self.stages[stage_idx]:
            x = block(x)
        return x

    def __call__(self, x: Array) -> tuple[Array, ...]:
        """-> tuple of NCHW stage features at ``out_indices``."""
        x = self._stem(x)
        outs = []
        for i in range(len(self.stages)):
            x = self._run_stage(x, i)
            if i in self.out_indices:
                outs.append(x.transpose(0, 3, 1, 2))
        return tuple(outs)

    def forward_to_stage(self, x: Array, stage: int = 2) -> Array:
        """Run stem + stages [0, stage]; single NCHW output (ref ``:746-761``)."""
        x = self._stem(x)
        for i in range(stage + 1):
            x = self._run_stage(x, i)
        return x.transpose(0, 3, 1, 2)

    def forward_stage_out(self, x: Array, stage: int = 0) -> tuple[Array, tuple[Array, ...]]:
        """-> (shallow stem feature, outputs up to ``stage``) (ref ``:763-780``)."""
        x = self._stem(x)
        shallow = x.transpose(0, 3, 1, 2)
        outs = []
        for i in range(stage + 1):
            x = self._run_stage(x, i)
            if i in self.out_indices:
                outs.append(x.transpose(0, 3, 1, 2))
        return shallow, tuple(outs)

    def forward_in_stage(self, x: Array, stage: int = 0) -> tuple[Array, ...]:
        """Continue from a mid-network feature through stages > ``stage``
        (ref ``:782-793``)."""
        x = x.transpose(0, 2, 3, 1)
        outs = []
        for i in range(len(self.stages)):
            if i <= stage:
                continue
            x = self._run_stage(x, i)
            if i in self.out_indices:
                outs.append(x.transpose(0, 3, 1, 2))
        return tuple(outs)
