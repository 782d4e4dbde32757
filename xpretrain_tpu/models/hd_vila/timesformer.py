"""Feature-level TimeSformer (flax): divided space-time attention.

TPU-native re-design of ``hd-vila/src/modeling/timesformer.py:150-525``:
operates on CNN feature maps (no patch conv — input is [B, T, C, H, W]
ResNet features, ref ``:481-484``); each block runs temporal attention over
``(b h w) t`` then spatial attention over ``(b t) (h w)`` (ref ``:206-226``),
with ``temporal_fc`` zero-initialized in all but the first block for a
stable start (ref ``:458-466``); spatial/temporal position embeddings are
bilinearly/linearly interpolated at mismatched sizes (ref ``:486-511``).

The token layout is kept 4-D ([B, HW, T, C] / [B, T, HW, C]) between the two
attentions instead of the reference's flattened ``b (h w t) m`` with einops
round-trips — pure transposes XLA folds into the attention einsums.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _interp_1d(emb: Array, target: int) -> Array:
    """[1, T0, C] -> [1, T, C] linear, align_corners=False."""
    src = emb.shape[1]
    if src == target:
        return emb
    x = jnp.clip((jnp.arange(target) + 0.5) * src / target - 0.5, 0, src - 1)
    lo = jnp.floor(x).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src - 1)
    w = (x - lo)[None, :, None]
    return emb[:, lo] * (1 - w) + emb[:, hi] * w


def _interp_2d(emb: Array, src_hw: tuple[int, int], dst_hw: tuple[int, int]) -> Array:
    """[1, H0*W0, C] -> [1, H*W, C] bilinear, align_corners=False."""
    if src_hw == dst_hw:
        return emb
    h0, w0 = src_hw
    h1, w1 = dst_hw
    grid = emb.reshape(1, h0, w0, -1)

    def axis_interp(g, src, dst, axis):
        x = jnp.clip((jnp.arange(dst) + 0.5) * src / dst - 0.5, 0, src - 1)
        lo = jnp.floor(x).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, src - 1)
        w = x - lo
        shape = [1, 1, 1, 1]
        shape[axis] = dst
        w = w.reshape(shape)
        return jnp.take(g, lo, axis=axis) * (1 - w) + jnp.take(g, hi, axis=axis) * w

    grid = axis_interp(grid, h0, h1, 1)
    grid = axis_interp(grid, w0, w1, 2)
    return grid.reshape(1, h1 * w1, -1)


class _MHA(nn.Module):
    """timm-style fused-qkv attention (checkpoint layout ``qkv``/``proj``)."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [..., N, C]
        h = self.num_heads
        d = self.dim // h
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(*x.shape[:-1], 3, h, d)
        q, k, v = jnp.moveaxis(qkv, -3, 0)
        q = jnp.swapaxes(q, -3, -2)  # [..., h, N, d]
        k = jnp.swapaxes(k, -3, -2)
        v = jnp.swapaxes(v, -3, -2)
        scores = jnp.einsum("...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32)
        weights = jax.nn.softmax(scores * (d**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("...qk,...kd->...qd", weights, v)
        out = jnp.swapaxes(out, -3, -2).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class DividedBlock(nn.Module):
    """Divided space-time block (ref ``Block.forward`` ``:206-226``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    zero_init_temporal_fc: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [B, T, HW, C]
        B, T, HW, C = x.shape
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)

        # temporal: attend over T for each spatial location
        xt = x.transpose(0, 2, 1, 3)  # [B, HW, T, C]
        res_t = _MHA(self.dim, self.num_heads, dtype=self.dtype, name="temporal_attn")(
            ln("temporal_norm1")(xt)
        )
        res_t = res_t.transpose(0, 2, 1, 3)
        fc_init = nn.initializers.zeros if self.zero_init_temporal_fc else None
        temporal_fc = nn.Dense(
            self.dim,
            dtype=self.dtype,
            name="temporal_fc",
            kernel_init=fc_init or nn.initializers.lecun_normal(),
            bias_init=nn.initializers.zeros,
        )
        xt_out = x + temporal_fc(res_t)

        # spatial: attend over HW for each frame
        res_s = _MHA(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            ln("norm1")(xt_out)
        )
        x = xt_out + res_s

        y = ln("norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    depth: int = 4
    num_frames: int = 7
    H: int = 10
    W: int = 16
    embed_dim: int = 768
    num_heads: int = 16
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    remat: bool = False  # per-block rematerialization (see ResNet.remat)


class TimeSformer(nn.Module):
    """Feature-level divided space-time transformer (ref ``:420-525``)."""

    config: TimeSformerConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        """x: [B, T, C, H, W] -> [B, T, C, H, W]."""
        cfg = self.config
        B, T, C, H, W = x.shape
        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02), (1, cfg.H * cfg.W, C), jnp.float32
        )
        time_embed = self.param(
            "time_embed", nn.initializers.zeros, (1, cfg.num_frames, C), jnp.float32
        )

        x = x.transpose(0, 1, 3, 4, 2).reshape(B, T, H * W, C)
        pos = _interp_2d(pos_embed, (cfg.H, cfg.W), (H, W))
        x = x + pos[None].astype(x.dtype)
        tim = _interp_1d(time_embed, T)  # [1, T, C]
        x = x + tim[:, :, None, :].astype(x.dtype)  # broadcast over spatial axis

        block_cls = nn.remat(DividedBlock) if cfg.remat else DividedBlock
        for i in range(cfg.depth):
            x = block_cls(
                C,
                cfg.num_heads,
                cfg.mlp_ratio,
                zero_init_temporal_fc=(i > 0),
                dtype=cfg.dtype,
                name=f"blocks_{i}",
            )(x)
        # note: the reference declares a final LayerNorm but never applies it
        # (ref timesformer.py:514-527) — faithfully omitted here
        return x.reshape(B, T, H, W, C).transpose(0, 1, 4, 2, 3)
