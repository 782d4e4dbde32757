#!/usr/bin/env python
"""Microbench: Swin3D window-attention LAYOUT variants (r4 verdict #1).

The r4 measured counters put 36.5% of LF-VILA's device-busy time in zero-MXU
data movement (data-formatting copies 21.7% + loop fusions 14.8%,
PERF_MEASURED.md). The copies come from the per-block window
partition/reverse transposes and the qkv head-split transpose in
``models/lf_vila/swin3d.py``. This bench isolates ONE stage of SwinBlock3D
at the production stage-2 shape (the 14-block stage that dominates the
step) and A/Bs layout restructurings fwd+bwd before porting the winner:

- ``base``     — the library block as-is ([Bn,h,N,d] via transpose).
- ``eh``       — einsum-head layout: qkv stays [Bn,N,h,d]; the head
                 transpose folds into the dot_general ("bqhd,bkhd->bhqk").
- ``blocked``  — no partition transpose at all: x reshapes (free) to
                 [B,nt,wd,nh,wh,nw,ww,C] and the attention runs as one
                 8-D einsum with (B,nt,nh,nw,h) batch dims.
- ``fused``    — window partition via Pallas BlockSpec blocking: the kernel
                 grid tiles (b, nt, nh, nw) directly over the spatial array,
                 so partition/reverse never exist as HBM copies.

Run on the real chip:
    python tools/bench_swin_layout.py --variants base eh blocked [--remat]
Prints one JSON line per variant.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from xpretrain_tpu.models.lf_vila.swin3d import (  # noqa: E402
    SwinBlock3D,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
    _clip_window,
)

# production LF-VILA stage shapes (b=16 clips, 32f 192×320). The r5 trace
# attribution (PERF_MEASURED.md) put the worst-padded relayouts in stages
# 0-1 (qkv copies bf16[16384,30,3,4,32]: trailing (4,32) tiles to (8,128) =
# 8× physical traffic; stage-0 scores f32[·,4,30,30]: 30→128 lanes = 4.3×),
# so the bench is stage-parameterized (--stage).
STAGES = {
    # stage: (T, H, W, C, heads, window, depth)
    0: (32, 24, 40, 128, 4, (2, 3, 5), 2),
    1: (32, 12, 20, 256, 8, (4, 3, 5), 2),
    2: (32, 6, 10, 512, 16, (8, 3, 5), 14),
}
B = 16
T, H, W, C = 32, 6, 10, 512
HEADS, WINDOW, DEPTH = 16, (8, 3, 5), 14
MLP_RATIO = 4.0


def set_stage(stage: int) -> None:
    global T, H, W, C, HEADS, WINDOW, DEPTH
    T, H, W, C, HEADS, WINDOW, DEPTH = STAGES[stage]


def _bias_for(window, h, N, table):
    rel_idx = relative_position_index(window)[:N, :N]
    return table[rel_idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)


class AttnEH(nn.Module):
    """Einsum-head variant: no explicit [Bn,N,h,d]->[Bn,h,N,d] transpose."""

    dim: int
    window: tuple
    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        Bn, N, C_ = x.shape
        h = self.num_heads
        d = C_ // h
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="qkv")(x).reshape(Bn, N, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [Bn, N, h, d]
        bias = _bias_for(self.window, h, N, table)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d ** -0.5) + bias[None].astype(scores.dtype)
        if mask is not None:
            nW = mask.shape[0]
            scores = scores.reshape(Bn // nW, nW, h, N, N) + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(Bn, h, N, N)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(Bn, N, C_)
        return nn.Dense(C_, dtype=self.dtype, name="proj")(out)


class BlockEH(nn.Module):
    """SwinBlock3D with AttnEH (same pad/roll/partition skeleton)."""

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = shifted_window_mask((D_, H_, W_), window, shift)
        else:
            mask = None
        windows = window_partition(x, window)
        attn = AttnEH(self.dim, self.window, self.num_heads, dtype=self.dtype,
                      name="attn")(windows, mask, deterministic)
        x = window_reverse(attn, window, B_, D_, H_, W_)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=shift, axis=(1, 2, 3))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class BlockBlocked(nn.Module):
    """No partition/reverse transposes: 8-D einsum attention over the
    blocked reshape [B, nt, wd, nh, wh, nw, ww, C] (reshape is free; the
    relayouts — if any — happen inside dot_general where XLA can fuse)."""

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        wd, wh, ww = window
        h = self.num_heads
        d = C_ // h
        N = wd * wh * ww
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = shifted_window_mask((D_, H_, W_), window, shift)  # [nW, N, N]
        else:
            mask = None
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="attn_qkv")(x)
        # free reshape: split spatial dims into (n, w) blocks and heads
        qkv = qkv.reshape(B_, D_ // wd, wd, H_ // wh, wh, W_ // ww, ww, 3, h, d)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # scores over window tokens: batch dims (B, nt, nh, nw, head)
        scores = jnp.einsum("btahxwyne,btchzwune->bthwnaxyczu", q, k,
                            preferred_element_type=jnp.float32)
        # [B, nt, nh, nw, h, wd,wh,ww, wd,wh,ww] -> flatten window dims
        nt, nh, nw = D_ // wd, H_ // wh, W_ // ww
        scores = scores.reshape(B_, nt, nh, nw, h, N, N) * (d ** -0.5)
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("attn_relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        bias = _bias_for(self.window, h, N, table)  # [h, N, N]
        scores = scores + bias[None, None, None, None].astype(scores.dtype)
        if mask is not None:
            m = jnp.asarray(mask).reshape(nt, nh, nw, 1, N, N)
            scores = scores + m[None].astype(scores.dtype)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        w = w.reshape(B_, nt, nh, nw, h, wd, wh, ww, wd, wh, ww)
        out = jnp.einsum("bthwnaxyczu,btchzwune->btahxwyne", w, v)
        out = out.reshape(B_, D_, H_, W_, C_)
        out = nn.Dense(C_, dtype=self.dtype, name="attn_proj")(out)
        if any(s > 0 for s in shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        x = shortcut + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class BlockFold(nn.Module):
    """Single-relayout variant: qkv is computed BEFORE the window partition
    (dense is pointwise, so the partition transpose of x disappears), and the
    partition + head-split fold into ONE transpose of the qkv tensor
    ([B,nt,wd,nh,wh,nw,ww,3,h,d] -> [3,B·nW,h,N,d]). The attention dot stays
    in the canonical [Bn,h,N,d] layout the base variant measures fastest in;
    only the number of explicit relayouts changes (fwd: 3C vs base's C+3C;
    out: one transpose straight back to [B,D,H,W,C] vs head-merge+reverse)."""

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        wd, wh, ww = window
        h = self.num_heads
        d = C_ // h
        N = wd * wh * ww
        nt, nh, nw = D_ // wd, H_ // wh, W_ // ww
        nW = nt * nh * nw
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            mask = shifted_window_mask((D_, H_, W_), window, shift)
        else:
            mask = None
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="attn_qkv")(x)
        qkv = qkv.reshape(B_, nt, wd, nh, wh, nw, ww, 3, h, d)
        # ONE relayout: -> [3, B, nt, nh, nw, h, wd, wh, ww, d]
        qkv = qkv.transpose(7, 0, 1, 3, 5, 8, 2, 4, 6, 9)
        qkv = qkv.reshape(3, B_ * nW, h, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("attn_relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        bias = _bias_for(self.window, h, N, table)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d ** -0.5) + bias[None].astype(scores.dtype)
        if mask is not None:
            scores = scores.reshape(B_, nW, h, N, N) + jnp.asarray(mask)[None, :, None]
            scores = scores.reshape(B_ * nW, h, N, N)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        # ONE relayout back: [B,nt,nh,nw,h,wd,wh,ww,d] -> [B,D,H,W,C]
        out = out.reshape(B_, nt, nh, nw, h, wd, wh, ww, d)
        out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4, 8)
        out = out.reshape(B_, D_, H_, W_, C_)
        out = nn.Dense(C_, dtype=self.dtype, name="attn_proj")(out)
        if any(s > 0 for s in shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        x = shortcut + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


def _grouped_masks(dims, window, shift, G):
    """np [n_groups_per_image, G·N, G·N] additive mask: the per-window
    shifted-window masks on the diagonal blocks, −100 off-block (windows in
    a group must not attend each other). Window order in
    ``shifted_window_mask`` is (nt, nh, nw) flattened, so G consecutive
    windows share (nt, nh) — grouping along the W window axis."""
    D_, H_, W_ = dims
    wd, wh, ww = window
    N = wd * wh * ww
    nW = (D_ // wd) * (H_ // wh) * (W_ // ww)
    if any(s > 0 for s in shift):
        m = shifted_window_mask(dims, window, shift)
    else:
        m = np.zeros((nW, N, N), np.float32)
    m = m.reshape(nW // G, G, N, N)
    out = np.full((nW // G, G * N, G * N), -100.0, np.float32)
    for g in range(G):
        out[:, g * N : (g + 1) * N, g * N : (g + 1) * N] = m[:, g]
    return out


def _pick_group(nw: int, N: int, target: int = 128) -> int:
    """Largest divisor of ``nw`` with G·N ≤ target lanes."""
    g = 1
    for cand in range(1, nw + 1):
        if nw % cand == 0 and cand * N <= target:
            g = cand
    return g


class BlockGFoldT(nn.Module):
    """Grouped, d-major fold variant — the r5 trace-driven layout:

    1. qkv computed pointwise pre-partition (as in fold);
    2. ONE relayout straight into **d-major grouped** form
       [3, B·nW/G, h, d, G·N]: trailing dims (d=32, G·N≈120) tile near-
       losslessly vs base's [.., N, 3, h, d] whose (h, d)=(4,32)→(8,128)
       tiling moves 8× physical bytes at stage 0;
    3. G consecutive windows attend as ONE score matrix [h, GN, GN]
       (lane-aligned, vs N=30→128 = 4.3× pad) under a static block-diagonal
       mask — more MXU work per op, ~4× fewer padded bytes.
    """

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        wd, wh, ww = window
        h = self.num_heads
        d = C_ // h
        N = wd * wh * ww
        nt, nh, nw = D_ // wd, H_ // wh, W_ // ww
        G = _pick_group(nw, N)
        nw1 = nw // G
        GN = G * N
        ngroups = nt * nh * nw1
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
        gmask = _grouped_masks((D_, H_, W_), window, shift, G)  # [ngroups?, GN, GN]
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="attn_qkv")(x)
        qkv = qkv.reshape(B_, nt, wd, nh, wh, nw1, G, ww, 3, h, d)
        # ONE relayout -> [3, B, nt, nh, nw1, h, d, G, wd, wh, ww]
        qkv = qkv.transpose(8, 0, 1, 3, 5, 9, 10, 6, 2, 4, 7)
        qkv = qkv.reshape(3, B_ * ngroups, h, d, GN)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("attn_relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        bias = _bias_for(self.window, h, N, table)  # [h, N, N]
        # block-diagonal bias (off-blocks get −100 from gmask anyway)
        bias_bd = jnp.einsum("gk,hij->hgikj", jnp.eye(G, dtype=bias.dtype), bias)
        bias_bd = bias_bd.reshape(h, GN, GN)
        scores = jnp.einsum("bhdq,bhdk->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d ** -0.5) + bias_bd[None].astype(scores.dtype)
        scores = scores.reshape(B_, ngroups, h, GN, GN) + jnp.asarray(gmask)[None, :, None]
        scores = scores.reshape(B_ * ngroups, h, GN, GN)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhdk->bhdq", w, v)  # [Bg, h, d, GN]
        out = out.reshape(B_, nt, nh, nw1, h, d, G, wd, wh, ww)
        out = out.transpose(0, 1, 7, 2, 8, 3, 6, 9, 4, 5)
        out = out.reshape(B_, D_, H_, W_, C_)
        out = nn.Dense(C_, dtype=self.dtype, name="attn_proj")(out)
        if any(s > 0 for s in shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        x = shortcut + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class BlockGrouped(nn.Module):
    """Grouped scores WITHOUT the fold relayout: keep base's partition +
    head-split transposes (XLA handles them tolerably), but merge G
    consecutive windows into one attention via the FREE reshape
    [B·nW, N, C] -> [B·nW/G, G·N, C] (adjacent windows are contiguous in
    Bn) under a static block-diagonal mask. Fixes only the score-side
    padding (N=30 -> G·N=120 lanes) and raises the attention dot's MXU
    occupancy; qkv relayouts unchanged."""

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        wd, wh, ww = window
        h = self.num_heads
        d = C_ // h
        N = wd * wh * ww
        nw = W_ // ww
        G = _pick_group(nw, N)
        GN = G * N
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
        gmask = _grouped_masks((D_, H_, W_), window, shift, G)  # [ngroups, GN, GN]
        windows = window_partition(x, window)  # [B·nW, N, C]
        Bn = windows.shape[0]
        grouped = windows.reshape(Bn // G, GN, C_)  # FREE: windows contiguous
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="attn_qkv")(grouped)
        qkv = qkv.reshape(Bn // G, GN, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [Bg, h, GN, d]
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("attn_relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        bias = _bias_for(self.window, h, N, table)  # [h, N, N]
        bias_bd = jnp.einsum("gk,hij->hgikj", jnp.eye(G, dtype=bias.dtype), bias)
        bias_bd = bias_bd.reshape(h, GN, GN)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d ** -0.5) + bias_bd[None].astype(scores.dtype)
        ngroups = gmask.shape[0]
        scores = scores.reshape(B_, ngroups, h, GN, GN) + jnp.asarray(gmask)[None, :, None]
        scores = scores.reshape(Bn // G, h, GN, GN)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C_)
        out = nn.Dense(C_, dtype=self.dtype, name="attn_proj")(out)
        out = window_reverse(out, window, B_, D_, H_, W_)
        if any(s > 0 for s in shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        x = shortcut + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class BlockGDMajor(nn.Module):
    """Grouped + d-major head split: like BlockGrouped but the qkv relayout
    is the 5-D transpose [Bg,GN,3,h,d] -> [3,Bg,h,d,GN], so the materialized
    q/k/v trailing dims are (d=32, GN~120) — near-lossless tiling vs the
    (GN,d)=(120,32)->(120,128) 4x pad of the canonical layout. Scores
    contract the sublane dim ("bhdq,bhdk->bhqk" — the MXU-native K-major
    operand layout)."""

    dim: int
    num_heads: int
    window: tuple
    shift: tuple
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        B_, D_, H_, W_, C_ = x.shape
        window, shift = _clip_window((D_, H_, W_), self.window, self.shift)
        wd, wh, ww = window
        h = self.num_heads
        d = C_ // h
        N = wd * wh * ww
        nw = W_ // ww
        G = _pick_group(nw, N)
        GN = G * N
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
        gmask = _grouped_masks((D_, H_, W_), window, shift, G)
        windows = window_partition(x, window)
        Bn = windows.shape[0]
        grouped = windows.reshape(Bn // G, GN, C_)
        qkv = nn.Dense(3 * C_, dtype=self.dtype, name="attn_qkv")(grouped)
        qkv = qkv.reshape(Bn // G, GN, 3, h, d).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [Bg, h, d, GN]
        table_size = (2 * self.window[0] - 1) * (2 * self.window[1] - 1) * (2 * self.window[2] - 1)
        table = self.param("attn_relative_position_bias_table",
                           nn.initializers.truncated_normal(0.02), (table_size, h), jnp.float32)
        bias = _bias_for(self.window, h, N, table)
        bias_bd = jnp.einsum("gk,hij->hgikj", jnp.eye(G, dtype=bias.dtype), bias)
        bias_bd = bias_bd.reshape(h, GN, GN)
        scores = jnp.einsum("bhdq,bhdk->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores * (d ** -0.5) + bias_bd[None].astype(scores.dtype)
        ngroups = gmask.shape[0]
        scores = scores.reshape(B_, ngroups, h, GN, GN) + jnp.asarray(gmask)[None, :, None]
        scores = scores.reshape(Bn // G, h, GN, GN)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhdk->bhdq", w, v)  # [Bg, h, d, GN]
        out = out.transpose(0, 3, 1, 2).reshape(Bn, N, C_)
        out = nn.Dense(C_, dtype=self.dtype, name="attn_proj")(out)
        out = window_reverse(out, window, B_, D_, H_, W_)
        if any(s > 0 for s in shift):
            out = jnp.roll(out, shift=shift, axis=(1, 2, 3))
        x = shortcut + out
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * MLP_RATIO), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y


class Stage(nn.Module):
    """DEPTH blocks with alternating spatial shift, like a Swin stage."""

    block_cls: type
    remat: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic=True):
        shift = (0, WINDOW[1] // 2, WINDOW[2] // 2)
        cls = self.block_cls
        if self.remat:
            cls = nn.remat(cls, static_argnums=(1,))
        for b in range(DEPTH):
            blk_shift = (0, 0, 0) if b % 2 == 0 else shift
            x = cls(C, HEADS, WINDOW, blk_shift, dtype=self.dtype, name=f"b{b}")(
                x, deterministic)
        return x


def build(variant: str, remat: bool):
    if variant == "base":
        block_cls = SwinBlock3D
    elif variant == "eh":
        block_cls = BlockEH
    elif variant == "blocked":
        block_cls = BlockBlocked
    elif variant == "fold":
        block_cls = BlockFold
    elif variant == "gfoldt":
        block_cls = BlockGFoldT
    elif variant == "grouped":
        block_cls = BlockGrouped
    elif variant == "gdmajor":
        block_cls = BlockGDMajor
    else:
        raise SystemExit(f"unknown variant {variant}")
    return Stage(block_cls, remat=remat)


def bench_variant(variant: str, remat: bool, K: int, trace_dir: str = "") -> dict:
    model = build(variant, remat)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def run_k(params, x):
        def step(carry, _):
            def loss(p):
                return model.apply(p, carry).astype(jnp.float32).mean()

            l, g = jax.value_and_grad(loss)(params)
            # data-dependence: fold the loss back into the carry
            return carry + l.astype(carry.dtype) * 1e-9, l

        c, ls = jax.lax.scan(step, x, None, length=K)
        return ls[-1]

    float(run_k(params, x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run_k(params, x))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[2] / K
    if trace_dir:
        d = os.path.join(trace_dir, variant)
        os.makedirs(d, exist_ok=True)
        with jax.profiler.trace(d):
            float(run_k(params, x))
    try:
        an = run_k.lower(params, x).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        flops, nbytes = float(an.get("flops", 0)) / K, float(an.get("bytes accessed", 0)) / K
    except Exception:
        flops = nbytes = 0.0
    return {
        "variant": variant, "remat": remat, "ms": round(t * 1000, 2),
        "tflops_per_s": round(flops / t / 1e12, 1),
        "hbm_gbps": round(nbytes / t / 1e9, 1),
    }


def main():
    from tools.bench_report import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=["base", "eh", "blocked"])
    ap.add_argument("--stage", type=int, default=2, choices=sorted(STAGES))
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--trace_dir", default="")
    args = ap.parse_args()
    set_stage(args.stage)
    for v in args.variants:
        import gc

        gc.collect()
        jax.clear_caches()
        row = bench_variant(v, args.remat, args.k, args.trace_dir)
        row["stage"] = args.stage
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
