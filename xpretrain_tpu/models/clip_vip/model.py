"""CLIP-ViP in flax: proxy-token video attention over a CLIP dual-encoder.

TPU-native re-design of the reference model family
(``CLIP-ViP/src/modeling/CLIP_ViP.py``, ``VidCLIP.py``):

- Video patchify with temporal embeddings and M = 1 + ``add_cls_num`` video
  proxy tokens (ref ``CLIP_ViP.py:142-197``).
- **Proxy attention**: instead of full (M+N·L)² attention, each frame's L
  patch tokens attend to [M proxies ⊕ own frame], and the M proxies attend to
  everything (ref ``forward2`` ``CLIP_ViP.py:332-381``). Here both halves are
  batched 5-D einsums with static shapes — no bmm reshaping — so XLA tiles
  them straight onto the MXU; softmax accumulates fp32.
- CLIP text tower with causal masking and EOT-argmax pooling
  (ref ``CLIP_ViP.py:715-797``).
- Bias-free projections to a shared space, L2 normalization, learnable
  ``logit_scale`` (ref ``CLIP_ViP.py:953-1172``).
- The non-ViP baseline (frame-mean pooling of a vanilla CLIP, ref
  ``VidCLIP.py:55-65``) is ``vision_type="mean"``.

Params are fp32; ``dtype=bfloat16`` selects the TPU compute precision
(replacing apex fp16 O2). ``remat=True`` wraps each encoder layer in
``jax.checkpoint`` (the ``torch.utils.checkpoint`` equivalent, ref
``CLIP_ViP.py:676-690``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from xpretrain_tpu.models.common import (
    MultiHeadAttention,
    TransformerMLP,
    dot_attention,
    expand_padding_mask,
    make_causal_mask,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    attention_dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    hidden_act: str = "quick_gelu"
    attention_dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class VipConfig:
    """``vision_additional_config`` of the reference
    (``pretrain_vip_base_32.json:50-56``)."""

    type: str = "ViP"  # "ViP" -> proxy attention; "mean" -> frame-mean baseline
    temporal_size: int = 12
    if_use_temporal_embed: bool = True
    add_cls_num: int = 3
    logit_scale_init_value: float = 4.60
    # TPU kernel choice — mathematically identical results:
    #   "masked_full": ONE attention over the M+N·L sequence with a static
    #     block mask (patch queries see [proxies ⊕ own frame]); turns the
    #     reference's thousands of 49×53 gemms into MXU-sized batched
    #     matmuls at ~10% more FLOPs — faster on TPU.
    #   "factorized": the reference's two-attention decomposition
    #     (``CLIP_ViP.py:332-381``), linear in N — wins for very long clips.
    attention_mode: str = "masked_full"


@dataclasses.dataclass(frozen=True)
class CLIPVipConfig:
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    vip: VipConfig = dataclasses.field(default_factory=VipConfig)
    projection_dim: int = 512
    logit_scale_init_value: float = 2.6592  # HF CLIP default; ViP overrides at load
    dtype: Any = jnp.float32
    remat: bool = False

    @staticmethod
    def base_patch32(**overrides) -> "CLIPVipConfig":
        return CLIPVipConfig(**overrides)

    @staticmethod
    def base_patch16(**overrides) -> "CLIPVipConfig":
        vision = CLIPVisionConfig(patch_size=16)
        return CLIPVipConfig(vision=vision, **overrides)

    @staticmethod
    def tiny_debug(image_size: int = 32, **overrides) -> "CLIPVipConfig":
        """Small config for smoke tests / debug runs (``--clip_size tiny``)."""
        text = CLIPTextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=77,
        )
        vision = CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=image_size, patch_size=16,
        )
        return CLIPVipConfig(text=text, vision=vision, projection_dim=32, **overrides)

    @staticmethod
    def large_patch14(**overrides) -> "CLIPVipConfig":
        text = CLIPTextConfig(hidden_size=768, intermediate_size=3072, num_attention_heads=12)
        vision = CLIPVisionConfig(
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            patch_size=14,
        )
        return CLIPVipConfig(text=text, vision=vision, projection_dim=768, **overrides)


# ---------------------------------------------------------------------------
# Proxy attention
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def proxy_attention_mask(M: int, N: int, L: int) -> "np.ndarray":
    """Static additive mask making full attention equal proxy attention.

    Row i may attend column j iff i is a proxy token (i < M), or j is a
    proxy token, or i and j lie in the same frame. Softmax over the allowed
    set then matches the reference's factorized ``forward2`` exactly.
    """
    import numpy as np

    S = M + N * L
    frame = np.full(S, -1)
    frame[M:] = np.repeat(np.arange(N), L)
    allowed = (
        (np.arange(S)[:, None] < M)
        | (np.arange(S)[None, :] < M)
        | (frame[:, None] == frame[None, :]) & (frame[:, None] >= 0)
    )
    return np.where(allowed, 0.0, -1e9).astype(np.float32)[None, None]


class ProxyAttention(nn.Module):
    """The ViP proxy video attention (ref ``CLIP_ViP.py:332-381``).

    Sequence layout: [M proxy tokens ⊕ N frames × L patches]. Semantics:
    patch tokens attend [proxies ⊕ own frame], proxies attend everything.
    Two mathematically identical kernels (see ``VipConfig.attention_mode``):
    ``masked_full`` = one attention with a static block mask (best MXU
    shapes on TPU); ``factorized`` = the reference's two-attention
    decomposition, linear in N:

    - in-frame: q = per-frame patches [B,H,N,L,D]; keys/values are the M
      proxies broadcast to every frame concatenated with that frame's own
      patches — softmax over the *joint* M+L axis (the subtle part: a
      separate softmax over proxies and patches would be wrong).
    - cls-divided: the M proxies attend over the full M+N·L sequence.
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    mode: str = "masked_full"

    @nn.compact
    def __call__(
        self,
        hidden_states: Array,  # [B, M+N*L, C]
        inputs_size: tuple[int, int, int],  # (M, N, L) — static
        deterministic: bool = True,
    ) -> Array:
        if self.mode == "masked_full":
            return self._masked_full(hidden_states, inputs_size, deterministic)
        return self._factorized(hidden_states, inputs_size, deterministic)

    def _masked_full(
        self,
        hidden_states: Array,
        inputs_size: tuple[int, int, int],
        deterministic: bool,
    ) -> Array:
        M, N, L = inputs_size
        B = hidden_states.shape[0]
        H = self.num_heads
        D = self.embed_dim // H
        dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype, name=name)
        split = lambda x: x.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        q = split(dense("q_proj")(hidden_states))
        k = split(dense("k_proj")(hidden_states))
        v = split(dense("v_proj")(hidden_states))
        if self.dropout_rate == 0.0 or deterministic:
            # fused Pallas path: scores/mask/softmax never touch HBM
            # (exact VJP; see ops/proxy_attention.py). The [B,H,S,D] layout
            # is deliberate: a packed [B,S,H·D] variant that skips these
            # transposes measured 685 vs 1068 clips/s at B/32 serving — XLA
            # fuses the transposes into neighbouring ops, so they are nearly
            # free, while the packed kernel's in-VMEM relayout is not (see
            # proxy_flash_attention_packed).
            from xpretrain_tpu.ops.proxy_attention import proxy_flash_attention

            out = proxy_flash_attention(q, k, v, M, N, L, D**-0.5)
        else:
            rng = self.make_rng("dropout")
            mask = jnp.asarray(proxy_attention_mask(M, N, L))
            out = dot_attention(q, k, v, D**-0.5, mask, rng, self.dropout_rate, deterministic)
        out = out.transpose(0, 2, 1, 3).reshape(B, M + N * L, self.embed_dim)
        return dense("out_proj")(out)

    def _factorized(
        self,
        hidden_states: Array,
        inputs_size: tuple[int, int, int],
        deterministic: bool,
    ) -> Array:
        M, N, L = inputs_size
        B = hidden_states.shape[0]
        H = self.num_heads
        D = self.embed_dim // H
        scale = D**-0.5

        dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype, name=name)
        q = dense("q_proj")(hidden_states).reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        k = dense("k_proj")(hidden_states).reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        v = dense("v_proj")(hidden_states).reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        # q/k/v: [B, H, M+N*L, D]

        rng = None
        if self.dropout_rate > 0 and not deterministic:
            rng = self.make_rng("dropout")

        # ---- in-frame attention over [proxies ⊕ own frame] ----
        q_f = q[:, :, M:].reshape(B, H, N, L, D)
        k_f = k[:, :, M:].reshape(B, H, N, L, D)
        v_f = v[:, :, M:].reshape(B, H, N, L, D)
        k_p = jnp.broadcast_to(k[:, :, None, :M], (B, H, N, M, D))
        v_p = jnp.broadcast_to(v[:, :, None, :M], (B, H, N, M, D))
        k_cat = jnp.concatenate([k_p, k_f], axis=3)  # [B,H,N,M+L,D]
        v_cat = jnp.concatenate([v_p, v_f], axis=3)
        frames_out = dot_attention(
            q_f, k_cat, v_cat, scale, None, rng, self.dropout_rate, deterministic
        )  # [B,H,N,L,D]
        frames_out = frames_out.transpose(0, 2, 3, 1, 4).reshape(B, N * L, self.embed_dim)

        # ---- cls-divided attention: proxies attend to everything ----
        cls_out = dot_attention(
            q[:, :, :M], k, v, scale, None, rng, self.dropout_rate, deterministic
        )  # [B,H,M,D]
        cls_out = cls_out.transpose(0, 2, 1, 3).reshape(B, M, self.embed_dim)

        out = jnp.concatenate([cls_out, frames_out], axis=1)
        return dense("out_proj")(out)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


class PatchEmbedding(nn.Module):
    """Patchify-as-matmul: stride==kernel conv is a reshape + one MXU gemm.

    Holds the conv-layout kernel [P, P, 3, D] (converter-compatible) and
    supports two input paths:

    - fp32 NCHW frames (already normalized host-side);
    - raw uint8 NHWC frames with the /255+mean/std normalization folded
      into the weights (``ops.patchify.fold_normalization``) — the fused
      ingest path, 4x less host->device bandwidth.
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, frames: Array, mean=None, std=None) -> Array:
        from xpretrain_tpu.ops.patchify import extract_patches_u8, fold_normalization

        P = self.patch_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (P, P, 3, self.embed_dim),
            jnp.float32,
        )
        if frames.dtype == jnp.uint8:
            folded_w, bias = fold_normalization(kernel, mean, std)
            patches = extract_patches_u8(frames, P).astype(self.dtype)
            return (
                jax.lax.dot_general(
                    patches,
                    folded_w.astype(self.dtype),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(self.dtype)
                + bias.astype(self.dtype)
            )
        # fp32 NCHW path
        x = frames.transpose(0, 2, 3, 1)  # -> NHWC
        N, H, W, C = x.shape
        gh, gw = H // P, W // P
        x = x.reshape(N, gh, P, gw, P, C).transpose(0, 1, 3, 2, 4, 5).reshape(N, gh * gw, P * P * C)
        w = kernel.reshape(P * P * 3, self.embed_dim)
        return jax.lax.dot_general(
            x.astype(self.dtype),
            w.astype(self.dtype),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


class VipVisionEmbeddings(nn.Module):
    """Video patchify + temporal/spatial embeds + proxy tokens
    (ref ``CLIP_ViP.py:142-197``). Accepts fp32 [B,T,C,H,W] (pre-normalized)
    or raw uint8 [B,T,H,W,3] via the fused ingest path."""

    config: CLIPVisionConfig
    vip: VipConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: Array) -> tuple[Array, tuple[int, int, int]]:
        cfg = self.config
        if pixel_values.dtype == jnp.uint8:
            B, T, Hh, Ww, C = pixel_values.shape
        else:
            B, T, C, Hh, Ww = pixel_values.shape
        embed_dim = cfg.hidden_size
        n_patches = (cfg.image_size // cfg.patch_size) ** 2

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (embed_dim,), jnp.float32
        )
        added_cls = (
            self.param(
                "added_cls",
                nn.initializers.normal(0.02),
                (self.vip.add_cls_num, embed_dim),
                jnp.float32,
            )
            if self.vip.add_cls_num > 0
            else None
        )
        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, embed_dim),
            jnp.float32,
        )

        # per-frame patchify as one gemm (stride == kernel conv)
        embedder = PatchEmbedding(
            cfg.patch_size, embed_dim, dtype=self.dtype, name="patch_embedding"
        )
        if pixel_values.dtype == jnp.uint8:
            from xpretrain_tpu.data.transforms import CLIP_MEAN, CLIP_STD

            patches = embedder(
                pixel_values.reshape(B * T, Hh, Ww, C), mean=CLIP_MEAN, std=CLIP_STD
            )
        else:
            patches = embedder(pixel_values.reshape(B * T, C, Hh, Ww))
        L = patches.shape[1]
        patches = patches.reshape(B, T, L, embed_dim)

        if self.vip.if_use_temporal_embed:
            temporal_embedding = self.param(
                "temporal_embedding",
                nn.initializers.zeros,
                (1, self.vip.temporal_size, embed_dim),
                jnp.float32,
            )
            if T != self.vip.temporal_size:
                # linear interp over time, matching F.interpolate(mode="linear",
                # align_corners=False) at ref CLIP_ViP.py:170-176; explicit
                # gather+lerp because jax.image.resize antialiases downscales
                src = self.vip.temporal_size
                x = jnp.clip((jnp.arange(T) + 0.5) * src / T - 0.5, 0, src - 1)
                lo = jnp.floor(x).astype(jnp.int32)
                hi = jnp.minimum(lo + 1, src - 1)
                w = (x - lo)[None, :, None]
                time_embed = temporal_embedding[:, lo] * (1 - w) + temporal_embedding[:, hi] * w
            else:
                time_embed = temporal_embedding
            patches = patches + time_embed[:, :, None].astype(patches.dtype)

        if L != n_patches:
            raise ValueError(
                f"input yields {L} patches/frame but config.image_size="
                f"{cfg.image_size} with patch_size={cfg.patch_size} trains "
                f"{n_patches} spatial positions — resize inputs or the config"
            )
        patches = patches + position_embedding[None, None, 1:].astype(patches.dtype)
        cls = class_embedding[None, None] + position_embedding[None, :1]
        cls = jnp.broadcast_to(cls.astype(patches.dtype), (B, 1, embed_dim))
        head = [cls]
        if added_cls is not None:
            extra = added_cls[None] + position_embedding[None, :1]
            extra = jnp.broadcast_to(
                extra.astype(patches.dtype), (B, self.vip.add_cls_num, embed_dim)
            )
            head.append(extra)

        M = 1 + self.vip.add_cls_num
        embeds = jnp.concatenate(head + [patches.reshape(B, T * L, embed_dim)], axis=1)
        return embeds, (M, T, L)


class TextEmbeddings(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
            dtype=self.dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
            jnp.float32,
        )
        return tok + pos[None, : input_ids.shape[1]].astype(tok.dtype)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class EncoderLayer(nn.Module):
    """Pre-LN transformer block; proxy attention when ``inputs_size`` given."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    attention_dropout: float = 0.0
    use_proxy: bool = False
    dtype: jnp.dtype = jnp.float32
    proxy_mode: str = "masked_full"

    @nn.compact
    def __call__(
        self,
        hidden_states: Array,
        mask: Optional[Array] = None,
        inputs_size: Optional[tuple[int, int, int]] = None,
        deterministic: bool = True,
    ) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        residual = hidden_states
        x = ln("layer_norm1")(hidden_states)
        if self.use_proxy and inputs_size is not None:
            x = ProxyAttention(
                self.hidden_size,
                self.num_heads,
                self.attention_dropout,
                dtype=self.dtype,
                mode=self.proxy_mode,
                name="self_attn",
            )(x, inputs_size, deterministic)
        else:
            x = MultiHeadAttention(
                self.hidden_size,
                self.num_heads,
                self.attention_dropout,
                dtype=self.dtype,
                name="self_attn",
            )(x, mask, deterministic)
        hidden_states = residual + x
        residual = hidden_states
        x = ln("layer_norm2")(hidden_states)
        x = TransformerMLP(
            self.hidden_size, self.intermediate_size, self.hidden_act, dtype=self.dtype, name="mlp"
        )(x)
        return residual + x


class Encoder(nn.Module):
    num_layers: int
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    attention_dropout: float = 0.0
    use_proxy: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32
    proxy_mode: str = "masked_full"

    @nn.compact
    def __call__(
        self,
        hidden_states: Array,
        mask: Optional[Array] = None,
        inputs_size: Optional[tuple[int, int, int]] = None,
        deterministic: bool = True,
    ) -> Array:
        layer_cls = EncoderLayer
        if self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3, 4))
        for i in range(self.num_layers):
            hidden_states = layer_cls(
                self.hidden_size,
                self.num_heads,
                self.intermediate_size,
                self.hidden_act,
                self.attention_dropout,
                self.use_proxy,
                dtype=self.dtype,
                proxy_mode=self.proxy_mode,
                name=f"layers_{i}",
            )(hidden_states, mask, inputs_size, deterministic)
        return hidden_states


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


class TextTransformer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        input_ids: Array,
        attention_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> tuple[Array, Array]:
        cfg = self.config
        x = TextEmbeddings(cfg, dtype=self.dtype, name="embeddings")(input_ids)
        mask = make_causal_mask(input_ids.shape[1])
        if attention_mask is not None:
            mask = mask + expand_padding_mask(attention_mask)
        x = Encoder(
            cfg.num_hidden_layers,
            cfg.hidden_size,
            cfg.num_attention_heads,
            cfg.intermediate_size,
            cfg.hidden_act,
            cfg.attention_dropout,
            use_proxy=False,
            remat=self.remat,
            dtype=self.dtype,
            name="encoder",
        )(x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        # EOT pooling: the EOT token has the highest id in CLIP's vocab
        # (ref CLIP_ViP.py:776)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        return x, pooled


class VipVisionTransformer(nn.Module):
    config: CLIPVisionConfig
    vip: VipConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, pixel_values: Array, deterministic: bool = True) -> tuple[Array, Array]:
        cfg = self.config
        embeds, inputs_size = VipVisionEmbeddings(cfg, self.vip, dtype=self.dtype, name="embeddings")(
            pixel_values
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layernorm")(embeds)
        use_proxy = self.vip.type == "ViP"
        x = Encoder(
            cfg.num_hidden_layers,
            cfg.hidden_size,
            cfg.num_attention_heads,
            cfg.intermediate_size,
            cfg.hidden_act,
            cfg.attention_dropout,
            use_proxy=use_proxy,
            remat=self.remat,
            dtype=self.dtype,
            proxy_mode=self.vip.attention_mode,
            name="encoder",
        )(x, inputs_size=inputs_size if use_proxy else None, deterministic=deterministic)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_layernorm")(x[:, 0])
        return x, pooled


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


class CLIPViPModel(nn.Module):
    """Dual-tower video CLIP with proxy attention (the ``VidCLIP`` surface).

    ``__call__`` mirrors ``VidCLIP.forward`` (ref ``VidCLIP.py:32-81``):
    returns normalized ``text_features`` / ``vis_features`` plus the optional
    auxiliary image/caption branch features.
    """

    config: CLIPVipConfig

    def setup(self) -> None:
        cfg = self.config
        self.text_model = TextTransformer(cfg.text, dtype=cfg.dtype, remat=cfg.remat)
        self.vision_model = VipVisionTransformer(
            cfg.vision, cfg.vip, dtype=cfg.dtype, remat=cfg.remat
        )
        self.visual_projection = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype, name="visual_projection"
        )
        self.text_projection = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype, name="text_projection"
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda _key, _shape: jnp.asarray(cfg.logit_scale_init_value, jnp.float32),
            (),
        )

    def encode_text(
        self, input_ids: Array, attention_mask: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        _, pooled = self.text_model(input_ids, attention_mask, deterministic)
        return self.text_projection(pooled)

    def encode_video(self, pixel_values: Array, deterministic: bool = True) -> Array:
        """pixel_values: [B, T, C, H, W] video clip (T=1 for still images)."""
        cfg = self.config
        if cfg.vip.type == "ViP":
            _, pooled = self.vision_model(pixel_values, deterministic)
            return self.visual_projection(pooled)
        # frame-mean baseline: encode each frame independently, normalize,
        # mean-pool over frames (ref VidCLIP.py:55-65)
        B, T = pixel_values.shape[:2]
        frames = pixel_values.reshape(B * T, 1, *pixel_values.shape[2:])
        _, pooled = self.vision_model(frames, deterministic)
        feats = l2_normalize(self.visual_projection(pooled))
        return feats.reshape(B, T, -1).mean(axis=1)

    def __call__(
        self,
        video: Array,
        text_input_ids: Array,
        text_input_mask: Optional[Array] = None,
        image: Optional[Array] = None,
        caption_ids: Optional[Array] = None,
        caption_masks: Optional[Array] = None,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        vis = l2_normalize(self.encode_video(video, deterministic))
        txt = l2_normalize(self.encode_text(text_input_ids, text_input_mask, deterministic))
        results = {"text_features": txt, "vis_features": vis, "logit_scale": self.logit_scale}
        if image is not None:
            B, img_num = image.shape[:2]
            L = caption_ids.shape[-1]
            img = image.reshape(B * img_num, 1, *image.shape[2:])
            results["img_features"] = l2_normalize(self.encode_video(img, deterministic))
            results["cap_features"] = l2_normalize(
                self.encode_text(
                    caption_ids.reshape(-1, L),
                    None if caption_masks is None else caption_masks.reshape(-1, L),
                    deterministic,
                )
            )
        return results

    def forward_video(self, pixel_values: Array, deterministic: bool = True) -> Array:
        return l2_normalize(self.encode_video(pixel_values, deterministic))

    def forward_text(
        self, input_ids: Array, attention_mask: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        return l2_normalize(self.encode_text(input_ids, attention_mask, deterministic))
