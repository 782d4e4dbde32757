"""Fused ingest op: folded-normalization patch embedding correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.data.transforms import CLIP_MEAN, CLIP_STD
import pytest

from xpretrain_tpu.ops.patchify import (
    extract_patches_u8,
    fold_normalization,
    fused_patch_embed,
    normalize_u8,
)


def _reference_path(frames_u8, kernel, mean, std):
    """The unfused reference chain: normalize -> conv patchify."""
    x = frames_u8.astype(np.float32) / 255.0
    x = (x - mean) / std  # [N, H, W, 3]
    import flax.linen as nn

    conv = nn.Conv(
        kernel.shape[-1],
        kernel_size=kernel.shape[:2],
        strides=kernel.shape[:2],
        use_bias=False,
    )
    out = conv.apply({"params": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x))
    N, gh, gw, D = out.shape
    return np.asarray(out).reshape(N, gh * gw, D)


def test_fused_equals_reference_chain():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(2, 64, 96, 3), dtype=np.uint8)
    kernel = rng.normal(size=(16, 16, 3, 32)).astype(np.float32) * 0.02
    want = _reference_path(frames, kernel, CLIP_MEAN, CLIP_STD)
    got = fused_patch_embed(
        jnp.asarray(frames), jnp.asarray(kernel), CLIP_MEAN, CLIP_STD, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_pallas_kernel_interpret_mode():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    kernel = rng.normal(size=(16, 16, 3, 16)).astype(np.float32) * 0.02
    want = fused_patch_embed(
        jnp.asarray(frames), jnp.asarray(kernel), CLIP_MEAN, CLIP_STD, use_pallas=False
    )
    got = fused_patch_embed(
        jnp.asarray(frames), jnp.asarray(kernel), CLIP_MEAN, CLIP_STD,
        use_pallas=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_patch_extraction_layout():
    # patch flattening must match the [P, P, 3, D] kernel layout
    frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    patches = np.asarray(extract_patches_u8(jnp.asarray(frames), 2))
    assert patches.shape == (2, 4, 12)
    # first patch of first frame = rows 0-1, cols 0-1, all channels, row-major
    want = frames[0, 0:2, 0:2].reshape(-1)
    np.testing.assert_array_equal(patches[0, 0], want)


def test_fold_normalization_algebra():
    rng = np.random.default_rng(2)
    kernel = rng.normal(size=(4, 4, 3, 8)).astype(np.float32)
    w, b = fold_normalization(jnp.asarray(kernel), CLIP_MEAN, CLIP_STD)
    x = rng.integers(0, 256, size=(1, 4, 4, 3), dtype=np.uint8)
    flat = np.asarray(extract_patches_u8(jnp.asarray(x), 4), dtype=np.float32)[0, 0]
    got = flat @ np.asarray(w) + np.asarray(b)
    norm = ((x.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD)[0]
    want = np.einsum("hwc,hwcd->d", norm, kernel)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_clipvip_u8_path_matches_float_path():
    """Model fed raw uint8 must equal model fed host-normalized fp32."""
    import jax

    from xpretrain_tpu.data.transforms import clip_transform
    from xpretrain_tpu.models.clip_vip import (
        CLIPTextConfig,
        CLIPVipConfig,
        CLIPVisionConfig,
        CLIPViPModel,
        VipConfig,
    )

    cfg = CLIPVipConfig(
        text=CLIPTextConfig(
            vocab_size=500, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=4, max_position_embeddings=8,
        ),
        vision=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=4, image_size=32, patch_size=16,
        ),
        vip=VipConfig(temporal_size=2, add_cls_num=1),
        projection_dim=16,
    )
    model = CLIPViPModel(cfg)
    rng = np.random.default_rng(5)
    frames_u8 = rng.integers(0, 256, size=(2, 2, 32, 32, 3), dtype=np.uint8)
    # host-side normalize (frames [T,H,W,C] per sample)
    frames_f32 = np.stack([clip_transform(f, 32) for f in frames_u8])
    ids = jnp.asarray([[499, 3, 4, 499, 0, 0, 0, 0]] * 2)
    mask = (ids > 0).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(frames_f32), ids, mask)
    out_f = model.apply(params, jnp.asarray(frames_f32), ids, mask)
    out_u8 = model.apply(params, jnp.asarray(frames_u8), ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_u8["vis_features"]), np.asarray(out_f["vis_features"]), atol=2e-5
    )


def test_normalize_u8():
    frames = np.full((2, 8, 8, 3), 128, np.uint8)
    out = np.asarray(normalize_u8(jnp.asarray(frames), CLIP_MEAN, CLIP_STD))
    assert out.shape == (2, 3, 8, 8)
    want = (128 / 255.0 - CLIP_MEAN[1]) / CLIP_STD[1]
    assert np.isclose(out[0, 1, 0, 0], want, atol=1e-6)
