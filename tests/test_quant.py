"""Int8 serving quantization (ops/quant.py): numerics + interception.

The reference has no quantized path (fp16 torch serving); this is the
TPU-native w8a8 serving extension. Accuracy contract: per-family
embedding cosine vs the fp path ≥ 0.99.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.ops.quant import (
    int8_matmul,
    int8_serving,
    maybe_int8_serving,
    quantize_weight,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.05, jnp.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (48,)
    deq = np.asarray(q, np.float32) * np.asarray(scale)
    # absmax symmetric: per-channel max error is scale/2 = absmax/254
    err = np.abs(deq - np.asarray(w)).max(axis=0)
    bound = np.abs(np.asarray(w)).max(axis=0) / 254.0 + 1e-6
    assert (err <= bound + 1e-7).all()


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((10, 3, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)) * 0.1, jnp.float32)
    q, s = quantize_weight(w)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_matmul(x, q, s))
    assert out.shape == (10, 3, 96)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    assert _cos(out, ref) > 0.999


def test_int8_matmul_preserves_dtype():
    x = jnp.ones((4, 32), jnp.bfloat16)
    q, s = quantize_weight(jnp.ones((32, 16), jnp.float32))
    assert int8_matmul(x, q, s).dtype == jnp.bfloat16


class _TwoDense(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(512, name="big")(x)
        return nn.Dense(4, name="small_head")(x)


def test_interceptor_thresholds():
    m = _TwoDense()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 300)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    with int8_serving(min_in_features=256, min_features=256):
        out = m.apply(params, x)
    # big Dense quantized -> small numeric difference; head stays fp
    assert not np.allclose(np.asarray(out), np.asarray(ref), atol=1e-7)
    assert _cos(out, ref) > 0.99
    # thresholds above every layer -> exact fp path
    with int8_serving(min_in_features=4096, min_features=4096):
        out_fp = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fp), np.asarray(ref), atol=1e-6)


def test_init_under_interception_falls_through():
    m = _TwoDense()
    x = jnp.ones((2, 300))
    with int8_serving(min_in_features=8, min_features=8):
        params = m.init(jax.random.PRNGKey(0), x)
    assert params["params"]["big"]["kernel"].shape == (300, 512)


def test_int8_under_jit():
    m = _TwoDense()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 300)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def served(p, x):
        with int8_serving(min_in_features=8, min_features=8):
            return m.apply(p, x)

    with int8_serving(min_in_features=8, min_features=8):
        eager = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(served(params, x)), np.asarray(eager), atol=1e-5)


def test_maybe_int8_serving_disabled_is_exact():
    m = _TwoDense()
    x = jnp.ones((2, 300))
    params = m.init(jax.random.PRNGKey(0), x)
    with maybe_int8_serving(False, min_in_features=8, min_features=8):
        out = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(m.apply(params, x)), atol=1e-7)


# ---------------------------------------------------------------------------
# Per-family accuracy: embedding cosine fp vs int8 ≥ 0.99
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_clipvip_int8_embedding_cosine():
    from xpretrain_tpu.models.clip_vip import (
        CLIPTextConfig,
        CLIPVipConfig,
        CLIPVisionConfig,
        CLIPViPModel,
        VipConfig,
    )

    cfg = CLIPVipConfig(
        text=CLIPTextConfig(
            vocab_size=49408, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
        ),
        vision=CLIPVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=16,
        ),
        vip=VipConfig(temporal_size=2, add_cls_num=2),
        projection_dim=32,
        dtype=jnp.float32,
    )
    model = CLIPViPModel(cfg)
    rng = np.random.default_rng(4)
    video = jnp.asarray(rng.standard_normal((3, 2, 3, 32, 32)), jnp.float32)
    ids = np.zeros((3, 12), np.int32)
    ids[:, 0] = 49406
    ids[:, 1:4] = rng.integers(300, 40000, (3, 3))
    ids[:, 4] = 49407
    ids = jnp.asarray(ids)
    mask = (ids > 0).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), video, ids, mask)

    ref = model.apply(params, video, ids, mask)
    with int8_serving(min_in_features=8, min_features=8):
        out = model.apply(params, video, ids, mask)
    for key in ("vis_features", "text_features"):
        c = _cos(out[key], ref[key])
        assert c > 0.99, (key, c)


@pytest.mark.slow
def test_bert_int8_hidden_cosine():
    """Staged BERT (HD-VILA/LF-VILA text towers) under int8 serving."""
    from xpretrain_tpu.models.bert import BertConfig, StagedBertModel

    cfg = BertConfig(
        vocab_size=1000, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128, max_position_embeddings=64,
    )
    model = StagedBertModel(cfg)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(1, 1000, (2, 24)), jnp.int32)
    mask = jnp.ones((2, 24), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), ids, attention_mask=mask)
    ref = model.apply(params, ids, attention_mask=mask)
    with int8_serving(min_in_features=8, min_features=8):
        out = model.apply(params, ids, attention_mask=mask)
    assert _cos(out, ref) > 0.99
