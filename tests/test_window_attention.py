"""Pallas window-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.data.text_clean import clean_subtitle, remove_stop_words
from xpretrain_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_xla,
)


def _inputs(Bn=6, H=2, N=30, d=16, with_mask=True, nW=3, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(Bn, H, N, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(Bn, H, N, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(Bn, H, N, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
    mask = None
    if with_mask:
        m = np.where(rng.random((nW, N, N)) < 0.2, -100.0, 0.0).astype(np.float32)
        mask = jnp.asarray(m)
    return q, k, v, bias, mask


def test_pallas_matches_xla_no_mask():
    q, k, v, bias, _ = _inputs(with_mask=False)
    want = window_attention_xla(q, k, v, bias)
    got = window_attention_pallas(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_matches_xla_with_mask():
    q, k, v, bias, mask = _inputs(with_mask=True)
    want = window_attention_xla(q, k, v, bias, mask)
    got = window_attention_pallas(q, k, v, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_xla_path_matches_swin_module_semantics():
    """window_attention_xla == the WindowAttention3D inner math."""
    from xpretrain_tpu.models.lf_vila.swin3d import relative_position_index

    H, N, d = 2, 2 * 3 * 5, 8
    rng = np.random.default_rng(1)
    table = rng.normal(size=((2 * 2 - 1) * (2 * 3 - 1) * (2 * 5 - 1), H)).astype(np.float32)
    idx = relative_position_index((2, 3, 5))
    bias = jnp.asarray(table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1))
    q, k, v, _, _ = _inputs(Bn=4, H=H, N=N, d=d, with_mask=False)
    out = window_attention_xla(q, k, v, bias)
    assert out.shape == (4, H, N, d)
    assert np.isfinite(np.asarray(out)).all()


def test_text_clean():
    assert remove_stop_words("the cat sat on the mat") == "cat sat mat"
    assert clean_subtitle("[MUSIC] Hello <i>world</i> ♪") == "Hello world"
