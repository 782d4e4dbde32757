"""Ring attention ≡ dense attention on the 8-device virtual mesh.

The op (``ops/ring_attention.py``) is a TPU-native long-context extension
beyond the reference (SURVEY §5.7: no sequence parallelism anywhere in
XPretrain; ring attention named as the natural extension). Asserted here:

- forward parity vs dense softmax attention, with and without padding
  masks, on seq=8 and seq=4×data=2 meshes;
- gradient parity through the rotated K/V ring (train-step-shaped loss);
- indivisible sequence raises.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.ops.ring_attention import make_ring_attention
from xpretrain_tpu.parallel.mesh import create_mesh

B, H, S, D = 2, 4, 48, 16


def _dense(q, k, v, mask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * D**-0.5
    if mask is not None:
        s = s + ((1.0 - mask.astype(jnp.float32)) * -1e30)[:, None, None, :]
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32)).astype(q.dtype)


def _qkv(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    return mk(), mk(), mk()


def _seq_mesh(p=8):
    return create_mesh((p,), ("seq",), devices=jax.devices()[:p])


@pytest.mark.parametrize("with_mask", [False, True])
def test_ring_matches_dense(with_mask):
    q, k, v = _qkv()
    mask = None
    if with_mask:
        m = np.ones((B, S), np.int32)
        m[0, -10:] = 0
        m[1, -3:] = 0
        mask = jnp.asarray(m)
    ring = make_ring_attention(_seq_mesh(8))
    got = jax.jit(ring)(q, k, v, mask)
    want = _dense(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_with_data_axis():
    q, k, v = _qkv(1)
    mesh = create_mesh((2, 4), ("data", "seq"), devices=jax.devices()[:8])
    ring = make_ring_attention(mesh, data_axis="data")
    got = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_dense(q, k, v)), atol=2e-5)


def test_ring_grad_matches_dense():
    q, k, v = _qkv(2)
    target = jnp.asarray(np.random.default_rng(3).normal(size=(B, H, S, D)).astype(np.float32))
    ring = make_ring_attention(_seq_mesh(4))

    def ring_loss(args):
        return jnp.mean((ring(*args) - target) ** 2)

    def dense_loss(args):
        return jnp.mean((_dense(*args) - target) ** 2)

    lr, gr = jax.jit(jax.value_and_grad(ring_loss))((q, k, v))
    ld, gd = jax.jit(jax.value_and_grad(dense_loss))((q, k, v))
    np.testing.assert_allclose(float(lr), float(ld), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_indivisible_sequence_raises():
    q, k, v = _qkv(4)
    ring = make_ring_attention(_seq_mesh(8))
    with pytest.raises(ValueError):
        ring(q[:, :, :42], k[:, :, :42], v[:, :, :42])
