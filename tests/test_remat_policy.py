"""Selective rematerialization policy on the Swin3D/HTWA encoder.

`Swin3DConfig.remat_policy` names a `jax.checkpoint_policies` member (e.g.
"dots_saveable"): matmul outputs stay resident in the backward pass and only
the cheap elementwise/softmax pipeline is recomputed. Values and gradients
must be identical to full remat and to no remat — a remat policy changes the
schedule, never the math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D
import pytest


def _cfg(**kw):
    return Swin3DConfig.tiny(
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2),
        stages=(0, 0, 1, 1),
        downsample_stages=(1,),
        window_size=((2, 2, 2), (4, 2, 2), (8, 2, 2), (8, 2, 2)),
        local_window=4,
        drop_path_rate=0.0,
        **kw,
    )


def _loss_and_grads(cfg, params, video):
    model = SwinTransformer3D(cfg)

    def loss(p):
        g, l = model.apply(p, video)
        return jnp.sum(g**2) + jnp.sum(l**2)

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    return float(val), grads


@pytest.mark.slow
def test_remat_policy_matches_full_remat_and_no_remat():
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 8, 32, 32)).astype(np.float32))
    params = SwinTransformer3D(_cfg()).init(jax.random.PRNGKey(0), video)

    base_val, base_grads = _loss_and_grads(_cfg(), params, video)
    for kw in (
        {"remat": True},
        {"remat": True, "remat_policy": "dots_saveable"},
        {"remat": True, "remat_policy": "dots_with_no_batch_dims_saveable"},
    ):
        val, grads = _loss_and_grads(_cfg(**kw), params, video)
        assert np.isclose(val, base_val, rtol=1e-6), kw
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            grads,
            base_grads,
        )


def test_unknown_policy_raises():
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(1, 3, 8, 32, 32)).astype(np.float32))
    cfg = _cfg(remat=True, remat_policy="not_a_policy")
    try:
        SwinTransformer3D(cfg).init(jax.random.PRNGKey(0), video)
    except AttributeError as e:
        assert "not_a_policy" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected AttributeError for unknown policy")
