"""Context parallelism: temporal-axis sharding of the Swin3D/HTWA encoder.

HTWA's growing temporal windows make time-sharding nearly free: stages
whose window fits the local shard run without cross-device traffic; the
partitioner reshards only for global-window stages. Output must be
bit-compatible with the unsharded forward (GSPMD semantics), checked here
on the virtual 8-device CPU mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.models.lf_vila.swin3d import Swin3DConfig, SwinTransformer3D
from xpretrain_tpu.parallel.mesh import create_mesh


def _cfg(**kw):
    return Swin3DConfig.tiny(
        depths=(1, 1, 1, 1),
        num_heads=(2, 2, 2, 2),
        stages=(0, 0, 1, 1),
        downsample_stages=(1,),
        # windows grow 2 -> 8: with cp=2 over T=8 the first stages are
        # shard-local and the last window spans both shards
        window_size=((2, 2, 2), (4, 2, 2), (8, 2, 2), (8, 2, 2)),
        local_window=4,
        **kw,
    )


def test_context_parallel_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(2, 3, 8, 32, 32)).astype(np.float32))

    base = SwinTransformer3D(_cfg())
    params = base.init(jax.random.PRNGKey(0), video)
    ref_g, ref_l = jax.jit(lambda p, v: base.apply(p, v))(params, video)

    cp_model = SwinTransformer3D(_cfg(context_parallel_axis="model"))
    mesh = create_mesh((2, 4), ("data", "model"), devices=jax.devices()[:8])
    with mesh:
        got_g, got_l = jax.jit(lambda p, v: cp_model.apply(p, v))(params, video)

    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l), atol=1e-5, rtol=1e-5)


def test_context_parallel_with_data_sharding():
    """cp composes with batch sharding on the data axis in one program."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.normal(size=(4, 3, 8, 32, 32)).astype(np.float32))
    base = SwinTransformer3D(_cfg())
    params = base.init(jax.random.PRNGKey(0), video[:1])
    ref_g, _ = jax.jit(lambda p, v: base.apply(p, v))(params, video)

    model = SwinTransformer3D(_cfg(context_parallel_axis="model"))
    mesh = create_mesh((2, 4), ("data", "model"), devices=jax.devices()[:8])
    with mesh:
        # committed batch-sharded input + plain jit: the partitioner starts
        # from batch-over-data and reshards to time-over-model inside
        video_sharded = jax.device_put(video, NamedSharding(mesh, P("data")))
        got_g, _ = jax.jit(lambda p, v: model.apply(p, v))(params, video_sharded)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=1e-5, rtol=1e-5)
