"""ZeRO-3/FSDP state must survive checkpoint save/restore and grad-accum.

The DeepSpeed analogue (ZeRO stage 3) needs special checkpoint
consolidation machinery; here the save path gathers to host numpy
(layout-independent bytes) and resume re-places onto whatever sharding the
step was built with — asserted by saving from an FSDP run and resuming it,
plus the optax MultiSteps grad-accumulation state (params-shaped
accumulator) under the FSDP layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.optim import build_optimizer, get_schedule
from xpretrain_tpu.parallel.fsdp import fsdp_param_shardings, fsdp_state_shardings
from xpretrain_tpu.parallel.mesh import create_mesh, shard_host_batch
from xpretrain_tpu.parallel.train_step import TrainState, make_train_step
from tests.test_fsdp import _batch, _tiny_model


def _init(model, batch):
    return model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["video"][:1]),
        jnp.asarray(batch["text_input_ids"][:1]),
        jnp.asarray(batch["text_input_mask"][:1]),
    )["params"]


@pytest.mark.slow
def test_fsdp_checkpoint_roundtrip(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    model = _tiny_model()
    batch = _batch(8)
    params = _init(model, batch)
    mesh = create_mesh(devices=jax.devices()[:8])
    tx, _ = build_optimizer(params, get_schedule("cosine", 1e-3, 100), weight_decay=0.1)
    pshard = fsdp_param_shardings(params, mesh, min_size=64)
    oshard = fsdp_state_shardings(tx, params, mesh, min_size=64)
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["video"], b["text_input_ids"], b["text_input_mask"]
        )

    with mesh:
        step = make_train_step(
            apply_fn, tx, mesh, loss_fn,
            param_shardings=pshard, opt_state_shardings=oshard, donate=False,
        )
        state = TrainState.create(params, tx)
        state = state.replace(
            params=jax.device_put(state.params, pshard),
            opt_state=jax.device_put(state.opt_state, oshard),
        )
        db = shard_host_batch(batch, mesh)
        state, _ = step(state, db, jax.random.PRNGKey(1))

        ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
        host_state = jax.tree_util.tree_map(np.asarray, state)  # gather
        ckpt.save(1, host_state, force=True)
        restored = ckpt.restore(host_state)
        assert restored is not None and int(restored.step) == 1

        # the gathered bytes match the sharded run exactly
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # resume re-places onto the FSDP layout and steps
        state2, metrics2 = step(restored, db, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics2["loss"]))
        assert int(state2.step) == 2
        leaf = jax.tree_util.tree_leaves(state2.params)[0]
        assert leaf.sharding.is_fully_replicated or any(
            s is not None for s in leaf.sharding.spec
        )


@pytest.mark.slow
def test_fsdp_with_grad_accum_matches_dp(tmp_path):
    """MultiSteps wraps a params-shaped grad accumulator into the opt state;
    the FSDP path-suffix sharding must handle it and stay DP-equivalent."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    model = _tiny_model()
    batch = _batch(8)
    params = _init(model, batch)
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def apply_fn(p, b, r):
        return model.apply(
            {"params": p}, b["video"], b["text_input_ids"], b["text_input_mask"]
        )

    def run(fsdp):
        mesh = create_mesh(devices=jax.devices()[:8])
        tx, _ = build_optimizer(
            params, get_schedule("cosine", 1e-3, 100),
            weight_decay=0.1, grad_accum_steps=2,
        )
        if fsdp:
            pshard = fsdp_param_shardings(params, mesh, min_size=64)
            oshard = fsdp_state_shardings(tx, params, mesh, min_size=64)
        else:
            pshard = oshard = None
        with mesh:
            step = make_train_step(
                apply_fn, tx, mesh, loss_fn,
                param_shardings=pshard, opt_state_shardings=oshard, donate=False,
            )
            state = TrainState.create(params, tx)
            if fsdp:
                state = state.replace(
                    params=jax.device_put(state.params, pshard),
                    opt_state=jax.device_put(state.opt_state, oshard),
                )
            db = shard_host_batch(batch, mesh)
            # two micro-steps = one real optimizer step under accum=2
            state, _ = step(state, db, jax.random.PRNGKey(1))
            state, metrics = step(state, db, jax.random.PRNGKey(2))
            return state, metrics

    dp_state, dp_metrics = run(fsdp=False)
    fs_state, fs_metrics = run(fsdp=True)
    np.testing.assert_allclose(
        float(fs_metrics["loss"]), float(dp_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(dp_state.params),
        jax.tree_util.tree_leaves(fs_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)
