"""Unit tests for the shared trainer loop (train/loop.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.parallel.mesh import create_mesh
from xpretrain_tpu.train.loop import drive_train_loop, stack_batches


class _State:
    def __init__(self, step=0):
        self.step = step


def test_stack_batches_schema_mismatch_raises():
    good = [{"x": np.zeros((4, 2))}, {"x": np.zeros((4, 2))}]
    out = stack_batches(good)
    assert out["x"].shape == (2, 4, 2)
    with pytest.raises(ValueError, match="identical batches"):
        stack_batches([{"x": np.zeros((4, 2))}, {"x": np.zeros((4, 3))}])  # shape diff
    with pytest.raises(ValueError, match="identical batches"):
        stack_batches([{"x": np.zeros((4, 2))}, {"y": np.zeros((4, 2))}])  # key diff
    with pytest.raises(ValueError, match="dict batches"):
        stack_batches([np.zeros((4, 2)), np.zeros((4, 2))])


def test_log_density_preserved_when_chunk_exceeds_log_every():
    """steps_per_call=4 with log_every=2 must still log every 2 steps, each
    from its own sub-step metrics row."""
    mesh = create_mesh()

    def fake_step(state, batch, rng):
        # batch is stacked [K, B]; emulate per-step metrics with a leading K
        k = batch["x"].shape[0]
        new = _State(state.step + k)
        return new, {"loss": jnp.arange(k, dtype=jnp.float32) + state.step}

    logged = []
    state = drive_train_loop(
        train_step=fake_step,
        loader=iter(lambda: {"x": np.zeros((8, 2), np.float32)}, None),
        state=_State(0),
        rng=jax.random.PRNGKey(0),
        mesh=mesh,
        num_train_steps=8,
        steps_per_call=4,
        log_every=2,
        valid_every=100,
        save_every=100,
        on_log=lambda step, m, sps: logged.append((step, float(m["loss"]))),
    )
    assert state.step == 8
    # boundaries 2,4,6,8 all logged; loss value = (step-1) since each chunk's
    # rows are step_base + [0..k)
    assert [s for s, _ in logged] == [2, 4, 6, 8]
    assert [v for _, v in logged] == [1.0, 3.0, 5.0, 7.0]


def test_remainder_chunk_and_save_boundaries():
    mesh = create_mesh()
    calls = []

    def fake_step(state, batch, rng):
        k = batch["x"].shape[0] if batch["x"].ndim == 3 else 1
        calls.append(k)
        return _State(state.step + k), {"loss": jnp.zeros((k,)) if k > 1 else jnp.zeros(())}

    saves = []
    state = drive_train_loop(
        train_step=fake_step,
        loader=iter(lambda: {"x": np.zeros((8, 2), np.float32)}, None),
        state=_State(0),
        rng=jax.random.PRNGKey(0),
        mesh=mesh,
        num_train_steps=5,
        steps_per_call=2,
        log_every=100,
        valid_every=100,
        save_every=2,
        on_save=lambda step, st: saves.append(step),
    )
    assert state.step == 5
    assert calls == [2, 2, 1]  # two full chunks + remainder
    assert saves == [2, 4]  # boundary 4 crossed in second chunk; 5 is not a boundary


def test_profiler_trace_capture(tmp_path):
    mesh = create_mesh()

    def fake_step(state, batch, rng):
        return _State(state.step + 1), {"loss": jnp.zeros(())}

    state = drive_train_loop(
        train_step=fake_step,
        loader=iter(lambda: {"x": np.zeros((8, 2), np.float32)}, None),
        state=_State(0),
        rng=jax.random.PRNGKey(0),
        mesh=mesh,
        num_train_steps=4,
        steps_per_call=1,
        log_every=100,
        valid_every=100,
        save_every=100,
        profile_dir=str(tmp_path / "profile"),
        profile_start_step=1,
        profile_num_steps=2,
    )
    assert state.step == 4
    files = list((tmp_path / "profile").rglob("*"))
    assert any(f.is_file() for f in files), files


def test_async_checkpoint_roundtrip(tmp_path):
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    state = {"w": np.arange(8, dtype=np.float32), "step": np.asarray(3, np.int32)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mgr.save(3, state)       # returns before durable
    mgr.save(5, {"w": state["w"] * 2, "step": np.asarray(5, np.int32)})
    mgr.wait()
    assert mgr.latest_step() == 5
    restored = mgr.restore({"w": np.zeros(8, np.float32), "step": np.asarray(0, np.int32)})
    np.testing.assert_array_equal(restored["w"], state["w"] * 2)
    mgr.close()
