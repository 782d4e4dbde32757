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


def test_stack_batches_scalar_leaf_raises():
    """A 0-d leaf would stack to rank-1 and then fail obscurely inside jit
    when P(None, 'data') meets it; stack_batches must fail at the cause."""
    with pytest.raises(ValueError, match="rank >= 1"):
        stack_batches([{"x": np.zeros((4, 2)), "n": np.float32(1.0)}] * 2)
    with pytest.raises(ValueError, match="rank >= 1"):
        stack_batches([{"x": np.zeros((4, 2)), "n": 3}] * 2)  # plain python int


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


def test_async_checkpoint_wait_retries_failed_save(tmp_path, monkeypatch):
    """A failed in-flight async save must be retried synchronously by
    wait() instead of aborting training (advisor r2)."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    state = {"w": np.arange(4, dtype=np.float32)}
    mgr.save(1, state)

    # simulate the in-flight write failing once at drain time
    calls = {"n": 0}
    real_wait = mgr._mgr.wait_until_finished

    def flaky_wait():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated storage failure")
        return real_wait()

    monkeypatch.setattr(mgr._mgr, "wait_until_finished", flaky_wait)
    mgr.wait()  # must not raise: retries the step-1 save synchronously
    assert mgr.latest_step() == 1
    restored = mgr.restore({"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(restored["w"], state["w"])


def test_sync_checkpoint_save_bounded_retry(tmp_path, monkeypatch):
    """Sync saves retry transient failures (ref load_save.py:47-63)."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), retries=3)
    real_save = mgr._mgr.save
    calls = {"n": 0}

    def flaky_save(step, args=None, force=False):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated transient failure")
        return real_save(step, args=args, force=force)

    monkeypatch.setattr(mgr._mgr, "save", flaky_save)
    monkeypatch.setattr("time.sleep", lambda s: None)
    mgr.save(1, {"w": np.ones(4, np.float32)})
    assert calls["n"] == 2 and mgr.latest_step() == 1


def test_sync_checkpoint_save_structural_error_fails_fast(tmp_path, monkeypatch):
    """A deterministic structural rejection (orbax ValueError, e.g. an
    unsaveable leaf) must raise immediately instead of burning the full
    retry/backoff budget on the same error."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), retries=5)
    calls = {"n": 0}

    def rejecting_save(step, args=None, force=False):
        calls["n"] += 1
        raise ValueError("Cannot save arrays with zero size")

    monkeypatch.setattr(mgr._mgr, "save", rejecting_save)
    monkeypatch.setattr("time.sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="checkpoint save rejected"):
        mgr.save(1, {"w": np.ones(4, np.float32)})
    assert calls["n"] == 1


def _opt_state_for(fused: bool):
    from xpretrain_tpu.optim import build_optimizer
    from xpretrain_tpu.parallel.train_step import TrainState

    params = {"dense": {"kernel": np.ones((8, 8), np.float32), "bias": np.zeros((8,), np.float32)}}
    tx, _ = build_optimizer(params, lambda s: 1e-3, weight_decay=0.1, fused=fused)
    return jax.tree_util.tree_map(np.asarray, TrainState.create(params, tx))


@pytest.mark.parametrize("saved_fused", [False, True])
def test_checkpoint_optimizer_layout_detection(tmp_path, saved_fused):
    """Resuming a checkpoint written with the other --fused_adamw layout must
    be detected (advisor r2, medium): saved_uses_fused_layout reports the
    saved layout, and a mismatched restore raises an error naming the flag."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, _opt_state_for(fused=saved_fused), force=True)
    assert mgr.saved_uses_fused_layout() is saved_fused

    # matched template restores fine
    ok = mgr.restore(_opt_state_for(fused=saved_fused))
    assert ok is not None and int(ok.step) == 0

    # mismatched template: targeted error naming the escape hatch
    with pytest.raises(RuntimeError, match=f"--fused_adamw {int(saved_fused)}"):
        mgr.restore(_opt_state_for(fused=not saved_fused))


def test_checkpoint_frozen_fused_state_roundtrip(tmp_path):
    """Frozen-pattern fused optimizer state must checkpoint: frozen leaves
    carry scalar placeholder moments — orbax refuses zero-size arrays, so a
    shape-(0,) placeholder would make every --frozen run (e.g. HD-VILA
    stage 2) fail at its first save."""
    from xpretrain_tpu.optim import build_optimizer
    from xpretrain_tpu.parallel.train_step import TrainState
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    params = {"enc": {"kernel": np.ones((8, 8), np.float32)},
              "head": {"kernel": np.ones((8, 4), np.float32)}}
    tx, _ = build_optimizer(params, lambda s: 1e-3, weight_decay=0.1,
                            fused=True, frozen_patterns=("enc",))
    state = jax.tree_util.tree_map(np.asarray, TrainState.create(params, tx))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state, force=True)
    restored = mgr.restore(state)
    assert restored is not None
    np.testing.assert_array_equal(
        restored.params["head"]["kernel"], state.params["head"]["kernel"])


def _opt_state_master(param_dtype_bf16: bool):
    import jax.numpy as jnp

    from xpretrain_tpu.optim import (
        build_optimizer,
        cast_params_for_storage,
        master_weights,
    )
    from xpretrain_tpu.parallel.train_step import TrainState

    params = {"dense": {"kernel": np.ones((8, 8), np.float32), "bias": np.zeros((8,), np.float32)}}
    tx, _ = build_optimizer(params, lambda s: 1e-3, weight_decay=0.1, fused=True)
    if param_dtype_bf16:
        params = cast_params_for_storage(params, jnp.bfloat16)
        tx = master_weights(tx)
    return jax.tree_util.tree_map(np.asarray, TrainState.create(params, tx))


@pytest.mark.parametrize("saved_master", [False, True])
def test_checkpoint_master_weights_layout_detection(tmp_path, saved_master):
    """Resuming across a --param_dtype change must raise a targeted error
    naming the flag: master_weights wraps the opt state in a
    MasterWeightsState whose tree structure a plain restore can't adopt."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, _opt_state_master(saved_master), force=True)
    assert mgr.saved_uses_master_layout() is saved_master

    ok = mgr.restore(_opt_state_master(saved_master))
    assert ok is not None and int(ok.step) == 0

    with pytest.raises(RuntimeError, match="--param_dtype"):
        mgr.restore(_opt_state_master(not saved_master))


def test_checkpoint_empty_metadata_file_is_indeterminate(tmp_path):
    """A crash mid-write can leave an existing but EMPTY _METADATA file;
    layout detection must fall through (None / fallback), not conclude
    'no opt_state' from the empty string."""
    import os

    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, _opt_state_for(fused=True), force=True)
    assert mgr.saved_uses_fused_layout() is True
    step_dir = os.path.join(mgr.directory, "1")
    for name in ("default", "state"):
        path = os.path.join(step_dir, name, "_METADATA")
        if os.path.exists(path):
            open(path, "w").close()  # truncate
    # empty file carries no layout info: detection reports indeterminate
    # (item_metadata fallback) rather than a confident wrong answer
    assert mgr.saved_uses_fused_layout() in (None, True)
    assert mgr.saved_uses_fused_layout() is not False


def test_template_master_detection_sees_dict_nested_state():
    """_template_uses_master_layout must find MasterWeightsState below a
    dict-valued wrapper (e.g. an inner_states mapping), same as the
    fused-layout walker."""
    from xpretrain_tpu.optim.optimizer import MasterWeightsState
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    nested = {"opt_state": ({"group": MasterWeightsState(master={"w": 1}, inner=())},)}
    assert CheckpointManager._template_uses_master_layout(nested) is True
    plain = {"opt_state": ({"group": ("no", "masters")},)}
    assert CheckpointManager._template_uses_master_layout(plain) is False


def test_step_already_exists_retry_backs_off(tmp_path, monkeypatch):
    """A raced StepAlreadyExistsError is retried (not a structural fast-fail)
    and the retry goes through the backoff sleep — a tight spin would burn
    the whole retry budget in milliseconds if the delete keeps failing."""
    from xpretrain_tpu.train.checkpoints import CheckpointManager

    class StepAlreadyExistsError(ValueError):
        pass

    mgr = CheckpointManager(str(tmp_path / "ckpt"), retries=5)
    real_save = mgr._mgr.save
    calls = {"n": 0}
    sleeps: list[float] = []

    def racing_save(step, args=None, force=False):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise StepAlreadyExistsError(f"step {step} already exists")
        return real_save(step, args=args, force=force)

    monkeypatch.setattr(mgr._mgr, "save", racing_save)
    monkeypatch.setattr("xpretrain_tpu.train.checkpoints.time.sleep", sleeps.append)
    mgr.save(1, {"w": np.ones(4, np.float32)})
    assert calls["n"] == 3 and mgr.latest_step() == 1
    assert len(sleeps) == 2  # each failed attempt backed off


def test_generic_trainer_adapts_fused_layout_on_resume(tmp_path):
    """GenericTrainer must follow the checkpoint's optimizer-state layout
    instead of failing when the configured --fused_adamw differs."""
    from xpretrain_tpu.config import ConfigDict
    from xpretrain_tpu.train.generic_trainer import GenericTrainer

    params = {"w": np.ones((4,), np.float32)}

    def apply_fn(p, batch, rng):
        return {"loss": jnp.mean(jnp.square(p["w"] - batch["x"].mean()))}

    def loader():
        while True:
            yield {"x": np.full((8, 2), 2.0, np.float32)}

    base = dict(
        num_train_steps=2, learning_rate=1e-2, decay="constant", warmup_ratio=0.0,
        output_dir=str(tmp_path), log_steps=10, valid_steps=100, save_steps=1,
        seed=0, zero2=False,
    )
    t1 = GenericTrainer(ConfigDict(fused_adamw=False, **base), apply_fn, params, loader())
    t1.train()  # saves a multi_transform-layout checkpoint at steps 1, 2

    # resume with the (new) fused default: must auto-adopt the legacy layout
    cfg2 = ConfigDict(fused_adamw=True, num_train_steps=3, **{
        k: v for k, v in base.items() if k != "num_train_steps"})
    t2 = GenericTrainer(cfg2, apply_fn, params, loader())
    state = t2.train()
    assert int(state.step) == 3


def test_async_checkpoint_poll_releases_host_copy(tmp_path):
    """poll() must drop the pinned host state copy once the async write
    lands (r3 advisor: _last_async held params + both Adam moments —
    multiple GB on the large families — for the whole save interval)."""
    import time as _time

    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=True)
    mgr.save(1, {"w": np.ones(4, np.float32)}, force=True)
    assert mgr._last_async is not None  # pinned while in flight
    for _ in range(100):
        mgr.poll()
        if mgr._last_async is None:
            break
        _time.sleep(0.1)
    assert mgr._last_async is None, "poll never released the host copy"
    mgr.close()
    restored = mgr.restore({"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(restored["w"], np.ones(4, np.float32))


def test_restore_mismatch_not_misdiagnosed_as_fused_layout(tmp_path):
    """A param-shape mismatch on resume must surface as itself — NOT as
    '--fused_adamw N' advice — when the saved and current optimizer
    layouts agree (r3 advisor: any restore failure was rewrapped)."""
    import pytest as _pytest

    from xpretrain_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, _opt_state_for(fused=True), force=True)
    # same (fused) optimizer layout, different PARAM tree: model-config
    # change adding a module — a structure mismatch orbax rejects
    bad = _opt_state_for(fused=True)
    bad = bad.replace(params={**bad.params, "extra": {"kernel": np.ones((2, 2), np.float32)}})
    with _pytest.raises(Exception) as ei:
        mgr.restore(bad)
    assert "--fused_adamw" not in str(ei.value)
