"""Coverage for small utilities: profiling, config merge, logging, basic IO."""

import json
import time

import numpy as np

from xpretrain_tpu.config import ConfigDict, deep_update, load_config_file
from xpretrain_tpu.utils.basic import AverageMeter, chunk_list, flat_list_of_lists
from xpretrain_tpu.utils.logging import NoOp, RunningMeter, ScalarWriter
from xpretrain_tpu.utils.profiling import StepTimer, flops_estimate


def test_step_timer_skips_compiles():
    t = StepTimer(skip=1)
    t.tick()
    time.sleep(0.05)  # "compile" step, skipped
    t.tick()
    time.sleep(0.01)
    t.tick()
    s = t.summary(items_per_step=4)
    assert 0.005 < s["mean_s"] < 0.05
    assert s["items_per_s"] > 50


def test_flops_estimate_matmul():
    import jax.numpy as jnp

    def f(a, b):
        return a @ b

    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    fl = flops_estimate(f, a, b)
    # 2*M*N*K = 2*64*32*128 = 524288 (0 allowed if backend lacks analysis)
    assert fl == 0 or abs(fl - 524288) / 524288 < 0.5


def test_config_dict_merge_and_paths(tmp_path):
    base = ConfigDict(a=1, nested=dict(x=1, y=2))
    deep_update(base, {"nested": {"y": 3, "z": 4}, "b": 5})
    assert base.nested.y == 3 and base.nested.x == 1 and base.nested.z == 4
    assert base.get_path("nested.z") == 4
    assert base.get_path("nested.missing", "dflt") == "dflt"
    p = tmp_path / "c.json"
    p.write_text(json.dumps(base.to_dict()))
    loaded = load_config_file(str(p))
    assert loaded.nested.z == 4


def test_running_meter_nan_guard():
    m = RunningMeter("loss", smooth=0.5)
    m(2.0)
    m(float("nan"))  # ignored
    m(4.0)
    assert np.isclose(m.val, 3.0)


def test_scalar_writer(tmp_path):
    w = ScalarWriter(str(tmp_path), process_index=0, flush_every=2)
    w.log_scalar("a", 1.0, step=1)
    w.log_scalar_dict({"b": 2.0}, prefix="train", step=2)
    w.close()
    rows = [json.loads(line) for line in open(tmp_path / "scalars.jsonl")]
    assert {r["tag"] for r in rows} == {"a", "train/b"}
    # off-rank0 writer is a no-op
    w2 = ScalarWriter(str(tmp_path), process_index=1)
    w2.log_scalar("c", 1.0)
    w2.close()
    rows2 = [json.loads(line) for line in open(tmp_path / "scalars.jsonl")]
    assert len(rows2) == 2


def test_noop_and_meters():
    n = NoOp()
    assert n.anything(1, key=2) is None
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert np.isclose(m.avg, 3.5)
    assert flat_list_of_lists([[1, 2], [3]]) == [1, 2, 3]
    assert chunk_list([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
