"""Two-REAL-process distributed execution test (round-3 verdict #3).

Launches ``tests/_mp_worker.py`` as two OS processes joined through a
``jax.distributed`` coordinator on localhost (4 virtual CPU devices each),
and once as a single process with 8 devices. The cross-process collective
path — ZeRO-2 optimizer state sharded across processes, the contrastive
all_gather, per-process loader sharding, and the eval feature gather + trim
— must produce losses and retrieval metrics identical to the single-process
run (the reference's ``horovodrun -np N`` mode,
``hd-vila/src/utils/distributed.py:206-245``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _base_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _load(out_dir, pid):
    with open(os.path.join(out_dir, f"result_{pid}.json")) as f:
        return json.load(f)


def test_two_process_matches_single_process(tmp_path):
    # ---- 2 real processes, 4 devices each, localhost coordinator ----
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    port = _free_port()
    procs = []
    for pid in range(2):
        env = _base_env(4)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(mp_dir)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    # ---- single process, 8 devices (the baseline everything else tests) ----
    sp_dir = tmp_path / "sp"
    sp_dir.mkdir()
    sp = subprocess.run(
        [sys.executable, WORKER, str(sp_dir)],
        env=_base_env(8), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=600,
    )
    assert sp.returncode == 0, f"single-process worker failed:\n{sp.stdout[-4000:]}"

    r0, r1, rs = _load(mp_dir, 0), _load(mp_dir, 1), _load(sp_dir, 0)
    assert r0["process_count"] == 2 and rs["process_count"] == 1

    # both ranks observe the same replicated losses/metrics
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=0, atol=0)
    assert r0["t2v"] == r1["t2v"]

    # the 2-process run reproduces the single-process trajectory: the global
    # train batch is a row permutation (strided loader shard), and the
    # contrastive loss/update are permutation invariant
    np.testing.assert_allclose(r0["losses"], rs["losses"], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(r0["logit_scale"], rs["logit_scale"], rtol=1e-5)
    for block in ("t2v", "v2t", "t2v_dsl"):
        for k, v in rs[block].items():
            np.testing.assert_allclose(
                r0[block][k], v, rtol=0, atol=1e-9,
                err_msg=f"{block}/{k} differs between 1- and 2-process runs",
            )
    assert len(r0["losses"]) == 3 and all(np.isfinite(r0["losses"]))
