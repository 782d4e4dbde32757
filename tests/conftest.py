"""Test config: force an 8-device virtual CPU platform before JAX import.

This mirrors the reference's absence of multi-node CI by validating pjit /
collective semantics on virtual devices (SURVEY.md §4 test strategy)."""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel);
# tests must run on the virtual 8-device CPU platform, so force-override
# unless the caller explicitly opts into TPU tests with XPT_TEST_TPU=1.
if os.environ.get("XPT_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Some plugin may import jax before this conftest runs; config.update still
    # wins as long as no backend has been initialized yet.
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older JAX: XLA_FLAGS path above covers it

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# build the native ingest library once per session if missing (idempotent)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not os.path.exists(os.path.join(_REPO, "native", "build", "libxvr.so")):
    subprocess.run(["make", "-C", os.path.join(_REPO, "native")], check=False)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
