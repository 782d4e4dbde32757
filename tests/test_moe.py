"""Expert parallelism (parallel/moe.py): routing semantics, parity with an
explicit per-expert loop, gradient coverage, and the SPMD dp×ep surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xpretrain_tpu.parallel.mesh import DATA_AXIS, create_mesh
from xpretrain_tpu.parallel.moe import (
    EXPERT_AXIS,
    MoeFfn,
    _topk_dispatch,
    moe_param_shardings,
)


def _init(model, x, seed=0):
    return model.init(jax.random.PRNGKey(seed), x)


def _dense_reference(params, x, k, activation):
    """Per-token python-loop computation of the same MoE (no capacity
    drops): y_t = sum over the token's top-k experts of gate_e * MLP_e(x_t),
    with Switch (k=1: raw prob) / GShard (k>1: renormalized) gating."""
    p = params["params"]
    router, w1, b1, w2, b2 = (p["router"], p["w1"], p["b1"], p["w2"], p["b2"])
    T, d = x.shape
    logits = x @ router
    probs = jax.nn.softmax(logits, axis=-1)
    y = np.zeros((T, d), np.float32)
    for t in range(T):
        pr = np.asarray(probs[t])
        picks = np.argsort(-pr)[:k]
        gates = pr[picks]
        if k > 1:
            gates = gates / gates.sum()
        for e, g in zip(picks, gates):
            h = np.asarray(activation(x[t] @ w1[e] + b1[e]))
            y[t] += g * (h @ w2[e] + b2[e])
    return y


@pytest.mark.parametrize("k", [1, 2])
def test_moe_matches_per_expert_loop(k):
    """Dense einsum dispatch == explicit per-expert computation when no
    token is dropped (ample capacity)."""
    T, d, E, f = 24, 16, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (T, d), jnp.float32)
    model = MoeFfn(num_experts=E, d_ff=f, num_selected=k, capacity_factor=8.0)
    params = _init(model, x)
    y, aux = model.apply(params, x)
    expected = _dense_reference(params, x, k, model.activation)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-5, atol=2e-5)
    assert float(aux) > 0.0


def test_moe_capacity_drops_tokens():
    """Over-capacity tokens contribute zero output (Switch drop semantics:
    the caller's residual path carries them)."""
    T, d, E = 16, 8, 2
    x = jax.random.normal(jax.random.PRNGKey(2), (T, d), jnp.float32)
    # capacity 1: at most E tokens total can be routed
    model = MoeFfn(num_experts=E, d_ff=16, capacity_factor=E / T)
    params = _init(model, x)
    y, _ = model.apply(params, x)
    zero_rows = np.sum(~np.any(np.asarray(y) != 0.0, axis=-1))
    assert zero_rows >= T - 2 * E  # all but ~capacity*E rows dropped


def test_topk_dispatch_masks_are_consistent():
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (12, 4)))
    dispatch, combine = _topk_dispatch(probs, 2, capacity=6)
    d = np.asarray(dispatch)
    # each (e, c) slot holds at most one token
    assert (d.sum(axis=0) <= 1.0 + 1e-6).all()
    # each token routed to at most k distinct experts, one slot each
    assert (d.sum(axis=(1, 2)) <= 2.0 + 1e-6).all()
    # combine is gate-weighted dispatch
    assert (np.asarray(combine)[d == 0] == 0).all()


@pytest.mark.slow
def test_moe_all_experts_receive_gradients():
    """With balanced random routing every expert's weights must train, and
    the router must receive main-loss gradient through the gate."""
    T, d, E = 64, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(4), (T, d), jnp.float32)
    model = MoeFfn(num_experts=E, d_ff=32, capacity_factor=2.0)
    params = _init(model, x)

    def loss_fn(p):
        y, aux = model.apply(p, x)
        return jnp.mean(y**2) + 0.01 * aux

    grads = jax.grad(loss_fn)(params)["params"]
    per_expert = np.asarray(jnp.sum(jnp.abs(grads["w1"]), axis=(1, 2)))
    assert (per_expert > 0).all(), per_expert
    assert float(jnp.sum(jnp.abs(grads["router"]))) > 0


def test_moe_spmd_dp_ep_matches_single_device():
    """dp=4 × ep=2 pjit forward equals the unsharded forward, with expert
    weights actually placed on the expert axis."""
    T, d, E = 32, 16, 4
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (T, d)), np.float32)
    model = MoeFfn(num_experts=E, d_ff=32, capacity_factor=4.0,
                   expert_axis=EXPERT_AXIS)
    ref_model = MoeFfn(num_experts=E, d_ff=32, capacity_factor=4.0)
    params = _init(ref_model, x)
    y_ref, _ = ref_model.apply(params, x)

    mesh = create_mesh((4, 2), (DATA_AXIS, EXPERT_AXIS))
    shardings = moe_param_shardings(params, mesh)
    sharded_params = jax.device_put(params, shardings)
    w1_spec = shardings["params"]["w1"].spec
    assert w1_spec[0] == EXPERT_AXIS

    from jax.sharding import NamedSharding, PartitionSpec as P

    with mesh:
        y, aux = jax.jit(model.apply, in_shardings=(shardings, NamedSharding(mesh, P(DATA_AXIS))))(
            sharded_params, jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
        )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-5)


def test_moe_spmd_train_step_runs():
    """One fwd+bwd+sgd step over the dp×ep mesh executes and is finite."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    T, d, E = 32, 16, 4
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (T, d)), np.float32)
    mesh = create_mesh((4, 2), (DATA_AXIS, EXPERT_AXIS))
    model = MoeFfn(num_experts=E, d_ff=32, capacity_factor=2.0,
                   expert_axis=EXPERT_AXIS, mesh=mesh)
    params = _init(model, x)
    shardings = moe_param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
    xb = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))

    @jax.jit
    def step(p, xx):
        def loss_fn(pp):
            y, aux = model.apply(pp, xx)
            return jnp.mean((y - xx) ** 2) + 0.01 * aux

        loss, g = jax.value_and_grad(loss_fn)(p)
        return loss, jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, p, g)

    with mesh:
        loss1, params = step(params, xb)
        loss2, params = step(params, xb)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)
