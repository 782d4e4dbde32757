"""Optimizer grouping + schedule semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xpretrain_tpu.optim import AutoStep, NO_DECAY_LFVILA, build_optimizer, get_schedule
from xpretrain_tpu.optim.optimizer import (
    build_multi_schedule_optimizer,
    clamp_logit_scale,
    param_group_labels,
)


def _params():
    return {
        "vision": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "cnn": {"conv": {"kernel": jnp.ones((2, 8))}},
        "layer_norm": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
        "logit_scale": jnp.ones(()),
        "pos_embed": jnp.ones((3, 4)),
    }


def test_param_group_labels():
    labels = param_group_labels(_params(), lr_mul_prefix="vision")
    assert labels["vision"]["kernel"] == "top_decay"
    assert labels["vision"]["bias"] == "top_no_decay"
    assert labels["cnn"]["conv"]["kernel"] == "base_decay"
    assert labels["layer_norm"]["scale"] == "base_no_decay"
    assert labels["logit_scale"] == "base_no_decay"


def test_lfvila_no_decay_includes_pos_embed():
    labels = param_group_labels(_params(), no_decay_patterns=NO_DECAY_LFVILA)
    assert labels["pos_embed"] == "base_no_decay"


def test_schedules_reference_semantics():
    s = get_schedule("linear", 1.0, 100, warmup_ratio=0.1)
    assert np.isclose(float(s(5)), 0.5)  # warmup
    assert np.isclose(float(s(55)), (100 - 55) / 90)  # linear decay
    assert np.isclose(float(s(1000)), 1e-8)  # floor

    c = get_schedule("cosine", 1.0, 100, warmup_ratio=0.1)
    assert np.isclose(float(c(10)), 1.0)
    assert np.isclose(float(c(100)), 1e-8, atol=1e-7)

    n = get_schedule("invsqrt", 1.0, 10000, warmup_ratio=0.04)
    assert np.isclose(float(n(400)), 1.0)
    assert np.isclose(float(n(1600)), 0.5)

    ms = get_schedule("multi_step", 1.0, 1000, warmup_ratio=0.01,
                      steps_per_epoch=100, decay_epochs=[2, 5], gamma=0.5)
    assert np.isclose(float(ms(150)), 1.0)
    assert np.isclose(float(ms(250)), 0.5)
    # past the final milestone the reference skips the len(milestones)
    # exponent: gamma**(len+1) = 0.125, not 0.25 (sched.py:26-34 quirk)
    assert np.isclose(float(ms(600)), 0.125)


def test_autostep_plateau():
    a = AutoStep(tolerance=2, gamma=0.1)
    for score in [10.0, 9.0, 8.0, 7.0]:  # 3 consecutive non-improvements
        a.step(score)
    assert np.isclose(a.coeff, 0.1)
    assert np.isclose(a.get_lr(100, 1.0, 100, warmup_ratio=0.0), 0.1)


def test_multi_schedule_optimizer_lrs():
    params = _params()
    s_fast = lambda step: jnp.asarray(1e-2)
    s_slow = lambda step: jnp.asarray(1e-4)
    tx, labels = build_multi_schedule_optimizer(
        params,
        {"cnn": (("cnn",), s_slow)},
        default_schedule=s_fast,
        weight_decay=0.0,
        max_grad_norm=None,
    )
    assert labels["cnn"]["conv"]["kernel"] == "cnn_decay"
    assert labels["vision"]["kernel"] == "default_decay"
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # adam normalizes grad ~1 -> |update| ~ lr
    assert abs(float(updates["cnn"]["conv"]["kernel"][0, 0])) < 1e-3
    assert abs(float(updates["vision"]["kernel"][0, 0])) > 1e-3


def test_frozen_patterns_zero_updates():
    params = _params()
    sched = get_schedule("constant", 1e-2, 10)
    tx, labels = build_optimizer(
        params, sched, weight_decay=0.0, frozen_patterns=("cnn",), max_grad_norm=None
    )
    assert labels["cnn"]["conv"]["kernel"] == "frozen"
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["cnn"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["vision"]["kernel"]).max()) > 0.0


def test_clamp_logit_scale():
    params = {"logit_scale": jnp.asarray(9.0), "other": jnp.asarray(9.0)}
    out = clamp_logit_scale(params)
    assert np.isclose(float(out["logit_scale"]), 5.2983)
    assert float(out["other"]) == 9.0


def test_grad_accum_multisteps():
    params = {"w": jnp.ones((2,))}
    sched = get_schedule("constant", 1e-2, 10)
    tx, _ = build_optimizer(params, sched, weight_decay=0.0, grad_accum_steps=3)
    state = tx.init(params)
    g = {"w": jnp.ones((2,))}
    p = params
    for i in range(3):
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
        moved = float(jnp.abs(p["w"] - params["w"]).max())
        if i < 2:
            assert moved == 0.0
    assert moved > 0.0


def test_fused_matches_multi_transform():
    """fused_grouped_adamw must be numerically identical to the optax
    chain(clip_by_global_norm, multi_transform(4x adamw)) composition over a
    multi-step trajectory with lr-mul, frozen groups, and clipping both
    triggered and not."""
    params = _params()
    sched = get_schedule("cosine", 1e-2, 50, warmup_ratio=0.1)
    kwargs = dict(
        weight_decay=0.1, lr_mul=2.0, lr_mul_prefix="vision",
        frozen_patterns=("cnn",), max_grad_norm=2.0,
    )
    tx_f, labels = build_optimizer(params, sched, fused=True, **kwargs)
    tx_m, _ = build_optimizer(params, sched, fused=False, **kwargs)

    sf, sm = tx_f.init(params), tx_m.init(params)
    # frozen leaves carry scalar placeholder moments instead of masked nodes
    assert sf.mu["cnn"]["conv"]["kernel"].ndim == 0
    pf = pm = params
    rng = np.random.default_rng(0)
    for step in range(4):
        scale = 100.0 if step == 1 else 0.01  # trip the norm clip once
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape) * scale, p.dtype), params
        )
        uf, sf = tx_f.update(grads, sf, pf)
        um, sm = tx_m.update(grads, sm, pm)
        pf = optax.apply_updates(pf, uf)
        pm = optax.apply_updates(pm, um)
        for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(pm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    # frozen leaf never moved
    np.testing.assert_array_equal(
        np.asarray(pf["cnn"]["conv"]["kernel"]), np.asarray(params["cnn"]["conv"]["kernel"])
    )


def test_fused_no_clip_and_accum():
    params = _params()
    sched = get_schedule("constant", 1e-2, 10)
    tx_f, _ = build_optimizer(params, sched, weight_decay=0.0, max_grad_norm=None, fused=True)
    tx_m, _ = build_optimizer(params, sched, weight_decay=0.0, max_grad_norm=None, fused=False)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    uf, _ = tx_f.update(g, tx_f.init(params), params)
    um, _ = tx_m.update(g, tx_m.init(params), params)
    for a, b in zip(jax.tree_util.tree_leaves(uf), jax.tree_util.tree_leaves(um)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)
    # MultiSteps wrapping still works on the fused transform
    tx_acc, _ = build_optimizer(params, sched, weight_decay=0.0, grad_accum_steps=2, fused=True)
    state = tx_acc.init(params)
    u1, state = tx_acc.update(g, state, params)
    assert float(jnp.abs(u1["vision"]["kernel"]).max()) == 0.0
    u2, state = tx_acc.update(g, state, params)
    assert float(jnp.abs(u2["vision"]["kernel"]).max()) > 0.0


def test_moment_dtype_bf16_state_and_trajectory():
    """bf16 moment storage: state dtypes reduced, trajectory tracks fp32."""
    from xpretrain_tpu.optim.optimizer import moment_dtype_from_cfg

    assert moment_dtype_from_cfg({"moment_dtype": "bf16"}) == jnp.bfloat16
    assert moment_dtype_from_cfg({"moment_dtype": "fp32"}) is None
    assert moment_dtype_from_cfg({}) is None

    params = _params()
    sched = get_schedule("constant", 1e-2, 10)
    tx32, _ = build_optimizer(params, sched, weight_decay=0.01, fused=True)
    tx16, _ = build_optimizer(
        params, sched, weight_decay=0.01, fused=True, moment_dtype=jnp.bfloat16
    )
    s16 = tx16.init(params)
    assert s16.mu["vision"]["kernel"].dtype == jnp.bfloat16
    assert s16.nu["vision"]["kernel"].dtype == jnp.bfloat16
    # frozen-style empty moments keep working
    p32 = p16 = params
    s32 = tx32.init(params)
    rng = np.random.default_rng(1)
    for _ in range(8):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape) * 0.1, p.dtype), params
        )
        u32, s32 = tx32.update(grads, s32, p32)
        u16, s16 = tx16.update(grads, s16, p16)
        p32 = optax.apply_updates(p32, u32)
        p16 = optax.apply_updates(p16, u16)
    for a, b in zip(jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(p16)):
        # storage-precision-only difference: trajectories stay close
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-3)
    # update dtype follows the param dtype
    assert u16["vision"]["kernel"].dtype == params["vision"]["kernel"].dtype


def test_moment_dtype_requires_fused():
    import pytest

    params = _params()
    sched = get_schedule("constant", 1e-2, 10)
    with pytest.raises(ValueError, match="fused"):
        build_optimizer(params, sched, fused=False, moment_dtype=jnp.bfloat16)


def test_cast_params_for_storage():
    from xpretrain_tpu.optim import cast_params_for_storage, param_dtype_from_cfg

    assert param_dtype_from_cfg({"param_dtype": "bf16"}) == jnp.bfloat16
    assert param_dtype_from_cfg({}) is None
    tree = {
        "w": jnp.ones((4, 4)),
        "b": jnp.ones((4,)),
        "scalar": jnp.ones(()),
        "ids": jnp.ones((3, 3), jnp.int32),
    }
    cast = cast_params_for_storage(tree, jnp.bfloat16)
    assert cast["w"].dtype == jnp.bfloat16  # big matrices reduced
    assert cast["b"].dtype == jnp.float32  # 1-D stays full precision
    assert cast["scalar"].dtype == jnp.float32
    assert cast["ids"].dtype == jnp.int32  # non-float untouched


def test_master_weights_exact_fp32_trajectory_and_invariant():
    """bf16 stored params + fp32 masters: the master trajectory is
    bit-identical to a pure-fp32 run fed the same gradients, and the stored
    params track ``bf16(master)`` exactly (no round-off drift)."""
    from xpretrain_tpu.optim import cast_params_for_storage, master_weights

    params32 = _params()
    sched = get_schedule("constant", 1e-2, 100)
    params16 = cast_params_for_storage(params32, jnp.bfloat16)
    # fp32 baseline starts from the SAME (bf16-rounded) values
    base32 = jax.tree_util.tree_map(lambda p: p.astype(jnp.float32), params16)

    tx_inner, _ = build_optimizer(
        params32, sched, weight_decay=0.01, max_grad_norm=1.0, fused=True
    )
    tx_mw = master_weights(tx_inner)

    s_mw = tx_mw.init(params16)
    s32 = tx_inner.init(base32)
    # 1-D / scalar leaves stay fp32 and carry a scalar placeholder master
    assert s_mw.master["vision"]["bias"].ndim == 0
    assert s_mw.master["logit_scale"].ndim == 0
    assert s_mw.master["vision"]["kernel"].dtype == jnp.float32

    p16, p32 = params16, base32
    rng = np.random.default_rng(2)
    for _ in range(10):
        g16 = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), p16
        )
        g32 = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), g16)
        u16, s_mw = tx_mw.update(g16, s_mw, p16)
        u32, s32 = tx_inner.update(g32, s32, p32)
        p16 = optax.apply_updates(p16, u16)
        p32 = optax.apply_updates(p32, u32)

    masters = jax.tree_util.tree_map(
        lambda m, p: m if p.dtype == jnp.bfloat16 else p.astype(jnp.float32),
        s_mw.master, p16
    )
    for m, b, stored in zip(
        jax.tree_util.tree_leaves(masters),
        jax.tree_util.tree_leaves(p32),
        jax.tree_util.tree_leaves(p16),
    ):
        # masters follow the fp32 baseline exactly (identical fp32 math)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(b))
        # stored params are exactly the rounded masters — the no-drift invariant
        np.testing.assert_array_equal(
            np.asarray(stored), np.asarray(m.astype(stored.dtype))
        )
    assert p16["vision"]["kernel"].dtype == jnp.bfloat16
    assert p16["vision"]["bias"].dtype == jnp.float32


def test_master_weights_frozen_and_grad_accum():
    """master_weights composes with frozen groups and MultiSteps accum."""
    from xpretrain_tpu.optim import cast_params_for_storage, master_weights

    params32 = _params()
    sched = get_schedule("constant", 1e-2, 100)
    tx_inner, _ = build_optimizer(
        params32, sched, weight_decay=0.0, max_grad_norm=None,
        frozen_patterns=("cnn",), grad_accum_steps=2, fused=True,
    )
    tx = master_weights(tx_inner)
    p = cast_params_for_storage(params32, jnp.bfloat16)
    s = tx.init(p)
    ones = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), p)

    u1, s = tx.update(ones, s, p)
    p_mid = optax.apply_updates(p, u1)
    # first microbatch: accumulation only, no param movement
    for a, b in zip(jax.tree_util.tree_leaves(p_mid), jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    u2, s = tx.update(ones, s, p_mid)
    p_done = optax.apply_updates(p_mid, u2)
    # second microbatch applies the update...
    assert not np.allclose(
        np.asarray(p_done["vision"]["kernel"]), np.asarray(p["vision"]["kernel"])
    )
    # ...except to frozen leaves
    np.testing.assert_array_equal(
        np.asarray(p_done["cnn"]["conv"]["kernel"]),
        np.asarray(p["cnn"]["conv"]["kernel"]),
    )
