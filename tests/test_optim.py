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
