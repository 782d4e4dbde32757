"""SPMD train-step semantics on the 8-device virtual CPU mesh.

The key property ported from the reference: the contrastive loss must see the
GLOBAL batch (post-allgather), with gradients flowing through the gather —
verified by comparing the 8-way-sharded loss against a single-device
computation of the same global batch.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from xpretrain_tpu.ops.losses import build_loss_fn
from xpretrain_tpu.optim import build_optimizer, get_schedule
from xpretrain_tpu.parallel.mesh import create_mesh, shard_host_batch
from xpretrain_tpu.parallel.train_step import (
    TrainState,
    make_eval_step,
    make_train_step,
    zero2_state_shardings,
)


class TinyDual(nn.Module):
    dim: int = 16

    @nn.compact
    def __call__(self, video, text):
        enc_v = nn.Dense(self.dim, name="vis")(video)
        enc_t = nn.Dense(self.dim, name="txt")(text)
        norm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        scale = self.param("logit_scale", lambda *_: jnp.asarray(2.0), ())
        return {"vis_features": norm(enc_v), "text_features": norm(enc_t), "logit_scale": scale}


def _setup(grad_accum=1, zero2=False):
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    model = TinyDual()
    rng = np.random.default_rng(0)
    video = rng.normal(size=(16, 32)).astype(np.float32)
    text = rng.normal(size=(16, 24)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video), jnp.asarray(text))["params"]
    sched = get_schedule("linear", 1e-2, 100, warmup_ratio=0.0)
    tx, _ = build_optimizer(params, sched, weight_decay=0.0, grad_accum_steps=grad_accum)
    loss_fn = build_loss_fn("NCELearnableTempLoss")

    def apply_fn(p, batch, rng):
        return model.apply({"params": p}, batch["video"], batch["text"])

    opt_shardings = zero2_state_shardings(tx, params, mesh, min_size=8) if zero2 else None
    # donate=False: tests reuse the input params after stepping
    step = make_train_step(
        apply_fn, tx, mesh, loss_fn, opt_state_shardings=opt_shardings, donate=False
    )
    state = TrainState.create(params, tx)
    batch = shard_host_batch({"video": video, "text": text}, mesh)
    return mesh, model, params, loss_fn, step, state, batch, (video, text)


def test_sharded_loss_equals_global_loss():
    mesh, model, params, loss_fn, step, state, batch, (video, text) = _setup()
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    # single-device truth on the full global batch
    out = model.apply({"params": params}, jnp.asarray(video), jnp.asarray(text))
    want = loss_fn(out["vis_features"], out["text_features"], out["logit_scale"])
    np.testing.assert_allclose(float(metrics["loss"]), float(want), rtol=1e-5)
    assert int(new_state.step) == 1


def test_params_update_and_logit_scale_clamped():
    *_, step, state, batch, _ = _setup()
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    assert 0.0 <= float(s1.params["logit_scale"]) <= 5.2983
    # params actually moved
    before_after = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
    )
    assert max(jax.tree_util.tree_leaves(before_after)) > 0


def test_grads_flow_through_gather_match_single_device():
    """Gradient of the global contrastive loss must match non-SPMD autodiff."""
    mesh, model, params, loss_fn, step, state, batch, (video, text) = _setup()

    def loss_of(p):
        out = model.apply({"params": p}, jnp.asarray(video), jnp.asarray(text))
        return loss_fn(out["vis_features"], out["text_features"], out["logit_scale"])

    want_grads = jax.grad(loss_of)(params)
    # one SGD-free probe: recompute grads inside the sharded step via optax sgd
    tx = optax.sgd(1.0)
    probe = make_train_step(
        lambda p, b, r: model.apply({"params": p}, b["video"], b["text"]),
        tx,
        mesh,
        loss_fn,
        donate=False,
    )
    s0 = TrainState.create(params, tx)
    s1, _ = probe(s0, batch, jax.random.PRNGKey(0))
    # params_new = clamp(params - grad) -> grad = params - params_new (mod clamp)
    got = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), s0.params, s1.params)
    for path in (("vis", "kernel"), ("txt", "kernel")):
        w, g = want_grads, got
        for k in path:
            w, g = w[k], g[k]
        np.testing.assert_allclose(g, np.asarray(w), rtol=2e-4, atol=1e-6)


def test_zero2_opt_state_is_sharded():
    mesh, model, params, loss_fn, step, state, batch, _ = _setup(zero2=True)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    shardings = [
        leaf.sharding
        for leaf in jax.tree_util.tree_leaves(s1.opt_state)
        if hasattr(leaf, "sharding") and getattr(leaf, "size", 0) >= 8 and leaf.ndim >= 1
    ]
    assert any("data" in str(s.spec) for s in shardings), "no opt-state leaf sharded over data"


def test_grad_accum_steps():
    mesh, model, params, loss_fn, step, state, batch, _ = _setup(grad_accum=2)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    # first micro-step: params unchanged (accumulating)
    diff = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params)
    assert max(v for p, v in flatten(diff)) == 0.0
    s2, _ = step(s1, batch, jax.random.PRNGKey(2))
    diff2 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.params, s2.params)
    assert max(v for p, v in flatten(diff2)) > 0.0


def flatten(tree):
    return [(jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]]


def test_eval_step_gathers_global_features():
    mesh, model, params, loss_fn, step, state, batch, (video, text) = _setup()
    eval_step = make_eval_step(
        lambda p, b, r: model.apply({"params": p}, b["video"], b["text"]), mesh
    )
    out = eval_step(params, batch)
    assert out["vis_features"].shape == (16, 16)
    want = model.apply({"params": params}, jnp.asarray(video), jnp.asarray(text))
    np.testing.assert_allclose(
        np.asarray(out["vis_features"]), np.asarray(want["vis_features"]), rtol=1e-5
    )


def test_multi_step_dispatch_matches_sequential():
    """steps_per_call=K (one scan-chained dispatch over stacked batches) must
    reproduce K sequential single-step dispatches exactly — same rng-split
    discipline, same state trajectory."""
    mesh, model, params, loss_fn, step1, state, _batch, _ = _setup()

    rng0 = np.random.default_rng(7)
    batches = [
        {"video": rng0.normal(size=(16, 32)).astype(np.float32),
         "text": rng0.normal(size=(16, 24)).astype(np.float32)}
        for _ in range(3)
    ]

    # sequential truth, mirroring the trainer's per-step rng split
    seq_state = state
    rng = jax.random.PRNGKey(5)
    seq_losses = []
    for b in batches:
        rng, step_rng = jax.random.split(rng)
        seq_state, m = step1(seq_state, shard_host_batch(b, mesh), step_rng)
        seq_losses.append(float(m["loss"]))

    sched = get_schedule("linear", 1e-2, 100, warmup_ratio=0.0)
    tx, _ = build_optimizer(seq_state.params, sched, weight_decay=0.0)

    def apply_fn(p, batch, rng):
        return model.apply({"params": p}, batch["video"], batch["text"])

    stepk = make_train_step(apply_fn, tx, mesh, loss_fn, donate=False, steps_per_call=3)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
    stacked = shard_host_batch(stacked, mesh, leading_stack=True)
    k_state, k_metrics = stepk(state, stacked, jax.random.PRNGKey(5))

    np.testing.assert_allclose(np.asarray(k_metrics["loss"]), seq_losses, rtol=1e-5)
    assert int(k_state.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(k_state.params), jax.tree_util.tree_leaves(seq_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
