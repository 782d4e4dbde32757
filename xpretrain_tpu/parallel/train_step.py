"""pjit train/eval step factory: SPMD data parallelism + global contrastive batch.

TPU-native replacement for the reference's distributed training plumbing:

- Horovod ``DistributedOptimizer`` + explicit ``hvd.allgather`` of features
  (``CLIP-ViP/src/pretrain/run_pretrain.py:226-232, 344-353``) become a
  single jit-compiled SPMD program: the batch is sharded over the ``data``
  mesh axis, the loss is written on the *global* (logically unsharded)
  feature arrays, and XLA's partitioner inserts the ``all_gather`` over ICI —
  with gradients flowing through it exactly like LF-VILA's ``SyncFunction``
  (``LF-VILA/src/utils/dist.py:21-41``) but without any hand-written
  autograd.
- Gradient averaging across devices is implicit in the sharded mean loss
  (the ``optimizer.synchronize()`` allreduce of the reference).
- DeepSpeed ZeRO-2 optimizer-state partitioning
  (``LF-VILA/src/configs/pretrain_stage1.yaml:98-128``) becomes a sharding
  annotation: Adam moments are sharded over ``data`` along each leaf's first
  divisible axis (:func:`zero2_state_shardings`), letting XLA emit
  reduce-scatter/all-gather pairs around the update.
- apex AMP O2 is replaced by bf16 compute / fp32 params; no loss scaler.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xpretrain_tpu.optim.optimizer import clamp_logit_scale
from xpretrain_tpu.parallel.mesh import DATA_AXIS

Array = jax.Array


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


def zero2_state_shardings(
    tx: optax.GradientTransformation, params: Any, mesh: Mesh, min_size: int = 16384
) -> Any:
    """Sharding tree for the optimizer state: ZeRO-2-equivalent partitioning.

    Each state leaf is sharded over the ``data`` axis along its first
    dimension divisible by the axis size (Adam moments share param shapes);
    small or indivisible leaves stay replicated.
    """
    n = mesh.shape[DATA_AXIS]
    state_shapes = jax.eval_shape(tx.init, params)

    def shard(leaf):
        shape = getattr(leaf, "shape", ())
        if getattr(leaf, "size", 0) >= min_size:
            for dim, extent in enumerate(shape):
                if extent % n == 0 and extent >= n:
                    spec = [None] * len(shape)
                    spec[dim] = DATA_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(shard, state_shapes)


def contrastive_loss_from_outputs(outputs: dict, loss_fn: Callable) -> Array:
    """Dispatch model outputs into a loss-zoo function by its signature kind."""
    kind = getattr(loss_fn, "signature_kind", "pair_scale")
    if kind == "pair_temp":
        return loss_fn(outputs["vis_features"], outputs["text_features"])
    if kind == "pair_scale":
        return loss_fn(outputs["vis_features"], outputs["text_features"], outputs["logit_scale"])
    if kind == "quad_scale":
        return loss_fn(
            outputs["vis_features"],
            outputs["text_features"],
            outputs.get("img_features", outputs["vis_features"]),
            outputs.get("cap_features", outputs["text_features"]),
            outputs["logit_scale"],
        )
    raise ValueError(f"unknown loss signature {kind!r}")


def _scan_steps(step_fn: Callable) -> Callable:
    """Lift ``step(state, batch, rng)`` to K chained steps in one program.

    ``multi(state, batches, rng)`` scans ``step_fn`` over batches stacked on
    a leading K axis; metrics come back with a leading K. One dispatch per K
    steps amortizes host-side argument marshalling — measured worth ~25% on
    the tunneled v5e where per-call dispatch of a 600-leaf state tree costs
    tens of ms (PERF.md "dispatch overhead"); on a local host it still
    removes the per-step Python/dispatch floor.
    """

    def multi(state, batches: dict, rng):
        def body(carry, batch):
            st, r = carry
            r, step_rng = jax.random.split(r)
            st, metrics = step_fn(st, batch, step_rng)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    return multi


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable,
    logit_scale_max: float = 5.2983,
    donate: bool = True,
    opt_state_shardings: Any = None,
    param_shardings: Any = None,
    extra_metrics_fn: Optional[Callable[[dict], dict]] = None,
    steps_per_call: int = 1,
):
    """Build the jitted SPMD train step.

    ``apply_fn(params, batch, rng) -> outputs-dict`` must return the feature
    dict consumed by ``loss_fn`` (see :func:`contrastive_loss_from_outputs`).
    Returns ``step(state, batch, rng) -> (state, metrics)`` with batch
    sharded over data, params/state replicated (or ZeRO-2-sharded when
    ``opt_state_shardings`` is given, tensor-parallel when
    ``param_shardings`` is — see :mod:`parallel.tensor_parallel`).

    ``steps_per_call > 1``: the returned function takes batches stacked on a
    leading K axis and runs K optimizer steps in one dispatch
    (:func:`_scan_steps`); metrics gain a leading K axis.
    """
    replicated = NamedSharding(mesh, P())
    if steps_per_call > 1:
        batch_sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    else:
        batch_sharded = NamedSharding(mesh, P(DATA_AXIS))

    def step_fn(state: TrainState, batch: dict, rng: Array):
        # clamp before forward, as the reference does each iteration
        params = clamp_logit_scale(state.params, logit_scale_max)

        def compute_loss(p):
            outputs = apply_fn(p, batch, rng)
            loss = contrastive_loss_from_outputs(outputs, loss_fn)
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(compute_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        params = clamp_logit_scale(params, logit_scale_max)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "logit_scale": outputs.get("logit_scale", jnp.zeros(())),
        }
        if extra_metrics_fn is not None:
            metrics.update(extra_metrics_fn(outputs))
        return new_state, metrics

    state_shardings = TrainState(
        step=replicated,
        params=param_shardings if param_shardings is not None else replicated,
        opt_state=opt_state_shardings if opt_state_shardings is not None else replicated,
    )

    return jax.jit(
        _scan_steps(step_fn) if steps_per_call > 1 else step_fn,
        in_shardings=(state_shardings, batch_sharded, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_model_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_key: str = "loss",
    metric_keys: tuple[str, ...] = (),
    donate: bool = True,
    opt_state_shardings: Any = None,
    param_shardings: Any = None,
    steps_per_call: int = 1,
):
    """Train step for models that compute their own loss (LF-VILA, HD-VILA).

    ``apply_fn(params, batch, rng) -> outputs`` must include ``loss_key``;
    ``metric_keys`` are copied (stop-gradient) into the metrics dict.
    Sharding layout matches :func:`make_train_step`, including the
    ``steps_per_call`` stacked-batch mode.
    """
    replicated = NamedSharding(mesh, P())
    if steps_per_call > 1:
        batch_sharded = NamedSharding(mesh, P(None, DATA_AXIS))
    else:
        batch_sharded = NamedSharding(mesh, P(DATA_AXIS))

    def step_fn(state: TrainState, batch: dict, rng: Array):
        def compute_loss(p):
            outputs = apply_fn(p, batch, rng)
            return outputs[loss_key].astype(jnp.float32), outputs

        (loss, outputs), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        for key in metric_keys:
            if key in outputs:
                metrics[key] = jax.lax.stop_gradient(outputs[key])
        return new_state, metrics

    state_shardings = TrainState(
        step=replicated,
        params=param_shardings if param_shardings is not None else replicated,
        opt_state=opt_state_shardings if opt_state_shardings is not None else replicated,
    )
    return jax.jit(
        _scan_steps(step_fn) if steps_per_call > 1 else step_fn,
        in_shardings=(state_shardings, batch_sharded, replicated),
        out_shardings=(state_shardings, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(apply_fn: Callable, mesh: Mesh, param_shardings: Any = None):
    """Jitted forward: sharded batch in, fully-gathered features out.

    The out_shardings=replicated forces the cross-device gather of eval
    features (the reference's per-batch ``hvd.allgather`` at
    ``run_video_retrieval.py:137-138``) to happen on-device over ICI.
    Pass ``param_shardings`` when the trained params are tensor-parallel so
    eval consumes them in place instead of gathering every weight.
    """
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(DATA_AXIS))

    def eval_fn(params: Any, batch: dict):
        return apply_fn(params, batch, None)

    return jax.jit(
        eval_fn,
        in_shardings=(
            param_shardings if param_shardings is not None else replicated,
            batch_sharded,
        ),
        out_shardings=replicated,
    )
