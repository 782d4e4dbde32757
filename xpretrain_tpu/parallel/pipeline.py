"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

TPU-native extension beyond the reference (which ships only allreduce data
parallelism + ZeRO-2, SURVEY §2.7): the staged BERT towers that dominate the
HD-VILA / LF-VILA step (24 identical post-LN layers,
``hd-vila/src/modeling/Transformers.py:421-529``,
``LF-VILA/src/models/bert.py:557-612``) are a uniform layer stack — exactly
the shape pipeline parallelism wants. Mechanics, following the standard TPU
pipelining recipe (shard_map + ``ppermute`` over ICI neighbours):

- Per-layer parameters are **stacked on a leading L axis** and sharded over
  the ``pipe`` mesh axis, so stage ``i`` holds layers ``[i·L/P, (i+1)·L/P)``
  in its own HBM — an L/P-fold parameter-memory saving per chip, the lever
  that fits BERT-large towers on small-HBM chips without remat.
- The batch is split into M microbatches. Each pipeline tick every stage
  applies its local layers (a ``lax.scan`` over the stacked slice) and passes
  its activation to the next stage with ``lax.ppermute`` — a neighbour-to-
  neighbour ICI transfer, never a global collective. Stage 0 injects
  microbatch ``t`` at tick ``t``; the last stage emits output ``t-(P-1)``;
  total ticks ``M + P - 1`` (P-1 bubble ticks, the GPipe schedule).
- Everything is differentiable (``ppermute`` transposes to the inverse
  permutation), so the same function works under ``jax.grad`` inside a train
  step; gradients w.r.t. the stacked params come back sharded over ``pipe``.
- Composes with data parallelism: on a ``(data, pipe)`` mesh the microbatch
  tensors are additionally sharded over ``data`` and the pipeline runs
  per-data-shard; gradient averaging over ``data`` stays implicit in the
  sharded mean loss (same as :mod:`parallel.train_step`).

The optimizer treats the stacked tree like any other params (Adam is
elementwise, so updating stacked layers is bit-identical to updating them
one by one); :func:`pipeline_param_shardings` gives the matching state
sharding so moments live stage-local too (ZeRO-3-like for the tower).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

PIPE_AXIS = "pipe"


def stack_layer_params(params: dict, n_layers: int, prefix: str = "layer_") -> Any:
    """``{layer_0: t, layer_1: t, ...}`` -> one pytree with leading L axis.

    The per-layer trees must be structurally identical (true for the BERT
    towers: every block is the same post-LN layer).
    """
    layers = [params[f"{prefix}{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked: Any, n_layers: int, prefix: str = "layer_") -> dict:
    """Inverse of :func:`stack_layer_params` (for checkpoint export)."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(n_layers)
    }


def pipeline_param_shardings(stacked: Any, mesh: Mesh, axis: str = PIPE_AXIS) -> Any:
    """Leading-(layer)-axis sharding over ``pipe`` for a stacked tree."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(axis)), stacked
    )


def make_pipeline(
    layer_apply: Callable[[Any, Array, Optional[Array]], Array],
    n_layers: int,
    mesh: Mesh,
    *,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    n_microbatches: Optional[int] = None,
):
    """Build ``fn(stacked_params, hidden, mask) -> hidden`` running the layer
    stack as a P-stage pipeline over ``mesh[pipe_axis]``.

    ``layer_apply(layer_params, hidden, mask)`` applies ONE layer (e.g.
    ``lambda p, h, m: BertLayer(cfg).apply({"params": p}, h, m)``); it must
    be the same function for every layer. ``hidden`` is ``[B, S, H]``; the
    optional additive ``mask`` is ``[B, 1, 1, S]`` (rotated through the
    pipeline alongside the activations so every stage sees the mask of the
    microbatch it is currently processing). ``n_microbatches`` defaults to
    the stage count; it must divide the (per-data-shard) batch.

    Pass ``data_axis`` when the mesh also carries a data axis: microbatch
    tensors are then sharded ``P(None, data_axis, ...)`` and the pipeline
    runs independently per data shard.
    """
    n_stages = mesh.shape[pipe_axis]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by pipe={n_stages}")
    m_default = n_microbatches or n_stages
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def kernel(local_params: Any, x: Array, m: Optional[Array]) -> Array:
        # x: [M, mb, S, H] local to this (data, pipe) device; local_params
        # holds this stage's [L/P, ...] layer slice.
        stage = lax.axis_index(pipe_axis)
        n_micro = x.shape[0]
        state = jnp.zeros_like(x[0])
        smask = None if m is None else jnp.zeros_like(m[0])
        out = jnp.zeros_like(x)

        def run_stage(h: Array, hm: Optional[Array]) -> Array:
            def body(carry, p):
                return layer_apply(p, carry, hm), None

            y, _ = lax.scan(body, h, local_params)
            return y

        for t in range(n_micro + n_stages - 1):
            if t < n_micro:  # stage 0 injects microbatch t
                state = jnp.where(stage == 0, x[t], state)
                if smask is not None:
                    smask = jnp.where(stage == 0, m[t], smask)
            y = run_stage(state, smask)
            out_idx = t - (n_stages - 1)
            if out_idx >= 0:  # last stage emits microbatch out_idx
                out = jnp.where(
                    stage == n_stages - 1, out.at[out_idx].set(y), out
                )
            # neighbour-to-neighbour handoff (ICI point-to-point)
            state = lax.ppermute(y, pipe_axis, perm)
            if smask is not None:
                smask = lax.ppermute(smask, pipe_axis, perm)
        # replicate the finished microbatches from the last stage over pipe
        return lax.psum(
            jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out)), pipe_axis
        )

    mb_batch_spec = (
        P(None, data_axis) if data_axis is not None else P()
    )

    def run(stacked_params: Any, hidden: Array, mask: Optional[Array] = None) -> Array:
        batch = hidden.shape[0]
        n_micro = m_default
        if batch % n_micro:
            raise ValueError(f"batch {batch} not divisible by microbatches {n_micro}")
        mb = batch // n_micro
        x = hidden.reshape(n_micro, mb, *hidden.shape[1:])
        if mask is None:
            fn = shard_map(
                lambda p, xx: kernel(p, xx, None),
                mesh=mesh,
                in_specs=(P(pipe_axis), mb_batch_spec),
                out_specs=mb_batch_spec,
                check_vma=False,
            )
            y = fn(stacked_params, x)
        else:
            m = mask.reshape(n_micro, mb, *mask.shape[1:])
            fn = shard_map(
                kernel,
                mesh=mesh,
                in_specs=(P(pipe_axis), mb_batch_spec, mb_batch_spec),
                out_specs=mb_batch_spec,
                check_vma=False,
            )
            y = fn(stacked_params, x, m)
        return y.reshape(batch, *hidden.shape[1:])

    return run


def pipelined_bert_encoder(
    bert_config,
    mesh: Mesh,
    *,
    dtype=jnp.float32,
    pipe_axis: str = PIPE_AXIS,
    data_axis: Optional[str] = None,
    n_microbatches: Optional[int] = None,
    deterministic: bool = True,
):
    """Pipeline runner for :class:`~xpretrain_tpu.models.bert.BertLayer` stacks.

    Returns ``fn(stacked_params, hidden, additive_mask)`` numerically equal to
    ``StagedBertEncoder(cfg).apply(...)`` over all layers (asserted in
    ``tests/test_pipeline_parallel.py``). Training with dropout inside the
    pipeline is out of scope (pass ``deterministic=True``; the reference
    towers train fine without attention dropout on TPU — documented
    deviation, PARITY.md).
    """
    from xpretrain_tpu.models.bert import BertLayer

    layer = BertLayer(bert_config, dtype=dtype)

    def layer_apply(p, h, m):
        return layer.apply({"params": p}, h, m, deterministic)

    return make_pipeline(
        layer_apply,
        bert_config.num_hidden_layers,
        mesh,
        pipe_axis=pipe_axis,
        data_axis=data_axis,
        n_microbatches=n_microbatches,
    )
