"""Expert parallelism: a mixture-of-experts FFN sharded over an ``expert``
mesh axis (TPU-native extension; the reference has no MoE anywhere).

Completes the framework's parallelism surface — dp (``train_step``), tp
(``tensor_parallel``), ZeRO-2/3 (``train_step``/``fsdp``), pp
(``pipeline``), cp (Swin3D temporal axis), sp (``ops/ring_attention``) —
with the last production axis: **ep**, where the FFN's parameters scale
with the number of experts and each device owns ``E / ep`` of them.

TPU-first design (the GShard/Switch dense-dispatch recipe, not a CUDA
scatter/gather translation):

- **Static shapes end to end.** Routing is top-k with a fixed per-expert
  capacity ``C``; tokens beyond capacity are dropped (their FFN output is
  zero — callers keep the residual connection, matching Switch semantics).
  No data-dependent shapes ever reach XLA.
- **Dispatch is einsum, not scatter.** The [T, E, C] one-hot dispatch and
  combine tensors turn routing into three MXU matmuls
  (``td,tec->ecd`` dispatch, the expert FFN over the E axis,
  ``ecd,tec->td`` combine); XLA's SPMD partitioner lowers the
  data→expert resharding to an all-to-all on ICI.
- **Sharding by annotation.** Expert weights are [E, ...] leaves sharded
  ``P("expert", ...)`` (:func:`moe_param_shardings`); activations get a
  ``with_sharding_constraint`` onto the expert axis between dispatch and
  combine. Everything else is inherited from the surrounding dp/tp layout.

The router computes in fp32 regardless of the model dtype (standard MoE
stability practice), and the Switch load-balancing auxiliary loss is
returned alongside the output for the trainer to weight.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_AXIS = "expert"

Array = jax.Array


def _topk_dispatch(
    probs: Array, k: int, capacity: int
) -> tuple[Array, Array]:
    """Top-k capacity-bounded routing masks.

    ``probs``: [T, E] router probabilities (fp32). Returns
    ``(dispatch, combine)``, both [T, E, C]: ``dispatch`` is the 0/1
    send-token-t-to-slot-(e,c) tensor, ``combine`` additionally carries the
    gate weight. Selections are made greedily (1st choice of every token,
    then 2nd, ...), each pass filling expert slots in token order — the
    deterministic Switch/GShard discipline, all static shapes.
    """
    T, E = probs.shape
    remaining = probs
    fill = jnp.zeros((E,), jnp.int32)  # slots already used per expert
    dispatch = jnp.zeros((T, E, capacity), probs.dtype)
    combine = jnp.zeros((T, E, capacity), probs.dtype)
    for _ in range(k):
        expert = jnp.argmax(remaining, axis=-1)  # [T]
        gate = jnp.take_along_axis(remaining, expert[:, None], axis=-1)[:, 0]
        mask = jax.nn.one_hot(expert, E, dtype=probs.dtype)  # [T, E]
        # position of each token within its expert's queue this pass,
        # offset by slots previous passes already filled
        pos = (jnp.cumsum(mask, axis=0) - 1.0) + fill[None, :].astype(probs.dtype)
        pos = (pos * mask).astype(jnp.int32)
        keep = mask * (pos < capacity).astype(probs.dtype)
        slot = jax.nn.one_hot(pos, capacity, dtype=probs.dtype)  # [T, E, C]
        sel = keep[..., None] * slot
        dispatch = dispatch + sel
        combine = combine + sel * gate[:, None, None]
        fill = fill + jnp.sum(keep, axis=0).astype(jnp.int32)
        remaining = remaining * (1.0 - mask)  # next pass picks a new expert
    return dispatch, combine


def load_balance_loss(probs: Array, dispatch: Array) -> Array:
    """Switch auxiliary loss: E · Σ_e (mean router prob)·(mean routed
    fraction). Minimized (=1) when routing is uniform."""
    E = probs.shape[-1]
    density = jnp.mean(jnp.sum(dispatch, axis=-1), axis=0)  # routed frac per e
    density_proxy = jnp.mean(probs, axis=0)
    return E * jnp.sum(density * density_proxy)


class MoeFfn(nn.Module):
    """Expert-parallel FFN block: router -> dispatch -> per-expert MLP ->
    combine. Drop-in for a dense FFN of width ``d_ff`` with ``num_experts``×
    the parameters at ~constant per-token FLOPs (top-1).

    ``expert_axis``: mesh axis name to constrain the dispatched activations
    to (None = single-device / let XLA choose). Params are [E, ...] leaves
    either way; :func:`moe_param_shardings` places them.
    """

    num_experts: int
    d_ff: int
    num_selected: int = 1  # top-k
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = None
    mesh: Optional[Mesh] = None  # concrete mesh for the sharding constraints
    dtype: Any = jnp.float32
    activation: Callable[[Array], Array] = nn.gelu

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        """x: [..., d_model] -> (y: [..., d_model], aux_loss: scalar)."""
        *lead, d = x.shape
        T = int(math.prod(lead))
        E, k = self.num_experts, self.num_selected
        capacity = max(1, int(math.ceil(k * T / E * self.capacity_factor)))
        xt = x.reshape(T, d)

        router = self.param(
            "router", nn.initializers.lecun_normal(), (d, E), jnp.float32
        )
        w1 = self.param(
            "w1", nn.initializers.lecun_normal(), (E, d, self.d_ff), jnp.float32
        ).astype(self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (E, self.d_ff), jnp.float32)
        w2 = self.param(
            "w2", nn.initializers.lecun_normal(), (E, self.d_ff, d), jnp.float32
        ).astype(self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (E, d), jnp.float32)

        # router in fp32 (stability), gates renormalized over the k picks
        logits = xt.astype(jnp.float32) @ router
        probs = jax.nn.softmax(logits, axis=-1)
        dispatch, combine = _topk_dispatch(probs, k, capacity)
        if k > 1:
            # GShard-style: renormalize the k gates to sum to 1. Top-1 keeps
            # the raw router prob (Switch): scaling by prob is what feeds the
            # main-loss gradient back into the router.
            denom = jnp.sum(combine, axis=(1, 2), keepdims=True)
            combine = combine / jnp.maximum(denom, 1e-9)
        aux = load_balance_loss(probs, dispatch)

        def constrain(t, spec):
            if self.expert_axis is None:
                return t
            # a bare PartitionSpec needs a mesh context at trace time; a
            # concrete mesh makes the constraint context-independent
            if self.mesh is not None:
                spec = NamedSharding(self.mesh, spec)
            return jax.lax.with_sharding_constraint(t, spec)

        # dispatch -> [E, C, d] sharded over the expert axis (XLA inserts the
        # data->expert all-to-all); per-expert MLP is a batched matmul over E
        ein = jnp.einsum(
            "td,tec->ecd", xt.astype(self.dtype), dispatch.astype(self.dtype)
        )
        ein = constrain(ein, P(self.expert_axis, None, None))
        h = self.activation(
            jnp.einsum("ecd,edf->ecf", ein, w1) + b1[:, None, :].astype(self.dtype)
        )
        out_e = jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None, :].astype(self.dtype)
        out_e = constrain(out_e, P(self.expert_axis, None, None))
        y = jnp.einsum("ecd,tec->td", out_e, combine.astype(self.dtype))
        return y.reshape(*lead, d), aux


def moe_pspec(path: str, shape: tuple[int, ...]) -> P:
    """PartitionSpec for one MoE param leaf: expert-major [E, ...] leaves
    shard dim 0 over ``expert``; the router (and anything else) replicates."""
    name = path.rsplit("/", 1)[-1]
    if name in ("w1", "w2", "b1", "b2") and len(shape) >= 1:
        return P(EXPERT_AXIS, *([None] * (len(shape) - 1)))
    return P()


def moe_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a model containing :class:`MoeFfn` blocks:
    expert leaves split over the ``expert`` mesh axis, the rest replicated
    (compose with dp/tp layouts by overriding non-MoE leaves afterwards)."""

    def shard(key_path, leaf):
        path = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in key_path)
        return NamedSharding(mesh, moe_pspec(path, leaf.shape))

    return jax.tree_util.tree_map_with_path(shard, params)
