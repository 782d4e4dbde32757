"""Tensor-parallel (Megatron-style) parameter sharding over the ``model`` axis.

The reference implements exactly one parallelism strategy — data parallelism
(SURVEY §2.7) — so TP is a TPU-native *extension*: on a 2-D
``(data, model)`` mesh each transformer block's QKV/up projections are
column-sharded and the out/down projections row-sharded, which is the
communication-minimal layout (one reduce per block, inserted automatically
by XLA's SPMD partitioner; see the GSPMD paper / scaling-book recipe —
annotate weights, let the compiler place the collectives on ICI).

Rules are keyed on flax param-path suffixes and cover all three model
families:

- CLIP-ViP towers: ``self_attn/{q,k,v}_proj``, ``out_proj``, ``mlp/fc1``,
  ``mlp/fc2`` (``models/clip_vip/model.py``)
- staged BERT: ``attention_self/{query,key,value}``,
  ``attention_output_dense``, ``intermediate_dense``, ``output_dense``
  (``models/bert.py``)
- Swin3D/HTWA: fused ``qkv`` and ``proj`` (``models/lf_vila/swin3d.py``)

Everything else (embeddings, layer norms, heads, projections) stays
replicated. A dimension that does not divide the model-axis size falls back
to replicated rather than erroring, so tiny debug configs always work.

Because optimizer-state trees embed the param tree (Adam moments mirror
param paths), the same path rules shard the optimizer state: pass
``param_shardings`` to :func:`hybrid_state_shardings` to get a ZeRO-2 ×
TP layout where moments of TP-sharded params follow the TP layout and the
rest shard over ``data``.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xpretrain_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (regex on the '/'-joined param path, shard_dim) — shard_dim indexes the
# kernel dimension to split: 1 = output/column (QKV/up), 0 = input/row
# (out/down). Bias vectors of column-sharded kernels split on dim 0.
_COLUMN = re.compile(
    r"/(q_proj|k_proj|v_proj|query|key|value|qkv|fc1|intermediate_dense)/(kernel|bias)$"
)
_ROW = re.compile(
    r"/(out_proj|proj|fc2|attention_output_dense|output_dense)/kernel$"
)


def tp_pspec(path: str, shape: tuple[int, ...], mp: int) -> P:
    """PartitionSpec for one param (or optimizer-moment) leaf.

    ``path`` is the '/'-joined tree path; ``mp`` the model-axis size.
    """
    m = _COLUMN.search(path)
    if m is not None:
        dim = len(shape) - 1  # kernel: output dim; bias: its only dim
        if shape[dim] % mp == 0 and shape[dim] >= mp:
            spec = [None] * len(shape)
            spec[dim] = MODEL_AXIS
            return P(*spec)
        return P()
    # Row rule restricted to 2-D dense kernels: '/proj/kernel' would otherwise
    # also match PatchEmbed3D's Conv3D named 'proj' (swin3d.py), row-sharding
    # the conv's temporal window dim — harmless under SPMD but an unintended
    # layout that forces communication on the patch embed (advisor r2).
    if _ROW.search(path) is not None and len(shape) == 2:
        if shape[0] % mp == 0 and shape[0] >= mp:
            spec = [None] * len(shape)
            spec[0] = MODEL_AXIS
            return P(*spec)
    return P()


def _path_str(key_path) -> str:
    return "/" + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for the params: TP layout over the ``model`` axis."""
    mp = mesh.shape[MODEL_AXIS]

    def shard(key_path, leaf):
        return NamedSharding(mesh, tp_pspec(_path_str(key_path), leaf.shape, mp))

    return jax.tree_util.tree_map_with_path(shard, params)


def hybrid_state_shardings(
    tx: optax.GradientTransformation,
    params: Any,
    mesh: Mesh,
    min_size: int = 16384,
) -> Any:
    """Optimizer-state shardings: TP layout where the param is TP-sharded,
    ZeRO-2-style data-axis sharding for the remaining large leaves.

    Works because optax state trees embed params-shaped subtrees whose tree
    paths end with the param path — the same suffix regexes apply.
    """
    mp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    state_shapes = jax.eval_shape(tx.init, params)

    def shard(key_path, leaf):
        shape = getattr(leaf, "shape", ())
        spec = tp_pspec(_path_str(key_path), shape, mp)
        if spec != P():
            return NamedSharding(mesh, spec)
        if getattr(leaf, "size", 0) >= min_size:
            for dim, extent in enumerate(shape):
                if extent % dp == 0 and extent >= dp:
                    zspec = [None] * len(shape)
                    zspec[dim] = DATA_AXIS
                    return NamedSharding(mesh, P(*zspec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(shard, state_shapes)
