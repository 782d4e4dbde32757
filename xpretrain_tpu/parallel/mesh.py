"""Device-mesh construction and sharding helpers.

This replaces the reference's process-group plumbing (Horovod ``hvd.init()``
at ``CLIP-ViP/src/pretrain/run_pretrain.py:470``,
``deepspeed.init_distributed()`` at ``LF-VILA/src/run_pretrain.py:120``) with
a single `jax.sharding.Mesh`. Data parallelism is the ``data`` axis; the
``model`` axis is available for optimizer-state sharding (the ZeRO-2
equivalent shards along ``data``) and tensor-parallel extensions.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed(*, _initialize=None) -> None:
    """Initialize jax.distributed when running multi-host (no-op otherwise).

    Ordering constraint: ``jax.distributed.initialize()`` must run *before*
    the first backend touch — calling ``jax.devices()`` / ``process_count()``
    first initializes a single-host local backend, after which multi-host init
    is silently too late. So the decision here is made from environment
    variables ONLY (``JAX_COORDINATOR_ADDRESS`` set by the pod launcher, the
    TPU equivalent of the reference's ``hvd.init()`` /
    ``deepspeed.init_distributed()`` bootstraps), never from backend queries.
    Safe to call more than once: a second call is a no-op.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED or not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    init = _initialize if _initialize is not None else jax.distributed.initialize
    # jax only auto-detects recognized cluster envs (SLURM/OMPI/K8s); a
    # hand-rolled launch exports these three, so pass them explicitly.
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        init(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        init()
    _DISTRIBUTED_INITIALIZED = True


_DISTRIBUTED_INITIALIZED = False


def create_mesh(
    mesh_shape: Sequence[int] | None = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    With the default 1-D shape every device is a data-parallel worker. Pass
    ``mesh_shape=(dp, mp)`` with ``axis_names=("data", "model")`` for a 2-D
    layout; the trailing (model) axis maps to the most-contiguous devices so
    model collectives ride the fastest ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) if len(axis_names) == 1 else (n // int(np.prod([1])), 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {tuple(mesh_shape)} does not cover {n} devices")
    device_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(device_array, tuple(axis_names))


def mesh_from_config(cfg) -> Mesh:
    """1-D data mesh, or a 2-D ``(data, model)`` mesh when ``tp``/``cp`` > 1.

    ``tp`` is the tensor-parallel degree (see
    :mod:`xpretrain_tpu.parallel.tensor_parallel` for the param layout);
    ``cp`` the context-parallel degree (Swin3D temporal-axis sharding,
    ``models/lf_vila/swin3d.py`` ``context_parallel_axis``). Both map onto
    the same ``model`` mesh axis, so when both exceed 1 they must agree.
    """
    tp = int(cfg.get("tp", 1) or 1)
    cp = int(cfg.get("cp", 1) or 1)
    if tp > 1 and cp > 1 and tp != cp:
        raise ValueError(
            f"tp={tp} and cp={cp} share the mesh's model axis; set them equal"
        )
    mp = max(tp, cp)
    if mp <= 1:
        return create_mesh()
    n = len(jax.devices())
    if n % mp:
        raise ValueError(f"tp/cp={mp} does not divide the {n} available devices")
    return create_mesh((n // mp, mp), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    n = mesh.shape[axis]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {axis}={n}")
    return global_batch // n


def shard_host_batch(batch, mesh: Mesh, axis: str = DATA_AXIS, leading_stack: bool = False):
    """Place a host-side (numpy) batch onto the mesh, sharded on axis 0.

    The device-put here is the TPU equivalent of the reference's
    PrefetchLoader H2D copy (``CLIP-ViP/src/datasets/dataloader.py:92-157``);
    async dispatch overlaps the transfer with the previous step's compute.

    Single-process: ``batch`` is the global batch. Multi-process (a mesh
    spanning processes): each process passes its *local* shard — the rows its
    per-process ``BatchLoader(process_index=..)`` yielded — and the global
    array is assembled process-locally (the reference's per-rank loader
    feeding its own GPU, ``hd-vila/src/utils/distributed.py``).

    ``leading_stack=True``: the batch carries a leading steps-per-call K axis
    ([K, B, ...]); the *second* axis is the batch axis to shard.
    """
    sharding = (
        NamedSharding(mesh, P(None, axis)) if leading_stack else batch_sharding(mesh, axis)
    )
    min_ndim = 2 if leading_stack else 1
    multiprocess = jax.process_count() > 1

    def put(x):
        if getattr(x, "ndim", 0) < min_ndim:
            return x
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
