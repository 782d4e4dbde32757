"""Shared step-driving loop for the trainers.

One implementation of the host-side training loop used by both
``ClipVipTrainer`` and ``GenericTrainer``: per-step dispatch or
``steps_per_call`` stacked dispatch (K steps chained on-device via
``parallel/train_step._scan_steps``), with log/validate/save cadences
preserved at their configured density — when a chunk crosses several
``log_steps`` boundaries, each boundary is logged from that sub-step's
entry in the stacked metrics.

Note on the tail chunk: if ``num_train_steps - start_step`` is not
divisible by ``steps_per_call``, the final shorter chunk compiles a second
program (a `lax.scan` of a different length). Prefer divisible totals for
long runs; the cost is one extra compile at the very end.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import numpy as np

from xpretrain_tpu.parallel.mesh import shard_host_batch
from xpretrain_tpu.utils.logging import LOGGER


def _batch_schema(batch: dict) -> tuple:
    return tuple(
        (k, getattr(batch[k], "shape", None), str(getattr(batch[k], "dtype", type(batch[k]))))
        for k in sorted(batch)
    )


def stack_batches(batches: list) -> dict:
    """Stack host batches on a leading axis, with a clear schema error."""
    if not all(isinstance(b, dict) for b in batches):
        raise ValueError(
            "steps_per_call > 1 requires dict batches (got "
            f"{[type(b).__name__ for b in batches]})"
        )
    schemas = {_batch_schema(b) for b in batches}
    if len(schemas) > 1:
        raise ValueError(
            "steps_per_call > 1 needs structurally identical batches (same keys, "
            "shapes, dtypes) across consecutive steps; a multi-task MetaLoader "
            "mixes batch schemas — use steps_per_call=1 for multi-task training. "
            f"Got schemas: {sorted(schemas)}"
        )
    scalar_keys = [
        k for k, shape, _ in next(iter(schemas)) if shape is not None and len(shape) == 0
    ] + [k for k, shape, _ in next(iter(schemas)) if shape is None]
    if scalar_keys:
        # A 0-d leaf stacks to rank-1, slips past shard_host_batch's
        # min_ndim=2 filter, and then fails deep inside jit when
        # P(None, 'data') meets a rank-1 array. Fail here, at the cause.
        raise ValueError(
            "steps_per_call > 1 requires every batch leaf to be an array of "
            f"rank >= 1; got scalar/non-array leaves for keys {scalar_keys}. "
            "Reshape scalars to shape (1,) or use steps_per_call=1."
        )
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)


def drive_train_loop(
    *,
    train_step: Callable,
    loader,
    state,
    rng,
    mesh,
    num_train_steps: int,
    steps_per_call: int = 1,
    log_every: int = 20,
    valid_every: int = 500,
    save_every: int = 500,
    on_log: Optional[Callable[[int, dict, float], None]] = None,
    on_validate: Optional[Callable[[int, Any], None]] = None,
    on_save: Optional[Callable[[int, Any], None]] = None,
    on_step: Optional[Callable[[int], None]] = None,
    profile_dir: Optional[str] = None,
    profile_start_step: int = 3,
    profile_num_steps: int = 0,
):
    """Drive ``train_step`` from ``int(state.step)`` to ``num_train_steps``.

    ``on_log(step, metrics_at_step, steps_per_sec)`` fires at every
    ``log_every`` boundary (with per-sub-step metrics when chunked),
    ``on_validate(step, state)`` / ``on_save(step, state)`` at their
    boundaries, evaluated after the chunk containing them completes.
    """
    start_step = int(state.step)
    it = iter(loader)
    k = max(1, int(steps_per_call))

    def next_batch():
        batch = next(it)
        if isinstance(batch, tuple):  # MetaLoader yields (task, batch)
            _task, batch = batch
        return batch

    def crossed(before: int, after: int, every: int) -> bool:
        return after // every > before // every

    step = start_step
    last_log_step = start_step
    t0 = time.time()
    profiling = False
    prof_end = profile_start_step + profile_num_steps
    while step < num_train_steps:
        if (
            profile_dir
            and profile_num_steps > 0
            and not profiling
            and step >= profile_start_step
            and step < prof_end
        ):
            # jax.profiler device trace over the next profile_num_steps
            # (SURVEY §5.1: the reference has no tracing; TB wall-clock only)
            jax.profiler.start_trace(profile_dir)
            profiling = True
        chunk = min(k, num_train_steps - step)
        rng, step_rng = jax.random.split(rng)
        if chunk == 1 and k == 1:
            batch = shard_host_batch(next_batch(), mesh)
            state, metrics = train_step(state, batch, step_rng)
            at = lambda i: metrics
        else:
            stacked = stack_batches([next_batch() for _ in range(chunk)])
            stacked = shard_host_batch(stacked, mesh, leading_stack=True)
            state, metrics = train_step(state, stacked, step_rng)
            at = lambda i: jax.tree_util.tree_map(lambda v: v[i], metrics)
        prev, step = step, step + chunk
        if profiling and step >= prof_end:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                metrics,
            )
            jax.profiler.stop_trace()
            profiling = False
        if on_log is not None and crossed(prev, step, log_every):
            # log EVERY boundary the chunk crossed, from that sub-step's row
            elapsed = max(time.time() - t0, 1e-9)
            sps = (step - last_log_step) / elapsed
            for s in range(prev + 1, step + 1):
                if s % log_every == 0:
                    on_log(s, at(s - prev - 1), sps)
            last_log_step = step
            t0 = time.time()
        if on_validate is not None and crossed(prev, step, valid_every):
            on_validate(step, state)
        if on_save is not None and crossed(prev, step, save_every):
            on_save(step, state)
        if on_step is not None:
            # cheap per-chunk housekeeping hook (e.g. CheckpointManager.poll
            # releasing the pinned async-save host copy once the write lands)
            on_step(step)
    if profiling:  # num_train_steps ended inside the profiled window
        jax.profiler.stop_trace()
    return state
