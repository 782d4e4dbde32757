"""Checkpointing: orbax-backed saves, best-model tracking, auto-resume.

Capability parity with the reference's three mechanisms
(``CLIP-ViP/src/utils/load_save.py``):

- periodic model checkpoints (``ModelSaver.save`` ``:38-63``) with bounded
  retry around storage flakiness (``:47-63``);
- best-metric checkpoint (``BestModelSaver`` ``:65-83``);
- preemption auto-resume of model+optimizer+step with dual-slot rotation
  (``E2E_TrainingRestorer`` ``:260-327``) — orbax keeps the last K steps,
  which subsumes the restore.pt/restore_backup.pt dance;
- training-meta snapshot (args.json + code zip, ``save_training_meta``
  ``:17-35``).

No amp/loss-scale state exists on TPU (bf16), documented deviation.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from xpretrain_tpu.utils.basic import make_zipfile, save_json
from xpretrain_tpu.utils.logging import LOGGER


class CheckpointManager:
    """Thin orbax wrapper holding train state = {params, opt_state, step}."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 2,
        retries: int = 10,
        async_save: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.retries = retries
        self.async_save = async_save
        self._last_async: tuple[int, Any] | None = None
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        """Write a checkpoint.

        Sync mode (default): blocks until durable, with the reference's
        bounded retry (``load_save.py:47-63``). Async mode: waits for the
        *previous* async write (a failure is only a warning — this newer
        save supersedes it as the resume point), then dispatches this one
        and returns while orbax persists in the background; ``wait()`` /
        ``close()`` drain, retrying the last dispatched save synchronously
        if the in-flight write failed (same bounded retry as sync mode).
        """
        if self.async_save:
            try:
                self._mgr.wait_until_finished()
            except Exception as e:  # noqa: BLE001 - prior write superseded by this one
                LOGGER.warning("previous async checkpoint failed: %s", e)
            self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
            self._last_async = (step, state)
            return
        self._save_with_retry(step, state, force)

    def _save_with_retry(self, step: int, state: Any, force: bool = False) -> None:
        for attempt in range(self.retries):
            try:
                self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
                self._mgr.wait_until_finished()
                return
            except Exception as e:  # noqa: BLE001 - bounded retry like the reference
                LOGGER.warning("checkpoint save attempt %d failed: %s", attempt, e)
                # a partial/registered/raced write of this step blocks the
                # retry (orbax `force` skips the save-interval check, it does
                # NOT overwrite an existing step) — clear it first
                try:
                    self._mgr.delete(step)
                except Exception:  # noqa: BLE001 - nothing to delete
                    pass
                # orbax StepAlreadyExistsError subclasses ValueError but is
                # NOT structural: it happens when a presumed-failed async
                # write landed after all (the drain raised, the background
                # finalize won the race) — the delete above clears it, and
                # the retry proceeds through the normal backoff (if the
                # delete itself keeps failing, spinning without sleep would
                # burn the whole budget in milliseconds)
                if type(e).__name__ != "StepAlreadyExistsError" and isinstance(
                    e, (ValueError, TypeError)
                ):
                    # structural rejections (unsaveable leaf, bad tree) are
                    # deterministic — retrying burns minutes of backoff on
                    # the same error; only IO-ish failures get the retries
                    raise RuntimeError(f"checkpoint save rejected: {e}") from e
                time.sleep(min(2**attempt, 30))
        raise RuntimeError(f"checkpoint save failed after {self.retries} retries")

    def wait(self) -> None:
        """Drain in-flight writes; retry the last async save if it failed."""
        try:
            self._mgr.wait_until_finished()
        except Exception as e:  # noqa: BLE001
            if self._last_async is None:
                raise
            LOGGER.warning("in-flight async checkpoint failed (%s); retrying synchronously", e)
            step, state = self._last_async
            self._save_with_retry(step, state, force=True)
        self._last_async = None

    def poll(self) -> None:
        """Non-blocking per-step hook for async mode: once the in-flight
        write has landed, release the pinned host copy of the train state
        (``_last_async`` holds params + both Adam moments — multiple GB on
        the large families — which is only needed for the failed-write
        retry path; r3 advisor finding). On a detected failure, retry
        synchronously now rather than at the next save/close."""
        if self._last_async is None or self._mgr.is_saving_in_progress():
            return
        step, state = self._last_async
        self._last_async = None
        try:
            self._mgr.check_for_errors()
        except Exception as e:  # noqa: BLE001
            LOGGER.warning("async checkpoint at step %d failed (%s); retrying synchronously", step, e)
            self._save_with_retry(step, state, force=True)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def saved_uses_fused_layout(self, step: int | None = None) -> bool | None:
        """Detect the optimizer-state layout of the saved checkpoint.

        Returns True if the latest (or given) step was written with the flat
        ``fused_grouped_adamw`` state (``ScaleByAdamState``), False if with
        the legacy optax ``multi_transform`` composition (whose state tree
        contains an ``inner_states`` mapping), None when there is no
        checkpoint or the layout cannot be determined. Lets trainers resume
        checkpoints written before ``--fused_adamw`` defaulted to 1 without
        the operator having to know the flag (advisor r2, medium).
        """
        # Read the saved tree structure from orbax's on-disk _METADATA json
        # (item_metadata() returns None until a restore handler is
        # registered, so it cannot be used before the first restore).
        meta = self._read_meta(step)
        if meta is None:
            return None
        if "opt_state" not in meta:
            return None  # params-only checkpoint (e.g. BestModelSaver)
        # multi_transform state carries an 'inner_states' mapping; the flat
        # fused ScaleByAdamState does not (even under MultiSteps wrapping).
        return "inner_states" not in meta

    def saved_uses_master_layout(self, step: int | None = None) -> bool | None:
        """True if the saved opt state carries ``master_weights`` fp32 master
        copies (``--param_dtype bf16`` runs; MasterWeightsState's ``master``
        field is the on-disk marker), None when indeterminable."""
        meta = self._read_meta(step)
        if meta is None or "opt_state" not in meta:
            return None
        return "'master'" in meta or '"master"' in meta

    def _read_meta(self, step: int | None = None) -> str | None:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        for name in ("default", "state"):
            path = os.path.join(self.directory, str(step), name, "_METADATA")
            if os.path.exists(path):
                try:
                    with open(path) as f:
                        meta = f.read()
                    # an empty file (crash mid-write) carries no layout info;
                    # fall through to the item_metadata fallback instead
                    if meta:
                        return meta
                except OSError:
                    pass
                break
        try:
            return str(self._mgr.item_metadata(step))
        except Exception:  # noqa: BLE001 - older layouts/partial writes
            return None

    @staticmethod
    def _opt_state_has_field(state_template: Any, field: str) -> bool | None:
        """True when the template's ``opt_state`` tree contains a namedtuple
        with the given field anywhere (including under list/tuple/dict
        wrappers); None when there is no opt_state / the walk fails."""
        def has(obj) -> bool:
            if hasattr(obj, "_fields"):
                return field in obj._fields or any(
                    has(getattr(obj, f)) for f in obj._fields
                )
            if isinstance(obj, (list, tuple)):
                return any(has(x) for x in obj)
            if isinstance(obj, dict):
                return any(has(v) for v in obj.values())
            return False

        try:
            if isinstance(state_template, dict):
                opt_state = state_template.get("opt_state")
            else:
                opt_state = getattr(state_template, "opt_state", None)
            if opt_state is None:
                return None
            return has(opt_state)
        except Exception:  # noqa: BLE001
            return None

    @classmethod
    def _template_uses_fused_layout(cls, state_template: Any) -> bool | None:
        """Layout of the CURRENT run's optimizer state (same heuristic as
        :meth:`saved_uses_fused_layout`); None when indeterminable. The
        multi_transform/partition layout is marked by a namedtuple field
        literally named 'inner_states' (optax PartitionState) — the same
        marker orbax serializes into _METADATA."""
        found = cls._opt_state_has_field(state_template, "inner_states")
        return None if found is None else not found

    @classmethod
    def _template_uses_master_layout(cls, state_template: Any) -> bool | None:
        """Whether the CURRENT run's opt state carries ``master_weights``
        masters (``--param_dtype bf16``); None when indeterminable."""
        return cls._opt_state_has_field(state_template, "master")

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        try:
            restored = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        except Exception as e:
            # Give the --fused_adamw migration hint ONLY when the saved and
            # current optimizer-state layouts demonstrably differ — a shape
            # mismatch from a model-config change or a corrupt step must
            # surface as itself, not as wrong flag advice (r3 advisor).
            saved_master = self.saved_uses_master_layout(step)
            template_master = self._template_uses_master_layout(state_template)
            if (
                saved_master is not None
                and template_master is not None
                and saved_master != template_master
            ):
                raise RuntimeError(
                    f"checkpoint at step {step} in {self.directory} was written "
                    f"{'WITH' if saved_master else 'WITHOUT'} --param_dtype bf16 "
                    f"(master-weights optimizer-state layout), which does not match "
                    f"this run. Pass --param_dtype {'bf16' if saved_master else 'fp32'} "
                    f"to resume it."
                ) from e
            saved_fused = self.saved_uses_fused_layout(step)
            template_fused = self._template_uses_fused_layout(state_template)
            if (
                saved_fused is not None
                and template_fused is not None
                and saved_fused != template_fused
            ):
                raise RuntimeError(
                    f"checkpoint at step {step} in {self.directory} was written with "
                    f"{'--fused_adamw 1 (flat ScaleByAdamState)' if saved_fused else '--fused_adamw 0 (optax multi_transform)'} "
                    f"optimizer-state layout, which does not match this run's optimizer. "
                    f"Pass --fused_adamw {int(saved_fused)} to resume it."
                ) from e
            raise
        LOGGER.info("restored checkpoint at step %d from %s", step, self.directory)
        return restored

    def close(self) -> None:
        self.wait()
        self._mgr.close()


class BestModelSaver:
    """Keep the best-metric params (ref ``BestModelSaver`` ``:65-83``)."""

    def __init__(self, directory: str):
        self.mgr = CheckpointManager(os.path.join(directory, "best"), max_to_keep=1)
        self.best_score = -float("inf")
        self.best_step = -1

    def maybe_save(self, step: int, score: float, params: Any) -> bool:
        if score <= self.best_score:
            return False
        self.best_score = score
        self.best_step = step
        self.mgr.save(
            step, {"params": params, "score": np.full((), score, np.float32)}, force=True
        )
        LOGGER.info("new best score %.4f at step %d", score, step)
        return True


def save_training_meta(output_dir: str, config: Any, code_root: str | None = None) -> None:
    """args.json + code.zip snapshot next to the checkpoints."""
    log_dir = os.path.join(output_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    save_json(cfg, os.path.join(log_dir, "args.json"), pretty=True)
    if code_root:
        make_zipfile(
            code_root,
            os.path.join(log_dir, "code.zip"),
            enclosing_dir="code",
            exclude_dirs=(".git", "__pycache__", ".pytest_cache", "output"),
            exclude_extensions=(".pyc", ".ipynb", ".npy", ".pt"),
        )


def to_host(tree: Any) -> Any:
    """Device -> host numpy copy of a pytree (for export paths)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
