"""LR schedules with the reference's step-wise semantics, jit-traceable.

Mirrors ``CLIP-ViP/src/optimization/sched.py:9-84`` (warmup linear/cosine,
noam/invsqrt, multi-step, constant, the 1e-8 floor safeguard, and the
plateau-driven ``AutoStep``) as optax-style ``step -> lr`` callables built on
``jnp`` so they can live inside the pjit-ed train step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]

LR_FLOOR = 1e-8


def warmup_linear(learning_rate: float, warmup_steps: int, total_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.maximum(0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1))
        return jnp.maximum(learning_rate * jnp.where(step < warmup_steps, warm, decay), LR_FLOOR)

    return fn


def warmup_cosine(learning_rate: float, warmup_steps: int, total_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        progress = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        decay = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.maximum(learning_rate * jnp.where(step < warmup_steps, warm, decay), LR_FLOOR)

    return fn


def noam(learning_rate: float, warmup_steps: int) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = (warmup_steps**0.5) * jnp.maximum(step, 1.0) ** -0.5
        return jnp.maximum(learning_rate * jnp.where(step <= warmup_steps, warm, decay), LR_FLOOR)

    return fn


def constant(learning_rate: float) -> Schedule:
    def fn(step):
        return jnp.full((), learning_rate, jnp.float32)

    return fn


def multi_step(
    learning_rate: float,
    warmup_steps: int,
    steps_per_epoch: int,
    milestones: Sequence[int],
    gamma: float = 0.5,
) -> Schedule:
    """Epoch-milestone decay (``multi_step_schedule``); epoch derived from step.

    Parity quirk reproduced: past the final milestone the reference returns
    ``gamma**(len(milestones)+1)`` — it skips the ``len(milestones)`` exponent
    (``CLIP-ViP/src/optimization/sched.py:26-34``, an off-by-one in the
    original's fall-through). We match it so fine-tune LR curves line up.
    """
    ms = jnp.asarray(sorted(milestones), jnp.float32)
    n_ms = len(milestones)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = step / jnp.maximum(steps_per_epoch, 1)
        power = jnp.sum(epoch >= ms).astype(jnp.float32)
        power = jnp.where(power >= n_ms, power + 1.0, power)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = gamma**power
        return jnp.maximum(learning_rate * jnp.where(step <= warmup_steps, warm, decay), LR_FLOOR)

    return fn


def get_schedule(
    decay: str,
    learning_rate: float,
    num_train_steps: int,
    warmup_ratio: float = 0.1,
    steps_per_epoch: int = 1,
    decay_epochs: Sequence[int] = (),
    gamma: float = 0.5,
) -> Schedule:
    """Dispatcher matching ``get_lr_sched`` (ref ``sched.py:62-84``)."""
    warmup_steps = int(warmup_ratio * num_train_steps)
    if decay == "linear":
        return warmup_linear(learning_rate, warmup_steps, num_train_steps)
    if decay == "cosine":
        return warmup_cosine(learning_rate, warmup_steps, num_train_steps)
    if decay == "invsqrt":
        return noam(learning_rate, warmup_steps)
    if decay == "constant":
        return constant(learning_rate)
    if decay == "multi_step":
        return multi_step(learning_rate, warmup_steps, steps_per_epoch, decay_epochs, gamma)
    raise ValueError(f"unknown decay {decay!r}")


class AutoStep:
    """Plateau-driven LR decay (host-side, ref ``sched.py:37-58``).

    Call :meth:`step` with the eval score after each validation; the decay
    coefficient multiplies after ``tolerance`` consecutive non-improvements.
    """

    def __init__(self, tolerance: int, gamma: float):
        self.tolerance = tolerance
        self.gamma = gamma
        self.coeff = 1.0
        self.best_score = 0.0
        self.count = 0

    def step(self, score: float) -> None:
        if score <= self.best_score:
            self.count += 1
        else:
            self.count = 0
        self.best_score = score
        if self.count > self.tolerance:
            self.count = 0
            self.coeff *= self.gamma

    def get_lr(
        self,
        global_step: int,
        learning_rate: float,
        num_train_steps: int,
        warmup_ratio: float = 0.1,
    ) -> float:
        warmup_steps = int(warmup_ratio * num_train_steps)
        if warmup_steps and global_step <= warmup_steps:
            return learning_rate * global_step / warmup_steps
        return max(self.coeff * learning_rate, LR_FLOOR)
