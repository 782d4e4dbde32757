"""PRNG-key discipline helpers for the training stack."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_host_seed(seed: int) -> None:
    """Seed host-side RNGs (python, numpy) used by data pipelines."""
    random.seed(seed)
    np.random.seed(seed % (2**32))


def key_for_step(base_key: jax.Array, step) -> jax.Array:
    """Deterministic per-step key; step may be a traced int32."""
    return jax.random.fold_in(base_key, step)


def split_dict(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
