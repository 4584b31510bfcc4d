"""Deterministic randomness: global seeding and JAX PRNG key threading.

TPU-native replacement for the reference's `utils/seed.py` (seeds
random/numpy/TF + PYTHONHASHSEED, seed.py:9-24). In JAX, determinism comes
from explicit key threading rather than global state; `KeyStream` is a small
convenience for imperative call sites (data pipeline, trainers) that still
guarantees a reproducible, collision-free sequence of keys.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def set_global_seed(seed: int) -> jax.Array:
    """Seed Python/numpy global RNGs and return a root JAX key.

    Host-side randomness (file shuffling, random crops in workers) uses the
    seeded numpy/random state; device-side randomness must thread the
    returned key.

    Args:
        seed: Seed value.

    Returns:
        Root `jax.random.key` derived from the seed.
    """
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class KeyStream:
    """A stateful splitter over a root PRNG key.

    Each call to `next()` returns a fresh, independent key. Use only at the
    top level of host-side orchestration (never inside jit).
    """

    def __init__(self, seed_or_key: int | jax.Array):
        import numbers

        # numbers.Integral admits numpy integer scalars too.
        if isinstance(seed_or_key, numbers.Integral):
            self._key = jax.random.key(int(seed_or_key))
        else:
            self._key = seed_or_key
        self._count = 0

    def next(self) -> jax.Array:
        """Return a fresh key and advance the stream."""
        key = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return key

    def next_n(self, n: int) -> jax.Array:
        """Return `n` stacked fresh keys."""
        keys = jax.random.split(self.next(), n)
        return keys
