"""PRNG management: explicit JAX key threading + host-side seeding.

The reference seeds global RNGs (src/utils/seed.py:12-52). In JAX the
idiomatic design is explicit key threading; ``KeyStream`` is a convenience
for host-side code (data augmentation scheduling, shuffling) while all
device-side randomness takes keys explicitly.
"""

from __future__ import annotations

import os
import random

import numpy as np

import jax


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key.

    Reference parity: seeds python/numpy/PYTHONHASHSEED like
    src/utils/seed.py; torch/cudnn knobs have no TPU equivalent (XLA is
    deterministic given a fixed key and program).
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.key(seed)


class KeyStream:
    """A counter-based stream of JAX PRNG keys.

    Keys are ``fold_in(root, i)`` for a monotonically increasing counter —
    stateless given (seed, counter), so a preempted run restores the exact
    stream position in O(1) by persisting the counter in its checkpoint
    (step-granular resume; the split-chain design would need O(n) replay).

    >>> ks = KeyStream(42)
    >>> k1 = ks.next()   # fresh key each call
    >>> k2 = ks.next()
    """

    def __init__(self, seed_or_key, counter: int = 0):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key
        self.counter = int(counter)

    def next(self) -> jax.Array:
        sub = jax.random.fold_in(self._key, self.counter)
        self.counter += 1
        return sub

    def split(self, n: int):
        return [self.next() for _ in range(n)]
