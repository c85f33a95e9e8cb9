"""Deterministic randomness.

The reference seeds torch/cuda/cudnn/numpy/random globally
(torchdet3d/utils/utils.py:24-31).  On TPU/JAX determinism is structural:
every random op consumes an explicit ``jax.random`` key.  This module seeds
the remaining *host-side* RNGs (numpy / random, used by the data pipeline)
and hands out the root JAX key.
"""

import os
import random

import numpy as np
import jax

__all__ = ['set_random_seed', 'KeySeq']


def set_random_seed(seed):
    """Seed host RNGs and return the root ``jax.random`` key."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)
    return jax.random.PRNGKey(seed)


class KeySeq:
    """A stateful splitter for host-side loops (never used inside jit)."""

    def __init__(self, key_or_seed):
        if isinstance(key_or_seed, int):
            key_or_seed = jax.random.PRNGKey(key_or_seed)
        self._key = key_or_seed

    def next(self, n=None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
