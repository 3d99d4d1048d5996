"""Deterministic seeding.

Parity target: reference nerf/utils.py:119-126 (`seed_everything`). On TPU,
JAX threefry keys replace torch Generators / PCG32 — exact torch noise
sequences are not reproducible across frameworks, so replay-parity flows use
recorded noise CSVs (like the reference's replay path, replay_MC.py:48-57).
"""

import os
import random

import numpy as np
import jax


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a root JAX key."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)


class KeyChain:
    """Stateful convenience wrapper: kc = KeyChain(seed); kc() -> fresh key."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self.key = jax.random.PRNGKey(seed_or_key)
        else:
            self.key = seed_or_key

    def __call__(self, n: int = 1):
        keys = jax.random.split(self.key, n + 1)
        self.key = keys[0]
        return keys[1] if n == 1 else keys[1:]
