"""Seeded ``jax.random`` key threading.

Replaces the reference's global RNG seeding (``torch.manual_seed``,
main.py:22-24) with explicit functional key management: one root key per run,
split deterministically per purpose/step so every stochastic op (init, dropout,
scheduled sampling, data shuffling) is reproducible and independent.
"""

from __future__ import annotations

import jax
import numpy as np


class KeyChain:
    """Deterministic named key derivation from a root seed."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.PRNGKey(self.seed)

    def key(self, *tags) -> jax.Array:
        """Derive a key from the root by folding in hashed tags.

        Tags may be strings or ints; the same tags always yield the same key.
        """
        k = self._root
        for t in tags:
            if isinstance(t, str):
                t = _stable_hash(t)
            k = jax.random.fold_in(k, int(t) & 0x7FFFFFFF)
        return k

    def numpy_rng(self, *tags) -> np.random.Generator:
        """Host-side RNG (data shuffling) derived from the same root."""
        h = self.seed
        for t in tags:
            if isinstance(t, str):
                t = _stable_hash(t)
            h = (h * 1000003 + int(t)) & 0xFFFFFFFF
        return np.random.default_rng(h)


def _stable_hash(s: str) -> int:
    # Python's hash() is salted per-process; FNV-1a is stable across runs.
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h
