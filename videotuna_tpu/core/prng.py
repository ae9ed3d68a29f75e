"""PRNG discipline: one seed in, named key streams out.

Replaces the reference's global-torch-seed + broadcast-seed pattern
(seed_everything in scripts/train.py, seed broadcast flow/wanvideo.py:153-157):
JAX explicit keys make runs deterministic per (seed, stream, step) with no
cross-rank synchronization — every host derives identical keys.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax


class KeyChain:
    """Deterministic named key streams: ``keys("dropout")`` at step N is the
    same on every host and every run with the same seed."""

    def __init__(self, seed: int):
        self.seed = int(seed)
        self._root = jax.random.key(self.seed)
        self._counters: Dict[str, int] = {}

    def __call__(self, stream: str) -> jax.Array:
        idx = self._counters.get(stream, 0)
        self._counters[stream] = idx + 1
        return jax.random.fold_in(
            jax.random.fold_in(self._root, _stream_hash(stream)), idx)

    def fixed(self, stream: str, step: int) -> jax.Array:
        """Stateless variant for use inside jitted step functions."""
        return jax.random.fold_in(
            jax.random.fold_in(self._root, _stream_hash(stream)), step)


def _stream_hash(name: str) -> int:
    h = 0
    for ch in name:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return h


def split_for_devices(key: jax.Array, n: int) -> jax.Array:
    return jax.random.split(key, n)
