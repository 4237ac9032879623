"""Host-side RNG key derivation.

``jax.random.split`` is a device computation — over a tunneled TPU link it
costs tens of milliseconds per call, and the solver needs hundreds of keys
per step.  Threefry keys are plain ``uint32[2]`` counters, so statistically
independent streams can be derived on host for free: ``KeyStream`` hands
out ``[base_seed, counter]`` keys from a Python counter with zero device
round trips.
"""
from __future__ import annotations

import numpy as np


class KeyStream:
    """Deterministic stream of raw threefry key data, derived on host."""

    def __init__(self, seed: int) -> None:
        self._base = np.uint32(seed & 0xFFFFFFFF)
        self._hi = np.uint32((seed >> 32) & 0xFFFFFFFF)
        self._counter = 0

    def __call__(self) -> np.ndarray:
        self._counter += 1
        # mix the counter into both words so streams with different seeds
        # never collide on low counters
        lo = np.uint32((int(self._base) + 0x9E3779B9 * self._counter)
                       & 0xFFFFFFFF)
        hi = np.uint32((int(self._hi) ^ (self._counter * 0x85EBCA6B))
                       & 0xFFFFFFFF)
        return np.array([hi, lo], dtype=np.uint32)

    def next(self) -> np.ndarray:
        return self()


def host_key(seed: int, counter: int = 0) -> np.ndarray:
    """One-off raw key from (seed, counter) without touching the device."""
    return np.array([np.uint32(counter), np.uint32(seed & 0xFFFFFFFF)],
                    dtype=np.uint32)


def split_host(key, n: int = 2) -> np.ndarray:
    """Host-side equivalent of ``jax.random.split`` for *eager* call sites:
    derives ``n`` independent raw keys from ``key`` with numpy arithmetic
    (no device round trip).  Only for keys materialized on host — jitted
    kernels should keep using ``jax.random.split`` on traced keys."""
    k = np.asarray(key).astype(np.uint64)
    i = np.arange(1, n + 1, dtype=np.uint64)
    lo = (k[1] + np.uint64(0x9E3779B9) * i) & np.uint64(0xFFFFFFFF)
    hi = (k[0] ^ (i * np.uint64(0x85EBCA6B))) & np.uint64(0xFFFFFFFF)
    return np.stack([hi, lo], axis=-1).astype(np.uint32)
