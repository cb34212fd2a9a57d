"""Counter-based deterministic pseudo-randomness (splitmix64, vectorized).

Every generated value is a pure function of ``(seed, row_index)`` so
generation is embarrassingly parallel and independent of block boundaries
— the property that lets `ray.data.range(n).map_batches(gen)` produce the
same table at any parallelism (the determinism contract of FIXTURES.md).
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def mix(seed: int, idx: np.ndarray, stream: int = 0) -> np.ndarray:
    """Deterministic uint64 per (seed, stream, index)."""
    base = (seed * 0xBF58476D1CE4E5B9 + stream * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    with np.errstate(over="ignore"):
        return splitmix64(
            idx.astype(np.uint64) + splitmix64(np.full_like(idx, base, dtype=np.uint64))
        )


def uniform01(seed: int, idx: np.ndarray, stream: int = 0) -> np.ndarray:
    """float64 in [0,1) per index."""
    return (mix(seed, idx, stream) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def zipf_rank(seed: int, idx: np.ndarray, n: int, stream: int = 0) -> np.ndarray:
    """Zipf-ish (s≈1) rank in [0, n) via inverse-CDF on log scale.

    Density ∝ 1/(rank+1): the hot-key skew knob for the salting story
    (SURVEY.md §4 'skew / stragglers').
    """
    u = uniform01(seed, idx, stream)
    r = np.floor(np.exp(u * np.log(float(n) + 1.0))).astype(np.int64) - 1
    return np.clip(r, 0, n - 1)
