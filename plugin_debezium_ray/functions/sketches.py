"""Mergeable sketches for corpus-scale statistics.

HyperLogLog (Flajolet et al. 2007, public) gives approximate
count-distinct in ONE streaming pass with no shuffle: each batch folds
into a 2^p-register array (vectorized numpy), registers merge by
element-wise max (associative + commutative — safe under Ray's
partial/merge aggregation tree and under retries), and the estimate
reads out at the driver from one small array.  At 100 TB an exact
distinct requires shuffling every key; the sketch ships 2^p bytes per
block instead.

Standard error ≈ 1.04/√(2^p): p=14 (16 KiB) → ~0.8%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import AggregateFn

_HLL_HASH_KEY = "hll-sketch-lane-"  # 16 bytes


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_accumulate(registers: np.ndarray, values, p: int) -> np.ndarray:
    """Fold a column of values into the register array (vectorized):
    top ``p`` hash bits pick the register, the rank (leading-zero count
    + 1) of the remaining ``64-p`` bits is max-ed in.  Nulls are
    skipped.  The remaining-bits word is < 2^50 for p ≥ 14, so the
    float64 log2 rank computation is exact."""
    arr = np.asarray(values, dtype=object)
    mask = pd.notna(arr)
    if not mask.any():
        return registers
    h = pd.util.hash_array(arr[mask], hash_key=_HLL_HASH_KEY)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    nbits = 64 - p
    rank = np.where(
        w == 0,
        np.uint8(nbits + 1),
        (nbits - np.floor(np.log2(w.astype(np.float64)))).astype(np.uint8),
    )
    np.maximum.at(registers, idx, rank)
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the standard small-range
    (linear counting) correction."""
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def approx_count_distinct(
    ds: "ray.data.Dataset", col: str, *, p: int = 14
) -> int:
    """Approximate number of distinct values of ``col`` — ONE streaming
    pass, no shuffle: per-block register folds combine through Ray's
    aggregation tree by element-wise max; only 2^p bytes per block move.
    Returns the rounded estimate (standard error ≈ 1.04/√2^p)."""
    m = 1 << p

    def _values(block):
        c = block[col]
        if isinstance(c, (pa.Array, pa.ChunkedArray)):  # Arrow block
            return c.to_numpy(zero_copy_only=False)
        return np.asarray(c)  # pandas block

    agg = AggregateFn(
        init=lambda _: np.zeros(m, dtype=np.uint8),
        accumulate_block=lambda regs, block: hll_accumulate(
            regs.copy(), _values(block), p
        ),
        merge=lambda a, b: np.maximum(a, b),
        name="hll",
    )
    out = ds.aggregate(agg)
    if out is None:  # Ray 2.49: aggregate over an empty dataset
        return 0
    regs = out["hll"]
    return int(round(hll_estimate(np.asarray(regs, dtype=np.uint8))))
