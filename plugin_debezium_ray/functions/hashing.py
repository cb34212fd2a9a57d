"""Deterministic vectorized hashing.

Used for (a) primary-key → bucket routing (the ONE hash shuffle of the
engine, SURVEY.md §7.3), (b) content sha256 (the per-row parity invariant
from BASELINE.json input_hint), (c) partition fingerprints for the
manifest.  All hashes must be deterministic across processes and runs —
Python's builtin ``hash`` is salted per process and is never used.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"  # unit separator — cannot appear in key columns' hot path


def key_hash_array(table: pa.Table, key_cols: tuple[str, ...]) -> np.ndarray:
    """Deterministic uint64 hash of the concatenated key columns.

    Vectorized: Arrow binary_join_element_wise to build the composite key,
    then pandas' SipHash (``pd.util.hash_array``, fixed key → deterministic
    across processes).  Hashing (repo, path) *together* is what spreads a
    hot repo across buckets — ordering is only needed per (repo, path), so
    this is the salting story of SURVEY.md §4 for free.
    """
    cols = [pc.cast(table[c], pa.string()) for c in key_cols]
    if len(cols) == 1:
        joined = cols[0]
    else:
        joined = pc.binary_join_element_wise(*cols, _SEP)
    arr = joined.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(arr.astype(object))


def bucket_of(table: pa.Table, key_cols: tuple[str, ...], num_buckets: int) -> pa.Array:
    """int32 bucket id per row."""
    h = key_hash_array(table, key_cols)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int32))


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Row-wise sha256 hexdigest of a string/binary column.

    hashlib releases the GIL per call; this runs inside map_batches workers
    so the per-row Python loop is bounded by batch size and parallel across
    the cluster.  (No vectorized sha256 exists in pyarrow/numpy.)
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    strs = col.to_pylist()
    out = [
        None if s is None else hashlib.sha256(
            s if isinstance(s, bytes) else s.encode("utf-8")
        ).hexdigest()
        for s in strs
    ]
    return pa.array(out, type=pa.string())


def combine_hashes_unordered(hex_digests) -> str:
    """Order-independent combination of per-row/partition digests.

    XOR of the 256-bit digests → one partition/table fingerprint that can
    be computed distributed and merged in any order (SURVEY.md §7.4 #5:
    never collect 10^10 rows to the driver to fingerprint them).
    """
    acc = 0
    for h in hex_digests:
        if h is None:
            continue
        acc ^= int(h, 16)
    return f"{acc:064x}"
