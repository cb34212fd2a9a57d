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
import pyarrow.compute as pc

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


# --------------------------------------------------------- heavy hitters


def _block_counts(block, col: str, weight_col: "str | None"):
    """Vectorized per-block (value, count) pairs; nulls are skipped
    (SQL ``GROUP BY`` over a stream that never produces null terms —
    document callers must pre-filter if null is a real key)."""
    c = block[col]
    vals = (
        c.to_numpy(zero_copy_only=False)
        if isinstance(c, (pa.Array, pa.ChunkedArray))
        else np.asarray(c)
    )
    if weight_col is None:
        s = pd.Series(vals).value_counts(dropna=True)
        return s.index.to_numpy(object), s.to_numpy(np.int64)
    w = block[weight_col]
    wv = (
        w.to_numpy(zero_copy_only=False)
        if isinstance(w, (pa.Array, pa.ChunkedArray))
        else np.asarray(w)
    )
    g = pd.Series(wv).groupby(pd.Series(vals), sort=False).sum()
    g = g[pd.notna(g.index)]
    return g.index.to_numpy(object), g.to_numpy(np.int64)


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    *,
    k: int = 25,
    weight_col: "str | None" = None,
    count_col: str = "n",
) -> "ray.data.Dataset":
    """EXACT top-``k`` most frequent values of ``col`` (ties broken by
    value ascending, mirroring ``ORDER BY n DESC, col``).  Two-level
    aggregation: per-block Arrow ``group_by`` partials shrink the
    stream to (value, partial-count) pairs BEFORE the one groupby
    shuffle — a block never ships more rows than its distinct values —
    then one small sort+limit over the aggregated counts.  At extreme
    key cardinality prefer :func:`heavy_hitters_sketch` (bounded state,
    no full-cardinality shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        tv = t.filter(pc.is_valid(t[col]))
        if weight_col is None:
            g = tv.group_by(col).aggregate([([], "count_all")])
            return g.rename_columns([col, "_pn"])
        g = tv.group_by(col).aggregate([(weight_col, "sum")])
        return g.rename_columns([col, "_pn"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .sum("_pn")
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.rename_columns([col, count_col])

    return (
        counts.map_batches(finish, batch_format="pyarrow")
        .sort([count_col, col], descending=[True, False])
        .limit(k)
    )


def _mg_compress(d: dict, capacity: int) -> int:
    """Misra-Gries decrement step: shrink ``d`` to ≤ ``capacity``
    entries by subtracting the (capacity+1)-th largest count from all
    (and dropping non-positives).  Returns the subtracted delta — the
    caller accumulates these into the summary's one-sided error bound
    (every kept count is a LOWER bound, under by ≤ Σdeltas)."""
    if len(d) <= capacity:
        return 0
    counts = np.fromiter(d.values(), dtype=np.int64, count=len(d))
    cut = int(np.partition(counts, -capacity - 1)[-capacity - 1])
    for v in [v for v, c in d.items() if c <= cut]:
        del d[v]
    for v in d:
        d[v] -= cut
    return cut


def heavy_hitters_sketch(
    ds: "ray.data.Dataset",
    col: str,
    *,
    k: int = 25,
    weight_col: "str | None" = None,
    count_col: str = "n",
    capacity: int = 4096,
):
    """Approximate-candidates + exact-recount top-``k`` for key spaces
    too large to shuffle: a mergeable Misra-Gries summary (Agarwal et
    al. 2012, "Mergeable Summaries") of ≤ ``capacity`` entries folds
    through Ray's aggregation tree (state per block/merge is O(capacity),
    NEVER the key cardinality), then ONE second streaming pass exactly
    recounts only the surviving candidates (broadcast membership
    filter, no shuffle of non-candidates).  Returns ``(table, info)``:
    ``table`` has exact counts for the top-``k`` candidates;
    ``info['max_undercount']`` is the summary's one-sided error bound D
    (any value absent from the candidates has true count ≤ D) and
    ``info['exact_guaranteed']`` is True when the k-th exact count
    exceeds D — the returned top-k is then provably the true top-k."""

    import pickle

    # the accumulator travels as PICKLED bytes: a (dict, int) tuple is
    # not Arrow-convertible, and Ray's aggregate logs a full
    # ArrowConversionError traceback per fold before falling back to
    # object blocks — bytes convert cleanly (and the summary is small,
    # O(capacity) entries)
    def _acc(state, block):
        d, delta = pickle.loads(state)
        vals, cnts = _block_counts(block, col, weight_col)
        for v, c in zip(vals.tolist(), cnts.tolist()):
            d[v] = d.get(v, 0) + c
        return pickle.dumps((d, delta + _mg_compress(d, capacity)))

    def _merge(a, b):
        d, ca = pickle.loads(a)
        db, cb = pickle.loads(b)
        for v, c in db.items():
            d[v] = d.get(v, 0) + c
        return pickle.dumps((d, ca + cb + _mg_compress(d, capacity)))

    agg = AggregateFn(
        init=lambda _: pickle.dumps(({}, 0)),
        accumulate_block=_acc,
        merge=_merge,
        name="mg",
    )
    out = ds.aggregate(agg)
    if out is None:
        return (
            pa.table({col: pa.array([], pa.string()),
                      count_col: pa.array([], pa.int64())}),
            {"max_undercount": 0, "exact_guaranteed": True},
        )
    cand, max_under = pickle.loads(out["mg"])

    def _col_type():
        try:
            sch = ds.schema(fetch_if_missing=False)
        except TypeError:
            sch = None
        if sch is not None and col in sch.names:
            tp = sch.types[sch.names.index(col)]
            if isinstance(tp, pa.DataType):
                return tp
            try:
                return pa.from_numpy_dtype(tp)
            except (TypeError, NotImplementedError,
                    pa.ArrowNotImplementedError):
                return None
        return None

    if not cand:
        # a non-empty dataset whose column is all null (or whose every
        # count was decremented away at tiny capacity): skip the
        # recount — pc.is_in rejects a null-typed empty value set
        tp = _col_type() or pa.null()
        return (
            pa.table({col: pa.array([], type=tp),
                      count_col: pa.array([], pa.int64())}),
            {"max_undercount": int(max_under),
             "exact_guaranteed": max_under == 0},
        )
    tp = _col_type()
    cand_arr = (
        pa.array(list(cand.keys()), type=tp)
        if tp is not None else pa.array(list(cand.keys()))
    )

    def recount(t: pa.Table) -> pa.Table:
        tv = t.filter(
            pc.fill_null(pc.is_in(t[col], value_set=cand_arr), False)
        )
        vals, cnts = _block_counts(tv, col, weight_col)
        return pa.table({
            col: pa.array(vals, type=cand_arr.type),
            "_pn": pa.array(cnts),
        })

    refs = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby(col)
        .sum("_pn")
        .map_batches(
            lambda t: t.rename_columns([col, count_col]),
            batch_format="pyarrow",
        )
        .sort([count_col, col], descending=[True, False])
        .limit(k)
        .materialize()  # to_arrow_refs on a lazy plan re-executes it
        .to_arrow_refs()
    )
    import ray as _ray

    parts = [t for t in _ray.get(refs) if t.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table({
        col: cand_arr.slice(0, 0), count_col: pa.array([], pa.int64()),
    })
    kth = tbl[count_col][min(k, tbl.num_rows) - 1].as_py() if tbl.num_rows else 0
    # exact iff (a) the summary never compressed (D == 0: candidates =
    # ALL distinct values, so the recount is the true top-k even with
    # fewer than k rows), or (b) a FULL k rows came back AND the k-th
    # exact count clears the bound — fewer than k rows with D > 0 can
    # silently miss values whose true count <= D
    return tbl, {
        "max_undercount": int(max_under),
        "exact_guaranteed": bool(
            max_under == 0
            or (tbl.num_rows >= k and kth > max_under)
        ),
    }
