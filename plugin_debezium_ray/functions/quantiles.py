"""Exact distributed quantiles — order statistics without collecting
the data.

``quantile_cont``-style sketches (t-digest, KLL) trade exactness for
one pass; this operator keeps EXACT ``quantile_disc`` semantics (the
element at 1-indexed rank ``max(1, ceil(q·n))`` of the sorted column —
DuckDB's discrete quantile, with the quantile treated as an exact
decimal the way a SQL literal is) at the cost of the one shuffle a
rank selection fundamentally needs:

  1. prune to the needed columns, drop nulls (SQL aggregate semantics)
  2. ONE range sort (by ``(group, value)`` for the grouped form) —
     the only all-to-all move
  3. selection: per-block group-run counts are computed by parallel
     tasks (each returns O(runs) tuples, never rows), the driver folds
     them into per-group cumulative offsets — O(groups × blocks)
     scalars — and maps every (group, q) to a (block, row-offset)
     coordinate
  4. point lookups: one task per block that holds a wanted coordinate
     returns just those scalar values; blocks nobody needs are never
     fetched

So the driver sees counts and the handful of answers, never data —
the same three-phase scan shape as ``pack_sequences``.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


# pickle-stable sentinel for NaN group keys (value-equal across tasks,
# unlike float('nan') objects, whose equality and hashing both break)
_NAN_KEY = ("__exact_quantiles_nan_group__",)


def _rank(q: float, n: int) -> int:
    """1-indexed rank of the q-quantile among n sorted values — DuckDB
    ``quantile_disc`` parity, verified exhaustively for n ≤ 12345 and
    q in centiles: ``max(1, ceil(q·n))`` with q as the EXACT decimal
    its SQL literal denotes (0.28·25 must be 7, not the 7.0000000000004
    double arithmetic gives)."""
    return max(1, math.ceil(Fraction(str(q)) * n))


def filter_by_quantile(
    ds: "ray.data.Dataset",
    col: str,
    q: float,
    *,
    keep: str = "above",
) -> "ray.data.Dataset":
    """Percentile-gated filter (the quality-floor / outlier-cap step of
    a data pipeline): compute the exact q-quantile of ``col`` once (one
    sort + a point lookup — see ``exact_quantiles``), then stream the
    dataset through a shuffle-free filter against the scalar cutoff.
    ``keep="above"`` keeps rows with ``col >= cutoff``; ``"below"``
    keeps ``col <= cutoff``.  Null values never pass."""
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    qdf = exact_quantiles(ds, col, [q])
    if len(qdf) == 0:
        # no non-null values at all: nothing passes
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        )
    cutoff = qdf["value"].iloc[0]

    def gate(t: pa.Table) -> pa.Table:
        c = t[col]
        cmp = pc.greater_equal(c, cutoff) if keep == "above" \
            else pc.less_equal(c, cutoff)
        return t.filter(pc.fill_null(cmp, False))

    return ds.map_batches(gate, batch_format="pyarrow")


@ray.remote
def _block_runs(tbl: pa.Table, by: "str | None"):
    """Group runs of one sorted block: [(group, start_row, count)].
    O(runs) output — for the global form, one tuple per block."""
    n = tbl.num_rows
    if n == 0:  # Ray sort emits schema-less empty blocks
        return []
    if by is None:
        return [(None, 0, n)]
    gc = tbl[by]
    if gc.null_count:
        # null groups: object path (numeric nulls surface as NaN in
        # numpy, and NaN != NaN would split one group into n runs)
        g = np.array(gc.to_pylist(), dtype=object)
        isnan = np.array(
            [isinstance(x, float) and x != x for x in g], dtype=bool
        )
    else:
        g = gc.to_numpy(zero_copy_only=False)
        isnan = np.isnan(g) if g.dtype.kind == "f" else None
    if isnan is not None and isnan.any():
        # true NaN values (non-null) are ONE group in SQL GROUP BY, but
        # NaN != NaN both in numpy run detection and as dict keys —
        # substitute a value-equal sentinel, mapped back on the driver
        g = g.astype(object)
        g[isnan] = _NAN_KEY
    change = np.flatnonzero(g[1:] != g[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    return [(g[s], int(s), int(e - s)) for s, e in zip(starts, ends)]


@ray.remote
def _pick(tbl: pa.Table, col: str, offsets: "list[int]"):
    """Point lookups in one block — returns len(offsets) scalars."""
    a = tbl[col]
    return [a[o].as_py() for o in offsets]


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: "list[float]",
    *,
    by: "str | None" = None,
    max_groups: int = 100_000,
) -> pd.DataFrame:
    """Exact discrete quantiles of ``col`` — globally, or per group of
    ``by``.  Returns a small DataFrame ``(q, value)`` (plus the group
    column first when ``by`` is given), q-ordered within each group (group order is an
    implementation detail — a hash order; sort the small result if you
    need value order).  Null
    values are ignored (SQL aggregate semantics); null GROUPS form
    their own group; a group with no non-null values is absent — both
    exactly ``GROUP BY`` + ``quantile_disc``.

    The result is driver-side by design: quantile output is O(groups ×
    len(qs)) scalars, the classic small-answer/huge-input aggregate —
    which also means ``by`` must be a ROLLUP key, not an id: the driver
    folds one span list per group.  ``max_groups`` guards that contract
    (same raise-don't-OOM style as ``broadcast_join``'s
    ``small_max_rows``); for million-group keys use
    ``grouped_quantiles_ds``, whose result stays a Dataset."""
    bad_q = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad_q:
        # a q > 1 would otherwise walk past every group's span and
        # silently emit nothing (q=25 for "25th percentile" deletes the
        # whole corpus through filter_by_quantile) — fail loudly instead
        raise ValueError(f"quantiles must be in [0, 1]: {bad_q}")
    cols = [col] if by is None else [by, col]

    def dropnull(t: pa.Table) -> pa.Table:
        t = t.select(cols).filter(pc.is_valid(t[col]))
        if by is not None:
            # the sort only needs every group CONTIGUOUS, not in any
            # meaningful order — sort by a uint64 HASH of the group
            # value: one fixed dtype for every key type (Ray's range
            # sort cannot partition on null string keys, and a typed
            # fill breaks on date/decimal/null-typed blocks), and even
            # a hash collision stays correct — the colliding groups'
            # rows interleave but each group's own rows remain ordered
            # by ``col``, and run detection reads the REAL column
            gc_ = t[by]
            if t.num_rows == 0:
                gf = np.empty(0, dtype=np.uint64)
            elif pa.types.is_integer(gc_.type) or pa.types.is_floating(gc_.type):
                # vectorized path — cast to float64 so blocks WITH nulls
                # (which numpy surfaces as float anyway) and blocks
                # without hash identically; a lossy int64→float64 cast
                # only merges two groups' HASHES, which the collision
                # argument above already tolerates
                gf = pd.util.hash_array(
                    gc_.to_numpy(zero_copy_only=False).astype(np.float64)
                )
            elif pa.types.is_string(gc_.type) or pa.types.is_large_string(gc_.type):
                gf = pd.util.hash_array(
                    gc_.to_numpy(zero_copy_only=False).astype(object)
                )
            else:  # exotic key types: object fallback
                vals = np.empty(t.num_rows, dtype=object)
                for i, v in enumerate(gc_.to_pylist()):
                    vals[i] = v
                gf = pd.util.hash_array(vals)
            t = t.append_column("_gf", pa.array(gf))
        return t

    cleaned = ds.map_batches(dropnull, batch_format="pyarrow")
    # materialize before to_arrow_refs: on a lazy Dataset the refs call
    # re-executes the whole upstream sort for its internal schema probe
    sort_keys = [col] if by is None else ["_gf", col]
    refs = cleaned.sort(sort_keys).materialize().to_arrow_refs()
    runs_per_block = ray.get([_block_runs.remote(r, by) for r in refs])

    # fold runs (arriving in global sorted order) into per-group spans
    spans: dict = {}  # group -> list[(block_i, start, count)]
    order: list = []  # first-seen (hash-sorted) group order
    for bi, runs in enumerate(runs_per_block):
        for g, start, cnt in runs:
            if g not in spans:
                if len(spans) >= max_groups:
                    raise ValueError(
                        f"exact_quantiles(by={by!r}) exceeded max_groups="
                        f"{max_groups}: the driver fold is O(groups) and "
                        "`by` must be a rollup key — raise max_groups "
                        "deliberately or use grouped_quantiles_ds, "
                        "whose result stays a distributed Dataset"
                    )
                spans[g] = []
                order.append(g)
            spans[g].append((bi, start, cnt))

    # map every (group, q) to its (block, offset) coordinate
    wanted: dict[int, list[int]] = {}  # block -> offsets
    slots: list = []  # (group, q, block, offset)
    for g in order:
        total = sum(c for _, _, c in spans[g])
        for q in qs:
            rest = _rank(q, total) - 1  # 0-indexed global rank in group
            for bi, start, cnt in spans[g]:
                if rest < cnt:
                    off = start + rest
                    wanted.setdefault(bi, []).append(off)
                    slots.append((g, q, bi, off))
                    break
                rest -= cnt

    fetched = ray.get(
        [_pick.remote(refs[bi], col, offs) for bi, offs in wanted.items()]
    )
    values = {
        (bi, off): v
        for (bi, offs), vals in zip(wanted.items(), fetched)
        for off, v in zip(offs, vals)
    }
    rows = [
        {**({by: (float("nan") if g == _NAN_KEY else g)}
            if by is not None else {}),
         "q": q, "value": values[(bi, off)]}
        for g, q, bi, off in slots
    ]
    out_cols = ([by] if by is not None else []) + ["q", "value"]
    return pd.DataFrame(rows, columns=out_cols)


def grouped_quantiles_ds(
    ds: "ray.data.Dataset",
    col: str,
    qs: "list[float]",
    *,
    by: str,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact per-group ``quantile_disc`` for HIGH-CARDINALITY ``by`` —
    the distributed complement of ``exact_quantiles(by=...)``: the
    result stays a Dataset of ``(by, q, value)`` rows (O(groups×qs) of
    them), so a million-user "p50/p95 per user" never folds a
    million-entry dict on the driver (the raise in ``exact_quantiles``'
    ``max_groups`` guard points here).

    Shape: ONE coarse hash-partition groupby on ``group_key_hash64(by)
    % num_partitions`` (the same block-stable hash the other grouped
    ops use — a collision only co-locates groups); within a partition,
    one Arrow sort by ``(by, col)`` then fully vectorized run detection
    + rank arithmetic (exact-Fraction ceil, DuckDB parity like
    ``_rank``) picks every group's answers in one ``take``.
    Partitioning assumption: one hash partition of (key, value) PAIRS
    must fit a task — raise ``num_partitions`` with the corpus.  Null
    ``col`` values are ignored (SQL aggregate semantics; all-null
    groups are absent); null and float-NaN ``by`` keys each form their
    own group."""
    from plugin_debezium_ray.functions.selection import group_key_hash64

    bad_q = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad_q:
        raise ValueError(f"quantiles must be in [0, 1]: {bad_q}")
    # exact-decimal rank arithmetic, vectorizable: rank(q, n) =
    # max(1, ceil(a·n / b)) with q = a/b exactly
    fracs = [Fraction(str(q)) for q in qs]

    # output types for empty blocks, WITHOUT executing the plan (a lazy
    # schema() fetch re-runs the upstream — smallfetch.py): static for
    # file reads / in-memory tables, None for opaque lazy upstreams
    def _as_arrow_type(tp):
        # pandas-block Datasets report numpy dtypes here, not Arrow types
        if isinstance(tp, pa.DataType):
            return tp
        try:
            return pa.from_numpy_dtype(tp)
        except (TypeError, NotImplementedError, pa.ArrowNotImplementedError):
            return None  # e.g. object dtype — no static seed then

    try:
        _sch = ds.schema(fetch_if_missing=False)
    except TypeError:
        _sch = None
    if _sch is None:
        try:
            # a SOURCE-ONLY plan (from_pandas/from_arrow/read with no
            # transforms) has nothing upstream to re-execute — fetching
            # its schema is safe and returns proper Arrow types
            if not ds._plan._logical_plan.dag.input_dependencies:
                _sch = ds.schema()
        except Exception:  # noqa: BLE001 — internals moved: no seed
            _sch = None
    static_types = None
    if _sch is not None and by in _sch.names and col in _sch.names:
        bt = _as_arrow_type(_sch.types[_sch.names.index(by)])
        vt = _as_arrow_type(_sch.types[_sch.names.index(col)])
        if bt is not None and vt is not None:
            static_types = (bt, vt)

    def prep(t: pa.Table) -> pa.Table:
        t = t.select([by, col]).filter(pc.is_valid(t[col]))
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int32()))
        h = group_key_hash64(t[by])
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def empty_out(by_type, val_type) -> pa.Table:
        return pa.table({
            by: pa.array([], type=by_type),
            "q": pa.array([], type=pa.float64()),
            "value": pa.array([], type=val_type),
        })

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # keep the (by, q, value) OUTPUT schema even for empty
            # blocks — returning the input block leaks the input schema
            # (or no schema at all: Ray sort emits schema-less empties)
            # and an all-filtered run would yield a zero-column Dataset
            if by in t.column_names and col in t.column_names:
                return empty_out(t[by].type, t[col].type)
            if static_types is not None:
                return empty_out(*static_types)
            return t  # schema-less AND lazy upstream: can't type it
        order = pc.sort_indices(
            pa.table({"_g": t[by], "_v": t[col]}),
            sort_keys=[("_g", "ascending"), ("_v", "ascending")],
            null_placement="at_end",
        )
        t = t.take(order)
        gc = t[by]
        arr = gc.chunk(0) if gc.num_chunks == 1 else gc.combine_chunks()
        denc = arr.dictionary_encode()  # NaNs share one slot; nulls -> null
        raw = denc.indices.to_numpy(zero_copy_only=False)
        if raw.dtype.kind == "f":  # null keys surface as NaN indices
            codes = np.where(
                np.isnan(raw), np.int64(len(denc.dictionary)), raw
            ).astype(np.int64)
        else:
            codes = raw.astype(np.int64, copy=False)
        n = len(codes)
        new = np.empty(n, dtype=bool)
        new[0] = True
        np.not_equal(codes[1:], codes[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        pos_parts = []
        q_parts = []
        for q, f in zip(qs, fracs):
            a, b = f.numerator, f.denominator
            ranks = np.maximum(1, -((-a * counts) // b))  # ceil(a·n/b)
            pos_parts.append(starts + ranks - 1)
            q_parts.append(np.full(len(starts), q, dtype=np.float64))
        # one take for keys, one for values, all qs at once
        key_idx = np.tile(starts, len(qs))
        val_idx = np.concatenate(pos_parts)
        return pa.table({
            by: pc.take(arr, pa.array(key_idx)),
            "q": pa.array(np.concatenate(q_parts)),
            "value": pc.take(t[col].combine_chunks(), pa.array(val_idx)),
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(finish, batch_format="pyarrow")
    )
    if static_types is not None:
        # schema seed: an EMPTY grouped result has zero blocks (finish
        # never runs), which would surface as a zero-column Dataset —
        # union one typed empty block so the (by, q, value) contract
        # holds even when every group is filtered away
        out = out.union(ray.data.from_arrow(empty_out(*static_types)))
    return out


# ----------------------------------------------------- KLL approx sketch
#
# The one-pass, no-shuffle complement of exact_quantiles for 100-TB
# columns: a KLL sketch (Karnin, Lang, Liberty 2016, "Optimal Quantile
# Approximation in Streams" — public) folds through Ray's aggregation
# tree.  Per-block state is O(k·log(n/k)) float64s, merges are
# associative, and only sketches — never rows — leave the workers.
# Rank error is O(1/k) with high probability; the compaction coin is a
# deterministic splitmix64 bit so identical inputs reproduce byte-
# identical sketches (Ray retries and reruns stay stable).

_KLL_C = 2.0 / 3.0


def _kll_cap(k: int, depth_from_top: int) -> int:
    return max(2, int(math.ceil(k * (_KLL_C ** depth_from_top))))


def _sm64(x: np.uint64) -> np.uint64:
    z = (np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _kll_compress(levels: list, coin: int, k: int):
    """Compact levels until every one fits its capacity.  Level h keeps
    every other element of its sorted run (offset = deterministic
    pseudo-random bit); the survivors promote to level h+1 where each
    carries twice the weight (weight is implicit in the level index)."""
    with np.errstate(all="ignore"):
        while True:
            H = len(levels)
            over = None
            for h in range(H):
                if len(levels[h]) > _kll_cap(k, H - h - 1):
                    over = h
                    break
            if over is None:
                return levels, coin
            arr = np.sort(levels[over])
            off = int(_sm64(np.uint64(coin)) & np.uint64(1))
            coin += 1
            promoted = arr[off::2]
            levels[over] = np.empty(0, dtype=np.float64)
            if over + 1 == len(levels):
                levels.append(promoted)
            else:
                levels[over + 1] = np.concatenate(
                    [levels[over + 1], promoted]
                )


def _kll_add_block(state, values: np.ndarray, k: int):
    levels, coin, n = state
    v = values[~np.isnan(values)]
    if len(v) == 0:
        return state
    levels = list(levels)
    levels[0] = np.concatenate([levels[0], v.astype(np.float64)])
    levels, coin = _kll_compress(levels, coin, k)
    return levels, coin, n + len(v)


def _kll_merge(a, b, k: int):
    la, ca, na = a
    lb, cb, nb = b
    H = max(len(la), len(lb))
    levels = []
    for h in range(H):
        xs = []
        if h < len(la):
            xs.append(la[h])
        if h < len(lb):
            xs.append(lb[h])
        levels.append(
            np.concatenate(xs) if xs else np.empty(0, dtype=np.float64)
        )
    levels, coin = _kll_compress(levels, ca + cb, k)
    return levels, coin, na + nb


def _kll_query(state, qs: "list[float]") -> "list[float]":
    levels, _, n = state
    vals = np.concatenate(levels)
    wts = np.concatenate([
        np.full(len(lv), 1 << h, dtype=np.int64)
        for h, lv in enumerate(levels)
    ])
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    total = cum[-1]
    out = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        rank = max(1, math.ceil(Fraction(str(q)) * int(total)))
        out.append(float(vals[np.searchsorted(cum, rank)]))
    return out


def approx_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: "list[float]",
    *,
    k: int = 256,
) -> pd.DataFrame:
    """Approximate quantiles of ``col`` in ONE streaming pass with NO
    shuffle: per-block KLL folds merge through Ray's aggregation tree;
    the driver receives one O(k·log(n/k))-float sketch and reads the
    answers out of it.  Values are treated as float64 (nulls/NaNs
    skipped); rank error is O(1/k) w.h.p. — k=256 lands well under 1%
    in practice (pinned by tests/test_history.py against
    ``exact_quantiles`` on the same input).  Returns ``(q, value)``
    like the exact form; returns an empty frame for an all-null/empty
    column."""
    from ray.data.aggregate import AggregateFn

    def _vals(block):
        c = block[col]
        if isinstance(c, (pa.Array, pa.ChunkedArray)):
            arr = c.to_numpy(zero_copy_only=False)
        else:
            arr = np.asarray(c)
        return pd.to_numeric(pd.Series(arr), errors="coerce").to_numpy(
            np.float64
        )

    agg = AggregateFn(
        init=lambda _: ([np.empty(0, dtype=np.float64)], 0, 0),
        accumulate_block=lambda s, b: _kll_add_block(s, _vals(b), k),
        merge=lambda a, b: _kll_merge(a, b, k),
        name="kll",
    )
    out = ds.aggregate(agg)
    if out is None or out["kll"][2] == 0:
        return pd.DataFrame({"q": pd.Series([], dtype=np.float64),
                             "value": pd.Series([], dtype=np.float64)})
    return pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "value": _kll_query(out["kll"], qs),
    })
