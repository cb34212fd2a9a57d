"""Broadcast hash join — the shuffle-free join for star-schema
enrichment.

``Dataset.join`` is an all-to-all exchange (both sides hash-partition,
one aggregator actor per partition).  When one side is a dimension
table (bounded by contract: customers, nations, vocabularies, label
maps), the scale-correct plan is to ship the SMALL side to every task
once — ``ray.put`` the whole table, fetch it once per actor, and join
each streaming batch against it in memory.  The big side never moves.

At 100 TB the big side is the corpus and the dimension fits in tens of
MBs; a shuffle join would move the corpus across the cluster for no
reason.  This is the pattern the engine's own dedup verify-joins use
implicitly (broadcast candidate sets under a measured bound), exposed
as a first-class operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from plugin_debezium_ray.functions.selection import group_key_hash64

_HOW_TO_ARROW = {
    "inner": "inner",
    "left": "left outer",
}


def _join_batch(t: pa.Table, small_ref, keys, right_keys,
                join_type) -> pa.Table:
    """Stateless task: ``ray.get`` of an Arrow table is a ZERO-COPY
    plasma mmap (cached per node after the first fetch), so fetching the
    broadcast side per task costs microseconds — cheaper than paying
    actor-pool spin-up per pipeline (measured: ~1 s/pool).  Empty
    batches go through the join too: Arrow yields the JOINED schema for
    an empty left table, while short-circuiting would emit blocks with
    the pre-join schema mixed into the stream."""
    return t.join(
        ray.get(small_ref),
        keys=keys,
        right_keys=right_keys,
        join_type=join_type,
    )


def broadcast_join(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    *,
    on: "str | list[str]",
    right_on: "str | list[str] | None" = None,
    how: str = "inner",
    small_max_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """Join a streaming ``big`` Dataset against a bounded ``small`` one
    without any shuffle: the small side is collected once, ``ray.put``
    once, and every task joins its batches against the zero-copy
    broadcast in memory (Arrow hash join).  ``how`` ∈ {"inner", "left"}
    (left keeps unmatched big rows with nulls).

    The small side must actually be small — ``small_max_rows`` guards
    the contract (raises instead of silently OOMing every actor); above
    it, use ``Dataset.join`` (the shuffle join) instead.  Key columns
    keep the left name; non-key column names must not collide (select
    before joining).  Rows of ``big`` whose key is null never match
    (SQL semantics)."""
    if how not in _HOW_TO_ARROW:
        raise ValueError(f"how must be one of {sorted(_HOW_TO_ARROW)}")
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    from plugin_debezium_ray.smallfetch import fetch_small_table

    small_tbl = fetch_small_table(small)
    if small_tbl.num_rows > small_max_rows:
        raise ValueError(
            f"broadcast side has {small_tbl.num_rows} rows "
            f"(> small_max_rows={small_max_rows}); use Dataset.join for "
            "big-big joins"
        )
    ref = ray.put(small_tbl)
    return big.map_batches(
        _join_batch,
        fn_kwargs={
            "small_ref": ref,
            "keys": keys,
            "right_keys": rkeys,
            "join_type": _HOW_TO_ARROW[how],
        },
        batch_format="pyarrow",
    )


def _names_without_execution(ds: "ray.data.Dataset") -> list:
    """Column names for a collision check WITHOUT executing the plan: a
    plain ``schema()`` on a lazy Dataset runs a limit-1 sub-plan that
    re-executes the upstream (measured in smallfetch.py).  When names
    aren\'t statically known the guard is skipped — a genuine collision
    then surfaces as Arrow\'s duplicate-column error in the first batch."""
    try:
        sch = ds.schema(fetch_if_missing=False)
    except TypeError:  # older signature
        return []
    return list(sch.names) if sch is not None else []


def _valid_key_mask(t: pa.Table, cols) -> "pa.ChunkedArray":
    """Join-key validity: null OR (for float columns) NaN keys never
    match — pandas merge_asof refuses both, and SQL key semantics agree
    (NaN is not equal-comparable as a key)."""
    m = None
    for c in cols:
        v = pc.is_valid(t[c])
        if pa.types.is_floating(t[c].type):
            # fill_null first: is_nan(null) is null, and a null in the
            # AND would leak through the invert
            v = pc.and_(v, pc.invert(pc.is_nan(pc.fill_null(t[c], 0.0))))
        m = v if m is None else pc.and_(m, v)
    return m


# ----------------------------------------------------------- asof join


# probes built from a broadcast ref, cached per WORKER PROCESS: Ray
# reuses worker processes across tasks, so after the first task per
# worker this is actor-pool state WITHOUT an actor pool — measured ~1 s
# pool spin-up per query avoided (the same reason broadcast_join uses
# stateless tasks; asof_join at sf0.1 dropped 4.2 → 1.6 s end-to-end).
# Keyed by (cls, ref.hex(), params).  Memory contract: the cache is
# FIFO-bounded to 2 entries per worker (two concurrently-running
# broadcast joins share workers without thrashing; a third evicts the
# oldest), and the probes' Arrow payload columns are zero-copy views
# into the plasma broadcast wherever single-chunk (the common ray.get
# layout), so the retained private heap per entry is roughly the sorted
# key frame — not the whole right side.  Rebuilds after eviction are
# cheap by the small-side contract.
_PROBE_CACHE: dict = {}
_PROBE_CACHE_MAX = 2


def _cached_probe(t: pa.Table, *, cls, small_ref, params: tuple,
                  kwargs: dict) -> pa.Table:
    key = (cls.__name__, small_ref.hex(), params)
    probe = _PROBE_CACHE.get(key)
    if probe is None:
        while len(_PROBE_CACHE) >= _PROBE_CACHE_MAX:
            _PROBE_CACHE.pop(next(iter(_PROBE_CACHE)))  # FIFO evict
        probe = cls(small_ref, **kwargs)
        _PROBE_CACHE[key] = probe
    return probe(t)


def _view_chunks(ca: "pa.ChunkedArray") -> pa.Array:
    """One contiguous Array from a column WITHOUT copying when it is
    already single-chunk (``combine_chunks()`` copies even then — r3
    measured note) — keeps cached probe payloads as views into the
    plasma broadcast instead of private heap copies."""
    return ca.chunk(0) if ca.num_chunks == 1 else ca.combine_chunks()


class _AsofProbe:
    """Per-worker-cached probe for the broadcast as-of join: the
    (small, bounded) right side is fetched and index-sorted ONCE per
    worker; each batch runs ``pd.merge_asof`` — the grouped
    backward/forward binary search, a C kernel with no Arrow
    equivalent — against it to find the matched right ROW INDEX only,
    then gathers the right payload columns with ``pc.take`` using a
    null-masked index array, so unmatched rows yield typed Arrow nulls
    (an int64 payload stays int64; no float drift between blocks)."""

    def __init__(self, small_ref, on: str, by: "str | None",
                 direction: str, allow_exact_matches: bool):
        right = ray.get(small_ref)  # zero-copy plasma mmap
        keep = _valid_key_mask(right, [on] + ([by] if by else []))
        if keep.null_count or not pc.all(keep).as_py():
            # filter COPIES — skip when it would be a no-op, so the
            # cached payload views below stay zero-copy into plasma
            right = right.filter(keep)  # null/NaN right keys never match
        self.on = on
        self.by = by
        self.direction = direction
        self.allow_exact = allow_exact_matches
        self.payload = [
            c for c in right.column_names if c != on and c != by
        ]
        self.right_cols = {
            c: _view_chunks(right[c]) for c in self.payload
        }
        rdf = pd.DataFrame({on: right[on].to_pandas()})
        if by is not None:
            rdf[by] = right[by].to_pandas()
        rdf["_ridx"] = np.arange(len(rdf), dtype=np.int64)
        self.rdf = rdf.sort_values(on, kind="stable").reset_index(drop=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ridx = np.full(n, -1, dtype=np.int64)
        if n:
            # null on/by keys never match (SQL join-key semantics), and
            # merge_asof refuses null keys outright — filter BEFORE the
            # pandas conversion: an int64 key column with one null would
            # otherwise convert to float64 and MergeError against the
            # int64 right frame
            valid = _valid_key_mask(
                t, [self.on] + ([self.by] if self.by else [])
            )
            lidx = np.flatnonzero(
                valid.to_numpy(zero_copy_only=False).astype(bool)
            )
            if len(lidx):
                tv = t.take(pa.array(lidx))
                ldf = pd.DataFrame({self.on: tv[self.on].to_pandas()})
                if self.by is not None:
                    ldf[self.by] = tv[self.by].to_pandas()
                ldf["_lidx"] = lidx
                lv = ldf.sort_values(self.on, kind="stable")
                m = pd.merge_asof(
                    lv, self.rdf, on=self.on, by=self.by,
                    direction=self.direction,
                    allow_exact_matches=self.allow_exact,
                )
                got = m["_ridx"].fillna(-1).to_numpy(np.int64)
                ridx[m["_lidx"].to_numpy(np.int64)] = got
        mask = ridx < 0
        idx = pa.array(np.where(mask, 0, ridx), type=pa.int64(),
                       mask=mask)  # masked → null → pc.take yields null
        cols = {c: t[c] for c in t.column_names}
        for c in self.payload:
            cols[c] = pc.take(self.right_cols[c], idx)
        return pa.table(cols)


def asof_join_broadcast(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    *,
    on: str,
    by: "str | None" = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    small_max_rows: int = 5_000_000,
) -> "ray.data.Dataset":
    """As-of (event-time lookup) LEFT join: every row of ``big`` gets
    the payload of the ``small`` row with equal ``by`` key and the
    greatest ``on`` ≤ big's ``on`` (``direction="backward"``; SQL
    ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``), or typed
    nulls when no such row exists.  ``direction`` ∈ {"backward",
    "forward", "nearest"}.

    Scale shape: the right side is a bounded reference series
    (checkpoints, prices, config epochs) — collected once, ``ray.put``
    once, sorted once per actor; the big side streams through a
    shuffle-free actor-pool ``map_batches`` whose per-batch work is one
    sort + one grouped binary search.  The right side should be unique
    per ``(by, on)``: among exact duplicates the LAST in input order
    wins (deduplicate upstream for well-defined semantics).  Right
    payload column names must not collide with left names (select /
    rename before joining); the matched ``on`` value is not re-emitted
    — include it as a renamed payload column if needed."""
    from plugin_debezium_ray.smallfetch import fetch_small_table

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    small_tbl = fetch_small_table(small)
    if small_tbl.num_rows > small_max_rows:
        raise ValueError(
            f"asof broadcast side has {small_tbl.num_rows} rows "
            f"(> small_max_rows={small_max_rows})"
        )
    big_names = _names_without_execution(big)
    overlap = [
        c for c in small_tbl.column_names
        if c not in (on, by) and c in big_names
    ]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")
    ref = ray.put(small_tbl)
    # stateless TASKS with a per-worker probe cache — no actor-pool
    # spin-up (task parallelism is scheduler-managed)
    return big.map_batches(
        _cached_probe,
        fn_kwargs={
            "cls": _AsofProbe,
            "small_ref": ref,
            "params": (on, by, direction, allow_exact_matches),
            "kwargs": {
                "on": on,
                "by": by,
                "direction": direction,
                "allow_exact_matches": allow_exact_matches,
            },
        },
        batch_format="pyarrow",
    )


# -------------------------------------------------------- interval join


class _IntervalProbe:
    """Actor-pool probe for the broadcast interval (range) join: the
    bounded interval table is fetched once per actor and split into
    numpy (start, end) arrays; each batch sorts its event times once,
    then every interval becomes TWO binary searches (start, end) whose
    slice of the sorted order is the match set — O(|intervals|·log
    batch + |output|) per batch, never the |batch|×|intervals| cross
    product.  With a ``by`` key, rows are factorized and the same two
    searches run inside each key's run of the (key, time)-sorted
    order against that key's own intervals."""

    def __init__(self, small_ref, on: str, start_col: str, end_col: str,
                 by: "str | None" = None):
        right = ray.get(small_ref)
        keep = pc.and_(pc.is_valid(right[start_col]),
                       pc.is_valid(right[end_col]))
        # inverted intervals (end <= start) can never contain a point —
        # dropping them here also keeps hi - lo non-negative below
        keep = pc.and_(keep, pc.greater(right[end_col], right[start_col]))
        if by is not None:
            # null AND float-NaN keys never match (same join-key
            # semantics as the asof joins' _valid_key_mask)
            keep = pc.and_(keep, _valid_key_mask(right, [by]))
        if keep.null_count or not pc.all(keep).as_py():
            # (null keep entries — null bounds — drop on filter, so the
            # no-op skip requires a fully non-null all-true mask)
            right = right.filter(keep)
        self.on = on
        self.by = by
        self.start = right[start_col].to_numpy(zero_copy_only=False)
        self.end = right[end_col].to_numpy(zero_copy_only=False)
        drop = {start_col, end_col} | ({by} if by else set())
        self.payload = {
            c: _view_chunks(right[c])
            for c in right.column_names if c not in drop
        }
        if by is not None:
            idx: dict = {}
            for i, k in enumerate(right[by].to_pylist()):
                idx.setdefault(k, []).append(i)  # bounded interval set
            self.by_index = {
                k: np.asarray(v, dtype=np.int64) for k, v in idx.items()
            }

    def __call__(self, t: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            cols = {c: t[c].slice(0, 0) for c in t.column_names}
            for c, arr in self.payload.items():
                cols[c] = arr.slice(0, 0)
            return pa.table(cols)

        n = t.num_rows
        if n == 0 or len(self.start) == 0:
            return empty()
        ts = t[self.on].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(ts)
        if self.by is None:
            order = np.argsort(ts, kind="stable")
            order = order[valid[order]]
            sorted_ts = ts[order]
            lo = np.searchsorted(sorted_ts, self.start, side="left")
            hi = np.searchsorted(sorted_ts, self.end, side="left")
            counts = np.maximum(hi - lo, 0)
            total = int(counts.sum())
            if total == 0:
                return empty()
            # segmented arange over the matched slices of the sorted order
            goff = np.concatenate([[0], np.cumsum(counts)[:-1]])
            pos = np.repeat(lo, counts) + (
                np.arange(total, dtype=np.int64) - np.repeat(goff, counts)
            )
            left_idx = order[pos]
            right_idx = np.repeat(
                np.arange(len(self.start), dtype=np.int64), counts
            )
        else:
            kv = np.empty(n, dtype=object)
            for i, k in enumerate(t[self.by].to_pylist()):
                kv[i] = k
            # pd.isna covers None AND float NaN: a NaN key would
            # factorize to code -1 and uniques[-1] silently WRAPS to the
            # last key's intervals (and an all-NaN batch would IndexError
            # on empty uniques) — exclude both like the asof joins do
            valid &= ~pd.isna(kv)
            vidx = np.flatnonzero(valid)
            if len(vidx) == 0:
                return empty()
            codes, uniques = pd.factorize(kv[vidx])
            order_v = np.lexsort((ts[vidx], codes))
            order = vidx[order_v]  # (key, time)-sorted valid positions
            sc = codes[order_v]
            sorted_ts = ts[order]
            run_new = np.empty(len(sc), dtype=bool)
            run_new[0] = True
            np.not_equal(sc[1:], sc[:-1], out=run_new[1:])
            run_starts = np.flatnonzero(run_new)
            run_ends = np.concatenate([run_starts[1:], [len(sc)]])
            l_parts, r_parts = [], []
            for rs, re_ in zip(run_starts, run_ends):
                ivs = self.by_index.get(uniques[sc[rs]])
                if ivs is None:
                    continue
                seg = sorted_ts[rs:re_]
                lo = rs + np.searchsorted(seg, self.start[ivs], side="left")
                hi = rs + np.searchsorted(seg, self.end[ivs], side="left")
                counts = np.maximum(hi - lo, 0)
                total = int(counts.sum())
                if total == 0:
                    continue
                goff = np.concatenate([[0], np.cumsum(counts)[:-1]])
                pos = np.repeat(lo, counts) + (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(goff, counts)
                )
                l_parts.append(order[pos])
                r_parts.append(np.repeat(ivs, counts))
            if not l_parts:
                return empty()
            left_idx = np.concatenate(l_parts)
            right_idx = np.concatenate(r_parts)
        out = t.take(pa.array(left_idx))
        cols = {c: out[c] for c in out.column_names}
        ridx = pa.array(right_idx)
        for c, arr in self.payload.items():
            cols[c] = pc.take(arr, ridx)
        return pa.table(cols)


def interval_join_broadcast(
    big: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    on: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: "str | None" = None,
    small_max_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Range (interval-containment) INNER join: one output row for
    every ``(big row, interval)`` pair with ``start ≤ big.on < end`` —
    SQL ``JOIN iv ON e.on >= iv.start AND e.on < iv.end``.  Overlapping
    intervals multiply-match by definition; rows in no interval (or
    with null ``on``) are dropped; intervals with null bounds never
    match.  With ``by``, containment additionally requires key equality
    (per-user maintenance windows) — SQL adds ``AND e.by = iv.by``; the
    key column is consumed from the interval side, not re-emitted.

    Scale shape: the interval table is a bounded reference set
    (maintenance windows, sessions, experiment epochs) — collected and
    ``ray.put`` once; the big side streams through a shuffle-free
    actor-pool ``map_batches``.  Interval payload column names must not
    collide with big-side names (select/rename before joining)."""
    from plugin_debezium_ray.smallfetch import fetch_small_table

    small_tbl = fetch_small_table(intervals)
    if small_tbl.num_rows > small_max_rows:
        raise ValueError(
            f"interval side has {small_tbl.num_rows} rows "
            f"(> small_max_rows={small_max_rows})"
        )
    big_names = _names_without_execution(big)
    overlap = [
        c for c in small_tbl.column_names
        if c not in (start_col, end_col, by) and c in big_names
    ]
    if overlap:
        raise ValueError(
            f"interval payload columns collide with left: {overlap}"
        )
    ref = ray.put(small_tbl)
    return big.map_batches(
        _cached_probe,
        fn_kwargs={
            "cls": _IntervalProbe,
            "small_ref": ref,
            "params": (on, start_col, end_col, by),
            "kwargs": {
                "on": on,
                "start_col": start_col,
                "end_col": end_col,
                "by": by,
            },
        },
        batch_format="pyarrow",
    )


# -------------------------------------------------------- shuffle join


def shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: "str | tuple[str, ...]",
    right_on: "str | tuple[str, ...] | None" = None,
    how: str = "inner",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Big-big hash join — the shuffle join for when NEITHER side is a
    bounded dimension table (fact ⋈ fact: lineitem ⋈ orders, events ⋈
    events).  Both sides hash-partition on the key and one aggregator
    actor per partition performs the partition-local join; only key-
    matched co-partitions ever meet, so the exchange is one pass over
    each side.

    This wraps ``Dataset.join`` with the guard a shared/local session
    needs: each join partition is a long-lived 1-CPU aggregator actor,
    so requesting more partitions than ``cluster CPUs - 2`` DEADLOCKS a
    small session (observed on Ray 2.49) — ``num_partitions`` is
    clamped to the session's budget (on a big cluster the requested
    value wins; size it to cluster CPUs).  Caveat carried from the
    dedup joins: if an input went through a sort-based ``map_groups``,
    launder its schema-less empty blocks (e.g. ``repartition``) first —
    ``Dataset.join`` rejects them.

    Prefer ``broadcast_join`` whenever one side is bounded — it moves
    nothing; this op moves BOTH sides once."""
    from plugin_debezium_ray.functions.dedup import _join_parts

    hows = {"inner", "left_outer", "right_outer", "full_outer"}
    if how not in hows:
        raise ValueError(f"how must be one of {sorted(hows)}")
    lkey = (on,) if isinstance(on, str) else tuple(on)
    rkey = (
        lkey if right_on is None
        else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    )
    return left.join(
        right,
        join_type=how,
        num_partitions=_join_parts(num_partitions),
        on=lkey,
        right_on=rkey,
    )


# ---------------------------------------------------- asof shuffle join


def asof_join_shuffle(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    by: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Big-big as-of LEFT join — the co-partitioned complement of
    ``asof_join_broadcast`` for when the reference series is itself
    corpus-scale (per-user activity vs per-user checkpoint streams):
    both sides are tagged and hash-co-partitioned on ``hash(by) %
    num_partitions`` in ONE groupby shuffle, so each partition holds
    MANY complete key groups and the per-partition work is a single
    grouped binary search (``pd.merge_asof(by=...)``, the C kernel —
    one call per partition, never per key: a per-key ``map_groups``
    measured 12.8 s vs this shape's ~1 s on the same sf0.1 input).

    Left rows with a null (or float-NaN) ``on``/``by`` key surface
    unmatched via a RESERVED partition id — still the same single pass
    over the left side (SQL left-join semantics); invalid-keyed right
    rows never match.  Right payload columns keep their Arrow types
    (null-masked take — unmatched int64 stays int64).  Partitioning
    assumption: one hash partition must fit a task — raise
    ``num_partitions`` with the corpus.  Schemas are resolved eagerly
    to build the tagged union — ``materialize()`` a lazy input first if
    its upstream is expensive (a lazy ``schema()`` runs a limit-1 plan
    of the whole upstream).

    Tie contract: with DUPLICATE ``(by, on)`` right rows the winner is
    unspecified — row order inside a shuffle partition is not
    deterministic across runs, so reruns may pick different payloads
    (``asof_join_broadcast`` instead guarantees last-in-input-order).
    Dedupe the reference side upstream when duplicate keys are
    possible; a global tiebreak here would cost a full extra sort of
    the right side for a case LWW upstreams already resolve."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")

    def _names_types(ds):
        sch = ds.schema()  # static for file reads / in-memory tables
        return list(sch.names), dict(zip(sch.names, sch.types))

    lnames, ltypes = _names_types(left)
    rnames, rtypes = _names_types(right)
    rpayload = [c for c in rnames if c not in (on, by)]
    overlap = [c for c in rpayload if c in lnames]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")
    out_cols = lnames + rpayload
    canon = [by, on] + [c for c in lnames if c not in (by, on)] \
        + rpayload + ["_side", "_part"]

    def _pad(tv: pa.Table, cols, types) -> pa.Table:
        for c in cols:
            tv = tv.append_column(c, pa.nulls(tv.num_rows, types[c]))
        return tv

    def prep_left(t: pa.Table) -> pa.Table:
        tv = _pad(t, rpayload, rtypes)
        tv = tv.append_column(
            "_side", pa.array(np.zeros(tv.num_rows, dtype=np.int8))
        )
        # invalid keys ride the SAME pass into a reserved partition with
        # no right rows: per_partition emits them unmatched for free.
        # Hash ONLY the valid rows — converting a nullable int column to
        # numpy turns it float64, and float-object hashes would never
        # meet the right side's int-object hashes
        valid = _valid_key_mask(tv, [on, by]).to_numpy(
            zero_copy_only=False
        ).astype(bool)
        part = np.full(tv.num_rows, num_partitions, dtype=np.int32)
        if valid.any():
            h = group_key_hash64(tv.filter(pa.array(valid))[by])
            part[valid] = (h % np.uint64(num_partitions)).astype(np.int32)
        return tv.append_column("_part", pa.array(part)).select(canon)

    def prep_right(t: pa.Table) -> pa.Table:
        tv = t.filter(_valid_key_mask(t, [on, by]))
        tv = _pad(
            tv, [c for c in lnames if c not in (by, on)], ltypes
        )
        tv = tv.append_column(
            "_side", pa.array(np.ones(tv.num_rows, dtype=np.int8))
        )
        h = group_key_hash64(tv[by])
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return tv.append_column("_part", pa.array(part)).select(canon)

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # an empty block may arrive schema-less OR with the canon
            # schema — emit out_cols when they exist so every block of
            # the stream shares one schema
            if set(out_cols) <= set(t.column_names):
                return t.select(out_cols)
            return t
        side = t["_side"].to_numpy(zero_copy_only=False)
        lpos = np.flatnonzero(side == 0)
        rpos = np.flatnonzero(side == 1)
        out_left = t.take(pa.array(lpos))
        if len(lpos) == 0:
            return out_left.select(out_cols)
        if len(rpos) == 0:
            # no right rows here (includes the reserved invalid-key
            # partition): every left row is unmatched
            idx = pa.nulls(len(lpos), pa.int64())
        else:
            rt = t.take(pa.array(rpos))
            ldf = pd.DataFrame({
                by: out_left[by].to_pandas(),
                on: out_left[on].to_pandas(),
                "_lidx": np.arange(len(lpos), dtype=np.int64),
            })
            rdf = pd.DataFrame({
                by: rt[by].to_pandas(),
                on: rt[on].to_pandas(),
                "_ridx": rpos.astype(np.int64),
            })
            m = pd.merge_asof(
                ldf.sort_values(on, kind="stable"),
                rdf.sort_values(on, kind="stable"),
                on=on, by=by, direction=direction,
                allow_exact_matches=allow_exact_matches,
            )
            ridx = np.full(len(lpos), -1, dtype=np.int64)
            ridx[m["_lidx"].to_numpy(np.int64)] = \
                m["_ridx"].fillna(-1).to_numpy(np.int64)
            mask = ridx < 0
            idx = pa.array(np.where(mask, 0, ridx), type=pa.int64(),
                           mask=mask)
        cols = {c: out_left[c] for c in out_cols if c not in rpayload}
        for c in rpayload:
            cols[c] = pc.take(t[c].combine_chunks(), idx)
        return pa.table({c: cols[c] for c in out_cols})

    return (
        left.map_batches(prep_left, batch_format="pyarrow")
        .union(right.map_batches(prep_right, batch_format="pyarrow"))
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


# ---------------------------------------------------- window (band) join


def window_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    on: str,
    by: str,
    before,
    after,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Big-big stream-stream TIME-WINDOW equi-join (band join): one
    output row per (left, right) pair with equal ``by`` keys and
    ``right.on ∈ [left.on − before, left.on + after]`` (both bounds
    inclusive) — SQL ``a JOIN b ON a.by = b.by AND b.on BETWEEN a.on −
    before AND a.on + after``.  The co-partitioned complement of
    ``interval_join_broadcast`` for when BOTH sides are corpus-scale
    (event correlation: per-user context events around each anchor).

    Shape: both sides tagged and hash-co-partitioned on the key in ONE
    groupby shuffle (the asof_join_shuffle pattern); per partition the
    right side is (key, time)-sorted once, then each key run answers
    ALL of its left anchors with two batched ``searchsorted`` calls and
    a segmented-arange expansion — O((L+R)·log R + output), never the
    per-key cross product.  Key identity is exact (Arrow
    dictionary-encode over the UNION of both key columns — no pandas
    float64 detour).  Null/NaN keys and null times never match (INNER
    join).  ``on`` must be numeric or timestamp; for timestamps,
    ``before``/``after`` are in MICROSECONDS (the column is cast to
    int64 µs).  Right payload column names must not collide with left
    names; the right ``on``/``by`` are dropped (re-select/rename
    upstream to keep them).  Partitioning assumption: one hash
    partition must fit a task — raise ``num_partitions`` with the
    corpus.  Schemas are resolved eagerly (materialize a lazy input
    whose upstream is expensive first)."""

    def _names_types(ds):
        sch = ds.schema()
        return list(sch.names), dict(zip(sch.names, sch.types))

    lnames, ltypes = _names_types(left)
    rnames, rtypes = _names_types(right)
    rpayload = [c for c in rnames if c not in (on, by)]
    overlap = [c for c in rpayload if c in lnames]
    if overlap:
        raise ValueError(f"right payload columns collide with left: {overlap}")
    out_cols = lnames + rpayload
    canon = [by, on] + [c for c in lnames if c not in (by, on)] \
        + rpayload + ["_side", "_part"]

    def _pad(tv: pa.Table, cols, types) -> pa.Table:
        for c in cols:
            tv = tv.append_column(c, pa.nulls(tv.num_rows, types[c]))
        return tv

    def _prep(side: int, pad_cols, pad_types):
        def go(t: pa.Table) -> pa.Table:
            # INNER join: rows with a null/NaN key or null time can
            # never match — drop them BEFORE the shuffle
            tv = t.filter(_valid_key_mask(t, [on, by]))
            tv = _pad(tv, pad_cols, pad_types)
            tv = tv.append_column(
                "_side", pa.array(np.full(tv.num_rows, side, dtype=np.int8))
            )
            h = group_key_hash64(tv[by])
            part = (h % np.uint64(num_partitions)).astype(np.int32)
            return tv.append_column("_part", pa.array(part)).select(canon)
        return go

    def _times(col) -> np.ndarray:
        ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_timestamp(ca.type):
            # normalize to MICROSECONDS first — a native-unit int64 cast
            # would make before/after unit-dependent (a timestamp[ns]
            # column would shrink a 5-minute window to 0.3 s) and mixed
            # ns/us sides would compare different scales
            return ca.cast(pa.timestamp("us", tz=ca.type.tz)).cast(
                pa.int64()
            ).to_numpy(zero_copy_only=False)
        if pa.types.is_integer(ca.type):
            return ca.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return ca.to_numpy(zero_copy_only=False).astype(np.float64)

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if set(out_cols) <= set(t.column_names):
                return t.select(out_cols)
            return t
        side = t["_side"].to_numpy(zero_copy_only=False)
        lpos = np.flatnonzero(side == 0)
        rpos = np.flatnonzero(side == 1)
        lt = t.take(pa.array(lpos))

        def empty() -> pa.Table:
            return lt.slice(0, 0).select(out_cols)

        if len(lpos) == 0 or len(rpos) == 0:
            return empty()
        rt = t.take(pa.array(rpos))
        # exact shared key codes: encode the UNION of both key columns
        kcol = pa.concat_arrays([
            c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            for c in (lt[by], rt[by])
        ])
        codes = pc.dictionary_encode(kcol).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64, copy=False)  # no nulls: filtered in prep
        lcode, rcode = codes[: len(lpos)], codes[len(lpos):]
        ltv, rtv = _times(lt[on]), _times(rt[on])
        r_order = np.lexsort((rtv, rcode))
        rcode_s, rtv_s = rcode[r_order], rtv[r_order]
        l_order = np.lexsort((ltv, lcode))
        lcode_s, ltv_s = lcode[l_order], ltv[l_order]
        # align key runs of the two sorted sequences
        l_new = np.empty(len(lcode_s), dtype=bool)
        l_new[0] = True
        np.not_equal(lcode_s[1:], lcode_s[:-1], out=l_new[1:])
        l_starts = np.flatnonzero(l_new)
        l_ends = np.concatenate([l_starts[1:], [len(lcode_s)]])
        r_run_lo = np.searchsorted(rcode_s, lcode_s[l_starts], side="left")
        r_run_hi = np.searchsorted(rcode_s, lcode_s[l_starts], side="right")
        l_parts, r_parts = [], []
        for ls, le, rs, re_ in zip(l_starts, l_ends, r_run_lo, r_run_hi):
            if rs == re_:
                continue
            seg = rtv_s[rs:re_]
            anchors = ltv_s[ls:le]
            lo = rs + np.searchsorted(seg, anchors - before, side="left")
            hi = rs + np.searchsorted(seg, anchors + after, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                continue
            goff = np.concatenate([[0], np.cumsum(counts)[:-1]])
            pos = np.repeat(lo, counts) + (
                np.arange(total, dtype=np.int64) - np.repeat(goff, counts)
            )
            l_parts.append(np.repeat(l_order[ls:le], counts))
            r_parts.append(r_order[pos])
        if not l_parts:
            return empty()
        left_idx = np.concatenate(l_parts)
        right_idx = pa.array(np.concatenate(r_parts))
        out = lt.take(pa.array(left_idx))
        cols = {c: out[c] for c in lnames}
        for c in rpayload:
            ca = rt[c]
            ca = ca.combine_chunks() if isinstance(ca, pa.ChunkedArray) else ca
            cols[c] = pc.take(ca, right_idx)
        return pa.table({c: cols[c] for c in out_cols})

    out = (
        left.map_batches(
            _prep(0, rpayload, rtypes), batch_format="pyarrow"
        )
        .union(right.map_batches(
            _prep(1, [c for c in lnames if c not in (by, on)], ltypes),
            batch_format="pyarrow",
        ))
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    # left types must WIN for left-owned columns (on/by come from the
    # left table in the output; the right side may carry them in a
    # different-but-compatible type)
    types = {**rtypes, **ltypes}
    if all(isinstance(types[c], pa.DataType) for c in out_cols):
        # schema seed for the empty-input case (zero grouped blocks
        # would surface as a zero-column Dataset)
        out = out.union(ray.data.from_arrow(pa.table({
            c: pa.array([], type=types[c]) for c in out_cols
        })))
    return out
