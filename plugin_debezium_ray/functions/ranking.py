"""Distributed grouped top-k — "best k rows per group" without a
global sort.

Partials-first (the same pattern as the window aggregates): each batch
keeps only its own per-group top-k (any globally-top row is top-k
within every subset that contains it, so the pre-reduce is lossless),
then ONE coarse-partition groupby finishes per group.  The shuffle
carries at most k rows per (group, batch) — independent of group size,
so a 10^9-row group costs the same as a 10-row one.

The per-batch kernel is Arrow-native end to end: ONE
``pc.sort_indices`` over (score, id) + a vectorized grouped cumcount
(dictionary-encode the group column, argsort the codes, subtract run
starts) — no pandas DataFrame conversion anywhere in the plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _topk_table(
    t: pa.Table, group_col: str, score_col: str, id_col: str,
    k: int, ascending: bool,
) -> pa.Table:
    """The k best rows per group of ONE table, original columns kept.

    Order: ``score_col`` (descending unless ``ascending``), ties broken
    by ascending ``id_col``; null — and, for float scores, NaN — sorts
    last (never beats a scored row)."""
    if t.num_rows == 0:
        return t
    score = t[score_col]
    if pa.types.is_floating(score.type):
        # NaN would sort as "greater than everything" in Arrow; the
        # op's contract (and the SQL row_number oracle on null) is
        # "unscored rows lose" — fold NaN into the nulls-last bucket
        score = pc.if_else(pc.is_nan(score), pa.scalar(None, score.type), score)
    order = pc.sort_indices(
        pa.table({"_s": score, "_i": t[id_col]}),
        sort_keys=[
            ("_s", "ascending" if ascending else "descending"),
            ("_i", "ascending"),
        ],
        null_placement="at_end",
    )
    t = t.take(order)

    ca = t[group_col]
    arr = ca.chunk(0) if ca.num_chunks == 1 else ca.combine_chunks()
    denc = arr.dictionary_encode()
    raw = denc.indices.to_numpy(zero_copy_only=False)
    if raw.dtype.kind == "f":  # null group indices surface as NaN
        codes = np.where(
            np.isnan(raw), np.int64(len(denc.dictionary)), raw
        ).astype(np.int64)  # nulls form their own group (dropna=False)
    else:
        codes = raw.astype(np.int64, copy=False)

    # grouped cumcount in score order: stable-argsort the codes (rows of
    # one group become contiguous, score order preserved within), rank =
    # position − run start, scatter back
    n = len(codes)
    order2 = np.argsort(codes, kind="stable")
    sc = codes[order2]
    new = np.empty(n, dtype=bool)
    new[0] = True
    np.not_equal(sc[1:], sc[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    rank_sorted = np.arange(n, dtype=np.int64) - starts[np.cumsum(new) - 1]
    ranks = np.empty(n, dtype=np.int64)
    ranks[order2] = rank_sorted
    return t.filter(pa.array(ranks < k))


def grouped_top_k(
    ds: "ray.data.Dataset",
    *,
    group_col: str,
    score_col: str,
    id_col: str,
    k: int,
    ascending: bool = False,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """The ``k`` best rows of every group, deterministically: ordered by
    ``score_col`` (descending by default), ties broken by ascending
    ``id_col`` — exactly SQL's
    ``row_number() OVER (PARTITION BY g ORDER BY s DESC, id) <= k``.
    Returns the surviving rows with their original columns.  Null
    scores sort last (never beat a scored row)."""

    def partial(t: pa.Table) -> pa.Table:
        from plugin_debezium_ray.functions.selection import group_key_hash64

        out = _topk_table(t, group_col, score_col, id_col, k, ascending)
        # null-stable + vectorized: the old object-boxed hash split a
        # group across partitions when only SOME blocks held nulls
        h = group_key_hash64(out[group_col])
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return out.append_column("_part", pa.array(part))

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t  # Ray sort can emit schema-less empty blocks
        out = _topk_table(t, group_col, score_col, id_col, k, ascending)
        return out.drop_columns(["_part"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(final, batch_format="pyarrow")
    )
