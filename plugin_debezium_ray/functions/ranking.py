"""Distributed grouped top-k — "best k rows per group" without a
global sort.

Partials-first (the same pattern as the window aggregates): each batch
keeps only its own per-group top-k (any globally-top row is top-k
within every subset that contains it, so the pre-reduce is lossless),
then ONE coarse-partition groupby finishes per group.  The shuffle
carries at most k rows per (group, batch) — independent of group size,
so a 10^9-row group costs the same as a 10-row one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


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

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [score_col, id_col],
            ascending=[ascending, True],
            kind="stable",
            na_position="last",
        )
        return df.groupby(group_col, sort=False, dropna=False).head(k)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df).copy()
        out["_part"] = (
            pd.util.hash_array(out[group_col].to_numpy())
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: topk(g).drop(columns=["_part"]),
            batch_format="pandas",
        )
    )
