"""Windowed aggregates over event streams (streaming-shaped workloads).

The reference has no windows (SURVEY.md §2.7) — this is part of the
training-data extension surface.  Ray Data has no event-time windowing
either, so tumbling windows are expressed as the canonical two-phase
aggregate: assign ``window_start = floor(ts)`` vectorized in
``map_batches``, **pre-aggregate partials per (key, window) inside each
batch**, then one small ``groupby().aggregate()`` over the partials —
the shuffle carries one row per (key, window, batch) instead of one per
event (the pre-aggregation pattern for 100-TB-scale groupbys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def assign_tumbling_window(
    t: pa.Table, *, ts_col: str, window_seconds: int, out_col: str = "window_start"
) -> pa.Table:
    """Vectorized window assignment: timestamp → floor to window start."""
    ts = pc.cast(t[ts_col], pa.timestamp("us"))  # normalize any unit
    us = pc.cast(ts, pa.int64())
    w = pa.scalar(window_seconds * 1_000_000, pa.int64())
    # int64 divide truncates — floor for the (non-negative) epoch domain
    start = pc.multiply(pc.divide(us, w), w)
    return t.append_column(out_col, pc.cast(start, pa.timestamp("us")))


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    *,
    ts_col: str,
    window_seconds: int,
    key_cols: list[str],
    sum_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """count + sums per (key, tumbling window), partials-first.

    Output columns: key cols, ``window_start``, ``n``, ``sum_<col>``…"""
    sum_cols = sum_cols or []

    def partial(t: pa.Table) -> pa.Table:
        t = assign_tumbling_window(
            t, ts_col=ts_col, window_seconds=window_seconds
        )
        df = t.select(key_cols + ["window_start"] + sum_cols).to_pandas()
        g = df.groupby(key_cols + ["window_start"], sort=False, as_index=False)
        out = g.size().rename(columns={"size": "n"})
        if sum_cols:
            sums = g.agg({c: "sum" for c in sum_cols}).rename(
                columns={c: f"sum_{c}" for c in sum_cols}
            )
            out = out.merge(sums, on=key_cols + ["window_start"])
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    for c in sum_cols:
        aggs.append(Sum(f"sum_{c}", alias_name=f"sum_{c}"))
    return partials.groupby(key_cols + ["window_start"]).aggregate(*aggs)


def sliding_window_agg(
    ds: "ray.data.Dataset",
    *,
    ts_col: str,
    window_seconds: int,
    slide_seconds: int,
    key_cols: list[str],
    sum_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """count + sums per (key, sliding window): each event belongs to
    ``window_seconds / slide_seconds`` overlapping windows, assigned by a
    vectorized explode inside ``map_batches`` (one output row per
    (event, window) pre-aggregated per batch — the same partials-first
    shape as the tumbling aggregate, shuffle carries one row per
    (key, window, batch)).

    Output columns: key cols, ``window_start``, ``n``, ``sum_<col>``…
    Windows are aligned to multiples of ``slide_seconds``; an event at t
    falls in windows starting at every slide boundary in
    ``(t - window, t]``."""
    if window_seconds % slide_seconds != 0:
        raise ValueError("window_seconds must be a multiple of slide_seconds")
    k = window_seconds // slide_seconds
    sum_cols = sum_cols or []

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        us = ts.to_numpy(zero_copy_only=False)
        slide = slide_seconds * 1_000_000
        base = (us // slide) * slide  # latest window start containing t
        n = len(t)
        # explode: k window starts per event, vectorized
        offs = (np.arange(k, dtype=np.int64) * slide)[None, :]
        starts = (base[:, None] - offs).reshape(-1)
        idx = np.repeat(np.arange(n), k)
        df = t.select(key_cols + sum_cols).to_pandas().iloc[idx]
        df["window_start"] = pd.to_datetime(starts, unit="us")
        g = df.groupby(key_cols + ["window_start"], sort=False, as_index=False)
        out = g.size().rename(columns={"size": "n"})
        if sum_cols:
            sums = g.agg({c: "sum" for c in sum_cols}).rename(
                columns={c: f"sum_{c}" for c in sum_cols}
            )
            out = out.merge(sums, on=key_cols + ["window_start"])
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    for c in sum_cols:
        aggs.append(Sum(f"sum_{c}", alias_name=f"sum_{c}"))
    return partials.groupby(key_cols + ["window_start"]).aggregate(*aggs)


def session_windows(
    ds: "ray.data.Dataset",
    *,
    ts_col: str,
    key_col: str,
    gap_seconds: int,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Session windowing: per key, events within ``gap_seconds`` of the
    previous event share a session.

    ONE shuffle on a COARSE partition of the key space (hash(key) %
    ``num_partitions``), then a single vectorized pandas pass per
    partition: sort by (key, ts), lag via ``groupby(key).shift`` across
    ALL keys in the partition at once — no one-pandas-frame-per-key
    groups (millions of tiny groups at corpus scale was the r1 idiom;
    group count is now ``num_partitions``).

    Output: one row per session — key, session_start, session_end,
    n_events."""

    def add_part(t: pa.Table) -> pa.Table:
        keys = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        part = (
            pd.util.hash_array(keys.astype(object, copy=False))
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="stable")
        ts = g[ts_col].to_numpy()
        prev = g.groupby(key_col, sort=False)[ts_col].shift(1).to_numpy()
        gaps = (ts - prev).astype("timedelta64[us]").astype(np.int64)
        new_session = pd.isna(prev) | (gaps > gap_seconds * 1_000_000)
        sid = np.cumsum(new_session)  # global ids: keys are contiguous
        out = (
            g.assign(_sid=sid)
            .groupby("_sid", sort=False)
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": (ts_col, "min"),
                    "session_end": (ts_col, "max"),
                    "n_events": (ts_col, "size"),
                }
            )
            .reset_index(drop=True)
        )
        return out.drop(columns=["_part"], errors="ignore")

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(sessions, batch_format="pandas")
    )
