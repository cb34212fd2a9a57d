"""Tumbling / session windows over the events stream (streaming-shaped
workloads, SURVEY.md §2.7 extension) with pandas oracles."""

import numpy as np
import pandas as pd

import ray.data

from plugin_debezium_ray.functions.windows import (
    session_windows,
    tumbling_window_agg,
)


def _events_df(n=500, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 3600 * 6, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "ts": ts,
            "user_id": rng.integers(0, 10, n),
            "value": rng.random(n).round(3),
        }
    )


def test_tumbling_window_matches_pandas():
    df = _events_df()
    out = tumbling_window_agg(
        ray.data.from_pandas(df),
        ts_col="ts",
        window_seconds=3600,
        key_cols=["user_id"],
        sum_cols=["value"],
    ).to_pandas()
    oracle = (
        df.assign(window_start=df["ts"].dt.floor("1h"))
        .groupby(["user_id", "window_start"], as_index=False)
        .agg(n=("value", "size"), sum_value=("value", "sum"))
    )
    key = ["user_id", "window_start"]
    out = out.sort_values(key).reset_index(drop=True)
    oracle = oracle.sort_values(key).reset_index(drop=True)
    assert len(out) == len(oracle)
    assert (out["n"].to_numpy() == oracle["n"].to_numpy()).all()
    np.testing.assert_allclose(
        out["sum_value"].to_numpy(), oracle["sum_value"].to_numpy(), rtol=1e-9
    )


def test_session_windows():
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:30",
                 "2024-01-01 00:10:00",  # gap > 60s → new session
                 "2024-01-01 00:10:30", "2024-01-01 00:10:50"]
            ),
            "user_id": [1, 1, 1, 1, 2],
        }
    )
    out = session_windows(
        ray.data.from_pandas(df), ts_col="ts", key_col="user_id", gap_seconds=60
    ).to_pandas()
    u1 = out[out.user_id == 1].sort_values("session_start")
    assert list(u1["n_events"]) == [2, 2]
    assert out[out.user_id == 2]["n_events"].tolist() == [1]


def test_sliding_window_matches_pandas_oracle():
    import numpy as np
    import pandas as pd

    import ray.data

    from plugin_debezium_ray.functions.windows import sliding_window_agg

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                rng.integers(0, 6 * 3600, size=n) * 1_000_000, unit="us"
            ),
            "k": rng.choice(["a", "b"], size=n),
            "v": rng.random(n),
        }
    )
    out = (
        sliding_window_agg(
            ray.data.from_pandas(df), ts_col="ts", window_seconds=3600,
            slide_seconds=900, key_cols=["k"], sum_cols=["v"],
        )
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    # oracle: explode each event into its 4 windows, then groupby
    rows = []
    for off in range(0, 3600, 900):
        d = df.copy()
        us = d["ts"].astype("int64") // 1000 if d["ts"].dtype == "datetime64[ns]" else d["ts"].astype("int64")
        base = (us // (900 * 1_000_000)) * (900 * 1_000_000)
        d["window_start"] = pd.to_datetime(base - off * 1_000_000, unit="us")
        rows.append(d)
    want = (
        pd.concat(rows)
        .groupby(["k", "window_start"], as_index=False)
        .agg(n=("v", "size"), sum_v=("v", "sum"))
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert (out["n"].to_numpy() == want["n"].to_numpy()).all()
    assert np.allclose(out["sum_v"].to_numpy(), want["sum_v"].to_numpy())


def test_sliding_window_rejects_non_multiple():
    import pytest

    import ray.data
    import pandas as pd

    from plugin_debezium_ray.functions.windows import sliding_window_agg

    with pytest.raises(ValueError, match="multiple"):
        sliding_window_agg(
            ray.data.from_pandas(pd.DataFrame({"ts": [], "k": []})),
            ts_col="ts", window_seconds=3600, slide_seconds=700,
            key_cols=["k"],
        )
