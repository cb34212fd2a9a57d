"""One-pass dataset profiler (functions/profile.py) vs DuckDB exact
statistics + sketch error bands."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from plugin_debezium_ray.functions.profile import profile

SF = "/root/testdata/sf0.001"


class TestProfile:
    def test_events_profile_matches_exact_stats(self, ray_session):
        ds = ray.data.read_parquet(
            f"{SF}/events.parquet",
            columns=["event_id", "user_id", "value", "event_type"],
        )
        out = profile(ds).set_index("column")
        exp = duckdb.sql(f"""
            SELECT count(*) AS n,
                   count(DISTINCT user_id) AS du,
                   min(value) AS vmin, max(value) AS vmax,
                   avg(value) AS vmean,
                   sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS vnull,
                   min(event_type) AS tmin, max(event_type) AS tmax,
                   quantile_disc(value, 0.5) AS vp50
            FROM '{SF}/events.parquet'
        """).df().iloc[0]
        assert out.loc["event_id", "count"] == exp["n"]
        assert out.loc["value", "nulls"] == exp["vnull"]
        assert out.loc["value", "min"] == exp["vmin"]
        assert out.loc["value", "max"] == exp["vmax"]
        assert abs(out.loc["value", "mean"] - exp["vmean"]) < 1e-9
        assert out.loc["event_type", "min"] == exp["tmin"]
        assert out.loc["event_type", "max"] == exp["tmax"]
        # sketches: HLL within 5% at this cardinality, KLL p50 near
        assert abs(out.loc["user_id", "approx_distinct"] - exp["du"]) \
            <= max(2, 0.05 * exp["du"])
        n_nonnull = exp["n"] - exp["vnull"]
        s = duckdb.sql(
            f"SELECT value FROM '{SF}/events.parquet' "
            "WHERE value IS NOT NULL ORDER BY value"
        ).df()["value"].to_numpy()
        r = np.searchsorted(s, out.loc["value", "p50"], side="right")
        assert abs(r - 0.5 * n_nonnull) <= 0.03 * n_nonnull

    def test_empty_dataset(self, ray_session):
        t = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.string())})
        out = profile(ray.data.from_arrow(t)).set_index("column")
        assert out.loc["a", "count"] == 0
        assert out.loc["a", "approx_distinct"] == 0
        assert out.loc["b", "min"] is None

    def test_all_null_and_bool_columns(self, ray_session):
        t = pa.table({
            "x": pa.array([None, None], pa.float64()),
            "flag": pa.array([True, False]),
        })
        out = profile(ray.data.from_arrow(t)).set_index("column")
        assert out.loc["x", "nulls"] == 2
        assert out.loc["x", "mean"] is None or pd.isna(out.loc["x", "mean"])
        # bools profile as non-numeric: no mean, lexical-ish min/max
        assert pd.isna(out.loc["flag", "mean"]) \
            or out.loc["flag", "mean"] is None
        assert out.loc["flag", "nulls"] == 0


class TestReviewRegressions:
    def test_mixed_numeric_string_object_column_demotes(
        self, ray_session
    ):
        # one block's first non-null is a float, another's a str: the
        # merge must demote to non-numeric, not crash crossing types
        import ray.data as rd

        a = pd.DataFrame({"v": [1.5, 2.5]})
        b = pd.DataFrame({"v": ["x", "y"]})
        ds = rd.from_pandas(a).union(rd.from_pandas(b))
        out = profile(ds, ["v"]).set_index("column")
        assert out.loc["v", "count"] == 4
        assert out.loc["v", "min"] is None
        assert pd.isna(out.loc["v", "mean"]) or out.loc["v", "mean"] is None

    def test_missing_column_fails_fast(self, ray_session):
        t = pa.table({"a": pa.array([1], pa.int64())})
        import pytest as _pt

        with _pt.raises(ValueError, match="not in dataset schema"):
            profile(ray.data.from_arrow(t), ["vlaue"])
