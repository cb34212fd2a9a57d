"""Big-big time-window equi-join (functions/joins.py:window_join) vs
DuckDB band-join oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from plugin_debezium_ray.functions.joins import window_join


def _streams(n_left=800, n_right=3000, keys=40, seed=5):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, keys, n_left).astype(np.float64)
    lk[rng.random(n_left) < 0.05] = np.nan  # NaN keys never match
    left = pa.table({
        "lid": pa.array(np.arange(n_left, dtype=np.int64)),
        "k": pa.array(lk),
        "t": pa.array(rng.integers(0, 10_000, n_left).astype(np.int64)),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, keys, n_right).astype(np.float64)),
        "t": pa.array(rng.integers(0, 10_000, n_right).astype(np.int64)),
        "rid": pa.array(np.arange(n_right, dtype=np.int64)),
        "tag": pa.array([f"x{i % 7}" for i in range(n_right)]),
    })
    return left, right


def _oracle(left, right, before, after):
    lt, rt = left, right  # "left"/"right" are SQL keywords
    return duckdb.sql(f"""
        SELECT a.lid, a.k, a.t, b.rid, b.tag
        FROM lt a JOIN rt b ON a.k = b.k
         AND b.t BETWEEN a.t - {before} AND a.t + {after}
        ORDER BY a.lid, b.rid
    """).df().reset_index(drop=True)


class TestWindowJoin:
    def _run(self, left, right, before, after):
        out = window_join(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(6),
            on="t", by="k", before=before, after=after,
            num_partitions=16,
        ).to_pandas()
        return out.sort_values(["lid", "rid"]).reset_index(drop=True)

    def test_matches_duckdb_band_join(self, ray_session):
        left, right = _streams()
        for before, after in ((50, 0), (0, 120), (30, 30)):
            got = self._run(left, right, before, after)
            exp = _oracle(left, right, before, after)
            pd.testing.assert_frame_equal(
                got[exp.columns.tolist()], exp.astype(got.dtypes)
            )

    def test_null_keys_and_times_never_match(self, ray_session):
        left = pa.table({
            "lid": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([1.0, None, 1.0]),
            "t": pa.array([10, 10, None], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1.0, None]),
            "t": pa.array([10, 10], pa.int64()),
            "rid": pa.array([7, 8], pa.int64()),
        })
        out = self._run(left, right, 5, 5)
        assert out["lid"].tolist() == [1]
        assert out["rid"].tolist() == [7]

    def test_empty_inputs_keep_schema(self, ray_session):
        left, right = _streams(8, 8)
        out = window_join(
            ray.data.from_arrow(left.slice(0, 0)),
            ray.data.from_arrow(right.slice(0, 0)),
            on="t", by="k", before=1, after=1,
        )
        assert out.schema().names == ["lid", "k", "t", "rid", "tag"]
        assert out.count() == 0

    def test_collision_raises(self, ray_session):
        left, right = _streams(8, 8)
        bad = right.rename_columns(["k", "t", "lid", "tag"])
        with pytest.raises(ValueError, match="collide"):
            window_join(
                ray.data.from_arrow(left), ray.data.from_arrow(bad),
                on="t", by="k", before=1, after=1,
            )

    def test_partitioning_invariance(self, ray_session):
        left, right = _streams(300, 900, keys=11, seed=9)
        a = self._run(left, right, 40, 40)
        out = window_join(
            ray.data.from_arrow(left).repartition(2),
            ray.data.from_arrow(right).repartition(13),
            on="t", by="k", before=40, after=40, num_partitions=3,
        ).to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, out)


class TestReviewRegressions:
    def test_timestamp_units_normalize_to_micros(self, ray_session):
        # a timestamp[ns] column must honor the documented µs window
        # (native-unit cast would shrink 5 min to 0.3 s); mixed ns/us
        # sides must still compare on one scale
        base = np.datetime64("2024-01-01T00:00:00", "ns")
        left = pa.table({
            "lid": pa.array([1], pa.int64()),
            "k": pa.array([1.0]),
            "t": pa.array([base + np.timedelta64(0, "s")],
                          pa.timestamp("ns")),
        })
        right = pa.table({
            "k": pa.array([1.0, 1.0]),
            "t": pa.array([
                np.datetime64("2024-01-01T00:04:00", "us"),
                np.datetime64("2024-01-01T00:06:00", "us"),
            ], pa.timestamp("us")),
            "rid": pa.array([1, 2], pa.int64()),
        })
        out = window_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="t", by="k", before=0, after=300_000_000,  # +5 min
        ).to_pandas()
        assert out["rid"].tolist() == [1]  # +4 min in, +6 min out

    def test_seed_types_left_win(self, ray_session):
        # left t is precomputed epoch-µs int64, right t is timestamp —
        # the empty-schema seed must carry the LEFT's type or the
        # stream holds conflicting schemas
        left = pa.table({
            "lid": pa.array([], pa.int64()),
            "k": pa.array([], pa.float64()),
            "t": pa.array([], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([], pa.float64()),
            "t": pa.array([], pa.timestamp("us")),
            "rid": pa.array([], pa.int64()),
        })
        out = window_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="t", by="k", before=1, after=1,
        )
        sch = out.schema()
        assert str(sch.types[sch.names.index("t")]) == "int64"
