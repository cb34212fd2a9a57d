"""SCD2 history materialization (functions/history.py) and heavy
hitters (functions/sketches.py) vs brute-force/DuckDB oracles."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from plugin_debezium_ray.functions.history import scd2_history
from plugin_debezium_ray.functions.sketches import (
    heavy_hitters,
    heavy_hitters_sketch,
)


def _changelog(n=5000, keys=137, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "lsn": pa.array(np.arange(n, dtype=np.int64)),
        "k": pa.array(rng.integers(0, keys, n).astype(np.int64)),
        "payload": pa.array(rng.integers(0, 10**6, n).astype(np.int64)),
        "deleted": pa.array(rng.random(n) < 0.15),
    })


def _scd2_oracle(t: pa.Table) -> pd.DataFrame:
    df = duckdb.sql("""
        WITH o AS (
          SELECT *, lead(lsn) OVER (PARTITION BY k ORDER BY lsn)
                    AS valid_to
          FROM t
        )
        SELECT lsn, k, payload, valid_to,
               (valid_to IS NULL) AS is_current
        FROM o WHERE NOT coalesce(deleted, FALSE)
        ORDER BY k, lsn
    """).df()
    return df.reset_index(drop=True)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["k", "lsn"]).reset_index(drop=True)


class TestScd2:
    def test_matches_window_oracle(self, ray_session):
        t = _changelog()
        out = scd2_history(
            ray.data.from_arrow(t).repartition(8),
            key_cols="k", order_col="lsn", deleted_col="deleted",
            num_partitions=16,
        ).to_pandas()
        exp = _scd2_oracle(t)
        got = _sorted(out)[["lsn", "k", "payload", "valid_to",
                            "is_current"]]
        exp["valid_to"] = exp["valid_to"].astype("float64")
        got["valid_to"] = got["valid_to"].astype("float64")
        pd.testing.assert_frame_equal(got, exp.astype(got.dtypes))

    def test_delete_closes_without_reopening(self, ray_session):
        t = pa.table({
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "payload": pa.array([10, 20, 30, 40], pa.int64()),
            "deleted": pa.array([False, True, False, False]),
        })
        out = _sorted(scd2_history(
            ray.data.from_arrow(t), key_cols="k", order_col="lsn",
            deleted_col="deleted", num_partitions=4,
        ).to_pandas())
        # row lsn=1 closed by the delete at lsn=2; lsn=3 reopens
        assert out["lsn"].tolist() == [1, 3, 4]
        assert out["valid_to"].tolist()[0] == 2
        assert out["is_current"].tolist() == [False, True, True]

    def test_null_keys_form_one_group(self, ray_session):
        t = pa.table({
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([None, None, 5], pa.int64()),
            "payload": pa.array([1, 2, 3], pa.int64()),
            "deleted": pa.array([False, False, False]),
        })
        out = scd2_history(
            ray.data.from_arrow(t), key_cols="k", order_col="lsn",
            deleted_col="deleted", num_partitions=4,
        ).to_pandas()
        nullg = out[out["k"].isna()].sort_values("lsn")
        assert nullg["valid_to"].tolist()[0] == 2.0
        assert nullg["is_current"].tolist() == [False, True]

    def test_multi_key_and_no_deleted_col(self, ray_session):
        t = pa.table({
            "lsn": pa.array([1, 2, 3, 4], pa.int64()),
            "a": pa.array(["x", "x", "y", "x"]),
            "b": pa.array([1, 1, 1, 2], pa.int64()),
        })
        out = scd2_history(
            ray.data.from_arrow(t), key_cols=["a", "b"],
            order_col="lsn", num_partitions=4,
        ).to_pandas().sort_values("lsn").reset_index(drop=True)
        assert out["valid_to"].tolist()[0] == 2.0
        assert out["is_current"].tolist() == [False, True, True, True]


class TestHeavyHitters:
    def _freqs(self, n=20000, seed=3):
        rng = np.random.default_rng(seed)
        # zipf-ish: value v appears ~ 1/(v+1)
        vals = (rng.pareto(1.2, n) * 10).astype(np.int64) % 500
        return pa.table({"v": pa.array(
            [f"w{v}" for v in vals], pa.string()
        )})

    def test_exact_matches_duckdb(self, ray_session):
        t = self._freqs()
        got = heavy_hitters(
            ray.data.from_arrow(t).repartition(8), "v", k=20
        ).to_pandas()
        exp = duckdb.sql("""
            SELECT v, CAST(count(*) AS BIGINT) AS n FROM t
            GROUP BY v ORDER BY n DESC, v LIMIT 20
        """).df()
        pd.testing.assert_frame_equal(got, exp)

    def test_sketch_matches_exact_with_guarantee(self, ray_session):
        t = self._freqs()
        exact = heavy_hitters(
            ray.data.from_arrow(t).repartition(8), "v", k=10
        ).to_pandas()
        tbl, info = heavy_hitters_sketch(
            ray.data.from_arrow(t).repartition(8), "v", k=10,
            capacity=512,
        )
        assert info["exact_guaranteed"]
        pd.testing.assert_frame_equal(tbl.to_pandas(), exact)

    def test_sketch_bound_is_honest_when_tight(self, ray_session):
        # capacity far below cardinality: the flag must NOT claim
        # exactness unless the k-th count clears the bound
        t = self._freqs()
        tbl, info = heavy_hitters_sketch(
            ray.data.from_arrow(t).repartition(8), "v", k=10,
            capacity=16,
        )
        kth = tbl["n"][min(10, tbl.num_rows) - 1].as_py()
        assert info["exact_guaranteed"] == (kth > info["max_undercount"])

    def test_weighted(self, ray_session):
        t = pa.table({
            "v": pa.array(["a", "b", "a", "c", None]),
            "w": pa.array([5, 1, 2, 3, 9], pa.int64()),
        })
        got = heavy_hitters(
            ray.data.from_arrow(t), "v", k=2, weight_col="w"
        ).to_pandas()
        assert got["v"].tolist() == ["a", "c"]
        assert got["n"].tolist() == [7, 3]


class TestApproxQuantiles:
    def test_rank_error_vs_exact(self, ray_session):
        from plugin_debezium_ray.functions.quantiles import approx_quantiles

        rng = np.random.default_rng(11)
        vals = np.concatenate([
            rng.normal(0, 1, 60_000),
            rng.pareto(2.0, 20_000) * 10,  # heavy tail
        ])
        t = pa.table({"x": pa.array(vals)})
        qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
        out = approx_quantiles(
            ray.data.from_arrow(t).repartition(16), "x", qs, k=256
        )
        s = np.sort(vals)
        n = len(s)
        for q, v in zip(out["q"], out["value"]):
            # observed rank of the estimate must be within 2% of q·n
            r = np.searchsorted(s, v, side="right")
            assert abs(r - q * n) <= 0.02 * n, (q, v, r / n)

    def test_deterministic_and_null_handling(self, ray_session):
        from plugin_debezium_ray.functions.quantiles import approx_quantiles

        t = pa.table({"x": pa.array(
            [float(i) for i in range(1000)] + [None] * 50
        )})
        a = approx_quantiles(ray.data.from_arrow(t).repartition(4),
                             "x", [0.5], k=64)
        b = approx_quantiles(ray.data.from_arrow(t).repartition(4),
                             "x", [0.5], k=64)
        assert a["value"].tolist() == b["value"].tolist()
        assert abs(a["value"][0] - 499.5) < 50

    def test_empty_and_all_null(self, ray_session):
        from plugin_debezium_ray.functions.quantiles import approx_quantiles

        t = pa.table({"x": pa.array([None, None], pa.float64())})
        out = approx_quantiles(ray.data.from_arrow(t), "x", [0.5])
        assert len(out) == 0


class TestReviewRegressions:
    """Pins for the round-5 self-review findings on these operators."""

    def test_sketch_flag_false_when_rows_missing(self, ray_session):
        # 5 heavy values + 25 tied light values at tiny capacity: the
        # compress drops every light value, the recount returns only 5
        # rows — the flag must NOT claim the true top-10
        vals = [f"h{i}" for i in range(5)] * 10_000 \
            + [f"t{i:02d}" for i in range(25)] * 5
        t = pa.table({"v": pa.array(vals)})
        tbl, info = heavy_hitters_sketch(
            ray.data.from_arrow(t).repartition(4), "v", k=10,
            capacity=16,
        )
        assert tbl.num_rows < 10
        assert not info["exact_guaranteed"]
        assert info["max_undercount"] > 0

    def test_sketch_all_null_column(self, ray_session):
        t = pa.table({"v": pa.array([None, None], pa.string())})
        tbl, info = heavy_hitters_sketch(ray.data.from_arrow(t), "v", k=5)
        assert tbl.num_rows == 0
        assert tbl.column_names == ["v", "n"]
        # nothing was ever decremented: the empty top-k IS exact
        assert info["exact_guaranteed"]

    def test_scd2_empty_input_keeps_schema(self, ray_session):
        t = pa.table({
            "lsn": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "deleted": pa.array([], pa.bool_()),
        })
        out = scd2_history(
            ray.data.from_arrow(t), key_cols="k", order_col="lsn",
            deleted_col="deleted", num_partitions=4,
        )
        sch = out.schema()
        assert sch.names == ["lsn", "k", "valid_to", "is_current"]
        assert out.count() == 0

    def test_scd2_exact_above_2_53_keys_with_nulls(self, ray_session):
        # nullable int64 keys used to detour through pandas float64,
        # collapsing 2^53 and 2^53+1 into ONE version chain
        t = pa.table({
            "lsn": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([2**53, 2**53 + 1, None], pa.int64()),
            "deleted": pa.array([False, False, False]),
        })
        out = scd2_history(
            ray.data.from_arrow(t), key_cols="k", order_col="lsn",
            deleted_col="deleted", num_partitions=4,
        ).to_pandas()
        assert sorted(out["is_current"].tolist()) == [True, True, True]
        assert out["valid_to"].isna().all()


class TestProductQuantization:
    def _data(self):
        import pyarrow.parquet as pq_

        t = pq_.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        return t

    def test_recall_and_rerank(self, ray_session):
        from plugin_debezium_ray.functions.ann import (
            brute_force_topk, pq_encode, pq_fit, pq_topk,
        )

        t = self._data()
        ds = ray.data.from_arrow(t).repartition(4)
        books = pq_fit(ds, m=16, k=256, sample_size=4096)
        codes = pq_encode(ds, books).materialize()
        q = np.stack([np.asarray(v) for v in
                      t["embedding"][:3].to_pylist()])
        exact = brute_force_topk(
            ray.data.from_arrow(t).repartition(4), q, k=10
        )

        def recall(df):
            return np.mean([
                len(set(df[df.query_id == i].vec_id)
                    & set(exact[exact.query_id == i].vec_id)) / 10
                for i in range(3)
            ])

        adc = pq_topk(codes, books, q, k=10)
        assert recall(adc) >= 0.5  # random vectors: PQ's worst case
        refined = pq_topk(
            codes, books, q, k=10, refine=4,
            vectors=ray.data.from_arrow(t).repartition(4),
        )
        assert recall(refined) >= 0.9
        # the exact-rerank path returns true scores: rank-1 self match
        self_rows = refined[refined["rank"] == 1]
        assert np.allclose(self_rows["score"], 1.0, atol=1e-5)

    def test_fit_deterministic_and_code_width(self, ray_session):
        from plugin_debezium_ray.functions.ann import pq_encode, pq_fit

        t = self._data()
        ds = ray.data.from_arrow(t).repartition(4)
        a = pq_fit(ds, m=8, k=32, sample_size=1024)
        b = pq_fit(ds, m=8, k=32, sample_size=1024)
        assert np.array_equal(a, b)
        codes = pq_encode(ds, a).materialize()
        sch = codes.schema()
        assert str(sch.types[sch.names.index("code")]) == \
            "fixed_size_binary[8]"
        assert codes.count() == t.num_rows

    def test_refine_requires_vectors(self, ray_session):
        from plugin_debezium_ray.functions.ann import (
            pq_encode, pq_fit, pq_topk,
        )

        t = self._data()
        ds = ray.data.from_arrow(t).repartition(2)
        books = pq_fit(ds, m=8, k=32, sample_size=512)
        codes = pq_encode(ds, books).materialize()
        q = np.asarray(t["embedding"][0].as_py(), dtype=np.float32)
        with pytest.raises(ValueError, match="vectors"):
            pq_topk(codes, books, q, k=5, refine=2)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

event_st = st.tuples(
    st.integers(0, 5),            # key (small space → dense chains)
    st.booleans(),                # deleted
    st.integers(0, 99),           # payload
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(event_st, min_size=1, max_size=50))
def test_scd2_matches_sequential_oracle(events, ray_session):
    """Property: for ANY changelog, scd2_history equals a sequential
    per-key replay (each non-delete opens a version, the next event of
    the key closes it; deletes emit nothing)."""
    t = pa.table({
        "lsn": pa.array(range(len(events)), pa.int64()),
        "k": pa.array([e[0] for e in events], pa.int64()),
        "payload": pa.array([e[2] for e in events], pa.int64()),
        "deleted": pa.array([e[1] for e in events]),
    })
    out_ds = scd2_history(
        ray.data.from_arrow(t), key_cols="k", order_col="lsn",
        deleted_col="deleted", num_partitions=4,
    )
    # sequential oracle
    open_row: dict = {}
    rows = []
    for lsn, (k, deleted, payload) in enumerate(events):
        if k in open_row:
            rows[open_row.pop(k)]["valid_to"] = lsn
        if not deleted:
            open_row[k] = len(rows)
            rows.append({"lsn": lsn, "k": k, "payload": payload,
                         "valid_to": None})
    exp = pd.DataFrame(
        rows, columns=["lsn", "k", "payload", "valid_to"]
    )
    exp["is_current"] = exp["valid_to"].isna()
    if not rows:
        # all-deleted changelog: empty result; Ray 2.49 to_pandas()
        # drops columns on ANY 0-row Dataset (schema pinned at
        # Dataset.schema() — covered by TestReviewRegressions)
        assert out_ds.count() == 0
        return
    got = out_ds.to_pandas().sort_values("lsn").reset_index(drop=True)
    got["valid_to"] = got["valid_to"].astype("float64")
    exp["valid_to"] = exp["valid_to"].astype("float64")
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes))


class TestIvfPq:
    def test_build_search_recall_and_pruning(self, ray_session, tmp_path):
        import pyarrow.parquet as pq_

        from plugin_debezium_ray.functions.ann import (
            IvfPqIndex, brute_force_topk,
        )

        t = pq_.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        ds = ray.data.from_arrow(t).repartition(4)
        idx = IvfPqIndex.build(
            ds, str(tmp_path / "ivfpq"), n_clusters=8, m=16, pq_k=256,
        )
        q = np.stack([np.asarray(v) for v in
                      t["embedding"][:3].to_pylist()])
        # pruning: probing 2 of 8 clusters touches a strict path subset
        few = idx._probed_paths(q, nprobe=2)
        all_ = idx._probed_paths(q, nprobe=8)
        assert len(few) < len(all_)
        # full probe + rerank must equal brute force exactly
        exact = brute_force_topk(
            ray.data.from_arrow(t).repartition(4), q, k=10
        )
        got = idx.search(q, k=10, nprobe=8, refine=4)
        for i in range(3):
            a = set(got[got.query_id == i].vec_id)
            e = set(exact[exact.query_id == i].vec_id)
            assert len(a & e) >= 9  # rerank recall on full probe
        # reload from disk round-trips
        idx2 = IvfPqIndex.load(str(tmp_path / "ivfpq"))
        got2 = idx2.search(q, k=10, nprobe=8, refine=4)
        pd.testing.assert_frame_equal(got, got2)


class TestAnnReviewRegressions:
    def test_pq_refine_fails_fast_before_scan(self, ray_session):
        from plugin_debezium_ray.functions.ann import pq_topk

        # empty codes dataset: the raise must happen at entry, before
        # any distributed work is planned
        empty = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "code": pa.array([], pa.binary(8)),
        }))
        with pytest.raises(ValueError, match="vectors"):
            pq_topk(empty, np.zeros((8, 2, 8), np.float32),
                    np.zeros(64, np.float32), k=5, refine=2)

    def test_encode_rejects_wider_vectors(self, ray_session):
        from plugin_debezium_ray.functions.ann import _encode_subspaces

        books = np.zeros((8, 4, 8), np.float32)  # m*dsub = 64
        with pytest.raises(ValueError, match="dim"):
            _encode_subspaces(np.zeros((3, 128), np.float32), books)

    def test_empty_probed_clusters_return_empty(self, ray_session,
                                                tmp_path):
        import pyarrow.parquet as pq_

        from plugin_debezium_ray.functions.ann import IvfPqIndex

        t = pq_.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        ).slice(0, 16)
        idx = IvfPqIndex.build(
            ray.data.from_arrow(t), str(tmp_path / "i"), n_clusters=4,
            m=8, pq_k=16,
        )
        # point the probe at a centroid that owns no rows by searching
        # with nprobe=1 from a far-away query; if every probed dir
        # exists this still exercises the normal path — force the empty
        # case directly instead
        from plugin_debezium_ray.functions import ann as _ann

        assert _ann._partition_paths(str(tmp_path / "i"), [999]) == []
        out = idx.search(
            np.asarray(t["embedding"][0].as_py(), np.float32),
            k=5, nprobe=1,
        )
        assert set(out.columns) == {"query_id", "vec_id", "score", "rank"}

    def test_codes_matrix_zero_copy_roundtrip(self, ray_session):
        from plugin_debezium_ray.functions.ann import _codes_matrix

        rows = [bytes([i, i + 1, i + 2, i + 3]) for i in range(0, 40, 4)]
        arr = pa.array(rows, pa.binary(4))
        m = _codes_matrix(arr.slice(2, 5), 4)  # sliced: offset path
        assert m.shape == (5, 4)
        assert bytes(m[0]) == rows[2]
        assert bytes(m[-1]) == rows[6]
