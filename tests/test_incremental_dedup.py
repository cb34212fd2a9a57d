"""Persisted content-hash index + incremental cross-corpus dedup
(functions/dedup.py:build_content_index / dedup_against_index /
extend_content_index) vs DuckDB anti-join oracles."""

import os
import shutil

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from plugin_debezium_ray.functions.dedup import (
    build_content_index,
    dedup_against_index,
    extend_content_index,
)

SF = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def idx_path(tmp_path):
    p = str(tmp_path / "cindex")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _split():
    docs = pq.read_table(SF, columns=["doc_id", "text", "lang"])
    m = np.asarray(docs["doc_id"].to_numpy()) % 3 == 0
    return docs.filter(pa.array(m)), docs.filter(pa.array(~m))


class TestIncrementalDedup:
    def test_matches_anti_join_oracle(self, ray_session, idx_path):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus).repartition(4), idx_path,
            normalize=True, num_buckets=16,
        )
        out = dedup_against_index(
            ray.data.from_arrow(new).repartition(4), idx_path,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        exp = duckdb.sql("""
            SELECT n.doc_id, n.text, n.lang
            FROM new n
            WHERE trim(regexp_replace(lower(n.text), '\\s+', ' ', 'g'))
              NOT IN (
                SELECT trim(regexp_replace(lower(c.text), '\\s+', ' ', 'g'))
                FROM corpus c WHERE c.text IS NOT NULL)
            ORDER BY n.doc_id
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)
        # and something was actually dropped (the split shares content)
        assert len(out) <= new.num_rows

    def test_extend_then_reprobe_drops_new_content(
        self, ray_session, idx_path
    ):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path, num_buckets=8,
        )
        kept = dedup_against_index(
            ray.data.from_arrow(new), idx_path,
        )
        n_kept = kept.count()
        extend_content_index(kept, idx_path)
        # after committing the kept shard, re-probing the SAME shard
        # drops everything (its content is now indexed)
        again = dedup_against_index(ray.data.from_arrow(new), idx_path)
        assert again.count() == 0
        assert n_kept > 0

    def test_untouched_buckets_never_read(self, ray_session, idx_path):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path, num_buckets=8,
        )
        # probing an empty shard touches no bucket and keeps the schema
        out = dedup_against_index(
            ray.data.from_arrow(new.slice(0, 0)), idx_path,
        )
        assert out.schema().names == ["doc_id", "text", "lang"]
        assert out.count() == 0

    def test_keep_cols_prunes_shuffle(self, ray_session, idx_path):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path, num_buckets=8,
        )
        out = dedup_against_index(
            ray.data.from_arrow(new), idx_path, keep_cols=["doc_id"],
        ).to_pandas()
        full = dedup_against_index(
            ray.data.from_arrow(new), idx_path,
        ).to_pandas()
        assert out.columns.tolist() == ["doc_id"]
        assert sorted(out["doc_id"]) == sorted(full["doc_id"])

    def test_meta_pins_hash_scheme(self, ray_session, idx_path):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path,
            normalize=True, num_buckets=4,
        )
        import json
        meta = json.load(open(os.path.join(idx_path, "_index_meta.json")))
        assert meta == {"version": 1, "num_buckets": 4, "normalize": True}


class TestReviewRegressions:
    def test_rebuild_over_existing_index_refuses(
        self, ray_session, idx_path
    ):
        corpus, _ = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path, num_buckets=16,
        )
        with pytest.raises(ValueError, match="already exists"):
            build_content_index(
                ray.data.from_arrow(corpus), idx_path, num_buckets=32,
            )

    def test_keep_cols_fail_fast(self, ray_session, idx_path):
        corpus, new = _split()
        build_content_index(
            ray.data.from_arrow(corpus), idx_path, num_buckets=4,
        )
        with pytest.raises(ValueError, match="keep_cols"):
            dedup_against_index(
                ray.data.from_arrow(new), idx_path,
                keep_cols=["doc_id", "langg"],
            )
