"""Text analysis, dedup family, ANN, multimodal plumbing — operator tests
over Ray Datasets with small deterministic fixtures and numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from plugin_debezium_ray.functions import dedup, text
from plugin_debezium_ray.functions.ann import brute_force_topk, ivf_topk, kmeans_fit
from plugin_debezium_ray.functions.multimodal import (
    AudioFrameSample,
    ImageDecode,
    ImageFeatures,
    attach_image_meta,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 0
    (3, "completely different text about ray data pipelines and arrow"),
    (4, "totally unrelated content regarding database replication logs"),
    (5, "The  Quick  Brown  Fox jumps over the lazy dog again and again"),  # norm dup of 0
]


def docs_ds():
    return ray.data.from_pandas(pd.DataFrame(DOCS, columns=["doc_id", "text"]))


class TestText:
    def test_token_count(self):
        t = pa.table({"text": ["a b  c", " x ", ""]})
        out = text.token_count_batch(t)
        assert out["n_tokens"].to_pylist() == [3, 1, 0]

    def test_quality(self):
        t = pa.table({"text": ["Hello, world!"]})
        out = text.quality_score_batch(t)
        assert out["n_words"].to_pylist() == [2]
        assert out["punct_ratio"][0].as_py() == pytest.approx(2 / 13)
        assert out["upper_ratio"][0].as_py() == pytest.approx(1 / 13)

    def test_langid(self):
        t = pa.table({"text": [
            "the cat and the dog is in a house that it likes",
            "el perro es un animal que vive con la familia por los campos",
            "中文文本没有空格",
        ]})
        out = text.LangId()(t)
        assert out["lang_pred"].to_pylist() == ["en", "es", "zh"]

    def test_fingerprints(self):
        t = pa.table({"text": ["some document body here", "some document body here"]})
        md5 = text.md5_fingerprint_batch(t)["fingerprint_md5"].to_pylist()
        assert md5[0] == md5[1] and len(md5[0]) == 32
        roll = text.RollingFingerprint(window=2)(t)["fingerprint_rolling"].to_pylist()
        assert roll[0] == roll[1] and roll[0] > 0

    def test_rolling_fingerprint_local_edit_stability(self):
        """Winnowing property: min rolling hash usually survives a local
        edit far from the minimizing window."""
        base = "w%d " * 50
        a = "".join(f"w{i} " for i in range(50))
        b = a + "tail-edit"
        fa = text.RollingFingerprint(window=4)(pa.table({"text": [a]}))
        fb = text.RollingFingerprint(window=4)(pa.table({"text": [b]}))
        # not guaranteed in general, but deterministic for this fixture
        assert (
            fa["fingerprint_rolling"][0].as_py()
            == fb["fingerprint_rolling"][0].as_py()
        )

    def test_bpeish(self):
        t = pa.table({"text": ["foo bar, 1234!"]})
        out = text.BpeishTokenCounter()(t)
        # foo | bar | , | 123 | 4 | !
        assert out["n_bpe_tokens"].to_pylist() == [6]


class TestDedup:
    def test_exact(self):
        kept = dedup.exact_dedup(docs_ds()).to_pandas().sort_values("doc_id")
        assert list(kept["doc_id"]) == [0, 2, 3, 4, 5]  # 1 dropped (dup of 0)

    def test_exact_normalized(self):
        kept = dedup.exact_dedup(docs_ds(), normalize=True).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 2, 3, 4]  # 1 and 5 both fold into 0

    def test_minhash_lsh_finds_near_dups(self):
        pairs = dedup.minhash_lsh_pairs(docs_ds(), num_perm=64, bands=16, k=3)
        assert (0, 1) in pairs and (0, 2) in pairs
        flat = {x for p in pairs for x in p}
        assert 3 not in flat and 4 not in flat

    def test_minhash_dedup_end_to_end(self):
        kept = dedup.minhash_dedup(
            docs_ds(), threshold=0.5, num_perm=64, bands=16, k=3
        ).to_pandas()
        ids = sorted(kept["doc_id"])
        assert 0 in ids and 1 not in ids and 2 not in ids
        assert {3, 4} <= set(ids)

    def test_jaccard_exact(self):
        assert dedup.jaccard(DOCS[0][1], DOCS[0][1]) == 1.0
        assert 0.0 < dedup.jaccard(DOCS[0][1], DOCS[2][1], k=3) < 1.0
        assert dedup.jaccard(DOCS[0][1], DOCS[4][1], k=3) == 0.0

    def test_connected_components(self):
        roots = dedup.connected_components([(1, 2), (2, 3), (7, 8)])
        assert roots[1] == roots[2] == roots[3] == 1
        assert roots[7] == roots[8] == 7

    def test_connected_components_distributed_matches_union_find(self):
        """The dataflow CC (join + groupby-min label propagation) must
        agree with driver-side union-find, including a long chain (worst
        case for propagation rounds)."""
        cases = [
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            [(i, i + 1) for i in range(10)],  # diameter-10 chain
        ]
        for pairs in cases:
            want = dedup.connected_components(pairs)
            ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["a", "b"]))
            got = {
                r["node"]: r["root"]
                for r in dedup.connected_components_distributed(ds).take_all()
            }
            assert got == want

    def test_simhash_pairs(self):
        pairs = dedup.simhash_pairs(docs_ds(), max_hamming=6)
        assert (0, 1) in pairs
        flat = {x for p in pairs for x in p}
        assert 4 not in flat

    def test_ngram_jaccard_dedup(self):
        kept = dedup.ngram_jaccard_dedup(docs_ds(), threshold=0.9).to_pandas()
        assert 1 not in set(kept["doc_id"])  # exact dup always folds at 0.9

    def test_ngram_jaccard_pairs_exact_matches_brute_force(self):
        # brute-force reference: all O(n²) pairs through the exact
        # single-pair jaccard(); the pipeline must reproduce both the
        # pair set and the scores bit-for-bit
        threshold = 0.5
        expected = {}
        for i, (da, ta) in enumerate(DOCS):
            for db, tb in DOCS[i + 1 :]:
                j = dedup.jaccard(ta, tb, k=3)
                if j >= threshold:
                    expected[(da, db)] = j
        got = dedup.ngram_jaccard_pairs_exact(
            docs_ds(), threshold=threshold
        ).to_pandas()
        got_pairs = {
            (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
            for r in got.itertuples()
        }
        assert set(got_pairs) == set(expected)
        for p, j in expected.items():
            assert got_pairs[p] == j

    def test_ngram_jaccard_exact_skips_short_docs(self):
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [0, 1, 2, 3],
             "text": ["two words", "two words", "", "   "]}
        ))
        out = dedup.ngram_jaccard_pairs_exact(ds, k=3, threshold=0.0)
        assert len(out.to_pandas()) == 0  # no doc can form a 3-gram

    def test_ngram_jaccard_posting_cap_keeps_low_ids(self):
        # a hot shingle shared by every doc: the cap bounds the
        # posting list deterministically (lowest doc ids survive)
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": list(range(6)),
             "text": ["alpha beta gamma"] * 6}
        ))
        capped = dedup.ngram_jaccard_pairs_exact(
            ds, k=3, threshold=0.8, max_docs_per_shingle=3
        ).to_pandas()
        got = {(int(r.doc_a), int(r.doc_b)) for r in capped.itertuples()}
        assert got == {(0, 1), (0, 2), (1, 2)}

    def test_ngram_jaccard_exact_property(self):
        # randomized corpora vs the O(n²) brute-force reference —
        # hypothesis-style coverage without per-example Ray pipelines
        # (one pipeline over a batch of deterministic random corpora)
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(40):
            n = int(rng.integers(0, 12))
            docs.append((d, " ".join(rng.choice(vocab, size=n))))
        threshold = 0.4
        expected = {}
        for i, (da, ta) in enumerate(docs):
            for db, tb in docs[i + 1 :]:
                if len(ta.split()) < 3 or len(tb.split()) < 3:
                    continue  # pipeline's len(w) >= k gate
                j = dedup.jaccard(ta, tb, k=3)
                if j >= threshold:
                    expected[(da, db)] = j
        ds = ray.data.from_pandas(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        )
        got = dedup.ngram_jaccard_pairs_exact(
            ds, k=3, threshold=threshold
        ).to_pandas()
        got_pairs = {
            (int(r.doc_a), int(r.doc_b)): float(r.jaccard)
            for r in got.itertuples()
        }
        assert got_pairs == expected

    def test_embedding_dedup_pairs(self):
        rng = np.random.default_rng(0)
        base = rng.standard_normal(16).astype(np.float32)
        vecs = [base, base + 0.001, rng.standard_normal(16).astype(np.float32)]
        ds = ray.data.from_pandas(
            pd.DataFrame({"vec_id": [0, 1, 2], "embedding": [v.tolist() for v in vecs]})
        )
        pairs = dedup.embedding_dedup_pairs(ds, threshold=0.99, num_planes=4)
        assert pairs == [(0, 1)]

    def test_cosine_pairs_exact_vs_brute_force(self):
        """Blocked all-pairs kernel == O(n²) numpy reference, with
        block_rows/strip_rows small enough that multi-block cross pairs,
        within-block triangles AND strip boundaries are all exercised."""
        rng = np.random.default_rng(7)
        n, dim = 230, 24
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        # plant near-dups across and within what will become blocks
        for a, b in [(3, 190), (10, 11), (64, 65), (100, 229)]:
            vecs[b] = vecs[a] + rng.standard_normal(dim).astype(np.float32) * 0.01
        ids = rng.permutation(n) * 7 + 1  # non-contiguous, unsorted ids
        normed = vecs.astype(np.float64)
        normed /= np.linalg.norm(normed, axis=1, keepdims=True)
        sims = normed @ normed.T
        thr = 0.35
        ii, jj = np.where(np.triu(sims >= thr, k=1))
        expect = sorted(
            (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
            for i, j in zip(ii, jj)
        )
        assert len(expect) >= 4  # the planted pairs survive
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
            )
        )
        out = dedup.cosine_pairs_exact(
            ds, threshold=thr, block_rows=48, strip_rows=16, concurrency=2
        ).to_pandas()
        got = sorted(zip(out["a"].astype(int), out["b"].astype(int)))
        assert got == expect

    def test_cosine_pairs_exact_single_block(self):
        """Degenerate one-block corpus: only the within-block triangle."""
        rng = np.random.default_rng(1)
        vecs = rng.standard_normal((5, 8)).astype(np.float32)
        vecs[4] = vecs[2] * 3.0  # same direction, different magnitude
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(5), "embedding": [v.tolist() for v in vecs]}
            )
        )
        out = dedup.cosine_pairs_exact(ds, threshold=0.999, block_rows=64)
        rows = sorted((r["a"], r["b"]) for r in out.take_all())
        assert rows == [(2, 4)]


class TestDedupDistributed:
    """The 100-TB path: no driver-side materialization anywhere in the
    near-dedup pipeline (VERDICT r1 #1), and exact agreement with the
    driver-side reference algorithm."""

    def _corpus(self, n_clusters=12, dups_per=3):
        rows = []
        doc_id = 0
        for c in range(n_clusters):
            base = " ".join(f"w{c}x{i} common tail of cluster {c}" for i in range(12))
            for d in range(dups_per):
                # near-dups: perturb one token per copy
                txt = base.replace(f"w{c}x{d}", f"w{c}y{d}") if d else base
                rows.append((doc_id, txt))
                doc_id += 1
        return pd.DataFrame(rows, columns=["doc_id", "text"])

    def test_minhash_dedup_no_driver_materialization(self, monkeypatch):
        """Full minhash_dedup forced onto the scale path
        (small_path_max_pairs=0) with BOTH driver-fetch vectors poisoned
        (Dataset.take_all and smallfetch.fetch_small_table): the pipeline
        must never collect pairs/texts/labels to the driver."""
        from plugin_debezium_ray import smallfetch

        def poisoned(self, *a, **k):
            raise AssertionError(
                "take_all called inside the distributed dedup path"
            )

        def poisoned_fetch(*a, **k):
            raise AssertionError(
                "fetch_small_table called inside the distributed dedup path"
            )

        df = self._corpus()
        ds = ray.data.from_pandas(df)
        monkeypatch.setattr(ray.data.Dataset, "take_all", poisoned)
        monkeypatch.setattr(smallfetch, "fetch_small_table", poisoned_fetch)
        kept = dedup.minhash_dedup(
            ds, threshold=0.5, num_perm=64, bands=16, k=3,
            small_path_max_pairs=0,
        )
        kept = kept.materialize()  # executes the whole pipeline under the poison
        monkeypatch.undo()
        ids = sorted(r["doc_id"] for r in kept.take_all())
        # each cluster of 3 near-dups collapses to its min id (0, 3, 6, …)
        assert ids == [i * 3 for i in range(12)]

    def test_minhash_dedup_small_path_is_bounded(self, monkeypatch):
        """The default (bounded-broadcast) path may fetch ONLY sets
        provably below the bound — never corpus-sized results (both
        fetch vectors guarded)."""
        from plugin_debezium_ray import smallfetch

        cap = 2_000
        orig = ray.data.Dataset.take_all
        orig_fetch = smallfetch.fetch_small_table

        def bounded(self, *a, **k):
            out = orig(self, *a, **k)
            assert len(out) <= cap, f"driver collected {len(out)} rows"
            return out

        def bounded_fetch(ds_, *a, **k):
            out = orig_fetch(ds_, *a, **k)
            assert out.num_rows <= cap, f"driver fetched {out.num_rows} rows"
            return out

        df = self._corpus()
        ds = ray.data.from_pandas(df)
        monkeypatch.setattr(ray.data.Dataset, "take_all", bounded)
        monkeypatch.setattr(smallfetch, "fetch_small_table", bounded_fetch)
        kept = dedup.minhash_dedup(ds, threshold=0.5, num_perm=64, bands=16, k=3)
        ids = sorted(r["doc_id"] for r in kept.take_all())
        monkeypatch.undo()
        assert ids == [i * 3 for i in range(12)]

    def test_minhash_dedup_paths_agree(self):
        """Bounded small path and fully-distributed path return identical
        survivors."""
        df = self._corpus(n_clusters=8, dups_per=3)
        a = dedup.minhash_dedup(
            ray.data.from_pandas(df), threshold=0.5, num_perm=64, bands=16, k=3
        )
        b = dedup.minhash_dedup(
            ray.data.from_pandas(df), threshold=0.5, num_perm=64, bands=16,
            k=3, small_path_max_pairs=0,
        )
        assert sorted(r["doc_id"] for r in a.take_all()) == sorted(
            r["doc_id"] for r in b.take_all()
        )

    def test_distributed_matches_driver_reference(self):
        """Distributed pairs→verify→CC→anti-join == list-based
        pairs + jaccard loop + union-find (the r1 implementation)."""
        df = self._corpus(n_clusters=6, dups_per=4)
        ds = ray.data.from_pandas(df)
        pairs = dedup.minhash_lsh_pairs(ds, num_perm=64, bands=16, k=3)
        texts = dict(zip(df["doc_id"], df["text"]))
        verified = [
            (a, b) for a, b in pairs
            if dedup.jaccard(texts[a], texts[b], 3) >= 0.5
        ]
        roots = dedup.connected_components(verified)
        want = sorted(set(texts) - {n for n, r in roots.items() if r != n})
        got = sorted(
            r["doc_id"]
            for r in dedup.minhash_dedup(
                ds, threshold=0.5, num_perm=64, bands=16, k=3
            ).take_all()
        )
        assert got == want

    def test_simhash_star_cap_bounds_hot_buckets(self):
        """A bucket larger than max_all_pairs_bucket pairs as a star to
        the min id — linear, not quadratic (the minhash guard, ported)."""
        df = pd.DataFrame(
            {"doc_id": range(20), "text": ["identical text body"] * 20}
        )
        ds = ray.data.from_pandas(df)
        pairs = dedup.simhash_pairs(ds, max_hamming=3, max_all_pairs_bucket=8)
        assert pairs == [(0, b) for b in range(1, 20)]

    def test_simhash_batch_matches_single(self):
        h = dedup.SimHasher()
        texts = [d[1] for d in DOCS]
        batch = h.simhash_batch(texts)
        assert [h.simhash(t) for t in texts] == [int(x) for x in batch]

    def test_simhash_chunked_batch(self):
        """Chunking across the MAX_CHUNK_WORDS boundary is lossless,
        including the single-doc-over-cap sub-chunk path (the round-2
        unbounded (words × 64) bit-matrix fix)."""
        h = dedup.SimHasher()
        texts = ["tok%d word sample " % i * 30 for i in range(8)]
        texts.append("giant doc " * 500)  # one doc far above a tiny cap
        full = h.simhash_batch(texts)
        h.MAX_CHUNK_WORDS = 40  # force multi-doc chunks AND sub-chunking
        assert (h.simhash_batch(texts) == full).all()
        assert [h.simhash(t) for t in texts] == [int(x) for x in full]

    def test_minhash_signatures_batch_matches_single(self):
        h = dedup.MinHasher(num_perm=32, k=3)
        texts = [d[1] for d in DOCS]
        mat = h.signatures(texts)
        for i, t in enumerate(texts):
            assert (h.signature(t) == mat[i]).all()

    def test_minhash_chunked_signatures(self):
        """Chunking across the MAX_CHUNK_SHINGLES boundary is lossless."""
        h = dedup.MinHasher(num_perm=16, k=2)
        texts = ["tok%d word " % i * 40 for i in range(8)]
        full = h.signatures(texts)
        h.MAX_CHUNK_SHINGLES = 50  # force multiple chunks
        assert (h.signatures(texts) == full).all()

    def test_embedding_dedup_ships_no_vectors_in_shuffle(self, monkeypatch):
        """Verified-pair computation with poisoned take_all (vectors join
        candidates distributively; nothing collects)."""
        rng = np.random.default_rng(0)
        base = rng.standard_normal(16).astype(np.float32)
        vecs = [base, base + 0.001, rng.standard_normal(16).astype(np.float32)]
        ds = ray.data.from_pandas(
            pd.DataFrame({"vec_id": [0, 1, 2],
                          "embedding": [v.tolist() for v in vecs]})
        )
        def poisoned(self, *a, **k):
            raise AssertionError("take_all inside distributed path")
        monkeypatch.setattr(ray.data.Dataset, "take_all", poisoned)
        out = dedup.embedding_dedup_pairs_ds(
            ds, threshold=0.99, num_planes=4
        ).materialize()
        monkeypatch.undo()
        assert [(r["a"], r["b"]) for r in out.take_all()] == [(0, 1)]


class TestAnn:
    def _ds(self, n=200, dim=16, seed=0):
        rng = np.random.default_rng(seed)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        return (
            ray.data.from_pandas(
                pd.DataFrame(
                    {"vec_id": np.arange(n), "embedding": [v.tolist() for v in vecs]}
                )
            ),
            vecs,
        )

    def test_brute_force_matches_numpy(self):
        ds, vecs = self._ds()
        q = vecs[:3]
        out = brute_force_topk(ds, q, k=5)
        normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        sims = normed @ qn.T
        for qid in range(3):
            expect = list(np.argsort(-sims[:, qid])[:5])
            got = list(out[out.query_id == qid].sort_values("rank")["vec_id"])
            assert got == expect
        assert out[out["rank"] == 1].iloc[0]["score"] == pytest.approx(1.0, abs=1e-5)

    def test_ivf_recall(self):
        ds, vecs = self._ds(n=300)
        q = vecs[7:9]
        exact = brute_force_topk(ds, q, k=5)
        approx = ivf_topk(ds, q, k=5, n_clusters=8, nprobe=8)  # nprobe=all → exact
        pd.testing.assert_frame_equal(
            exact.reset_index(drop=True), approx.reset_index(drop=True)
        )

    def test_kmeans_deterministic(self):
        ds, _ = self._ds(n=100)
        c1 = kmeans_fit(ds, 4, iters=2)
        c2 = kmeans_fit(ds, 4, iters=2)
        np.testing.assert_array_equal(c1, c2)

    def _clustered_ds(self, n_clusters=6, per=60, dim=16, seed=4):
        """Well-separated gaussian blobs — the regime IVF is for."""
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 8
        vecs = np.concatenate(
            [c + rng.standard_normal((per, dim)).astype(np.float32) * 0.3
             for c in centers]
        )
        n = len(vecs)
        return (
            ray.data.from_pandas(
                pd.DataFrame(
                    {"vec_id": np.arange(n),
                     "embedding": [v.tolist() for v in vecs]}
                )
            ),
            vecs,
        )

    def test_ivf_index_build_probe_and_recall(self, tmp_path):
        """The persisted-index path (VERDICT r1 #6): ONE build pass writes
        a cluster-partitioned layout; approximate search (nprobe <
        n_clusters) reads only probed partitions and reaches recall@10
        ≥ 0.9 on clustered data."""
        import os

        from plugin_debezium_ray.functions.ann import IvfIndex

        ds, vecs = self._clustered_ds()
        idx_dir = str(tmp_path / "ivf")
        idx = IvfIndex.build(ds, idx_dir, n_clusters=6)
        # on-disk layout: one directory per cluster + centroids + meta
        parts = [d for d in os.listdir(idx_dir) if d.startswith("cluster=")]
        assert 1 < len(parts) <= 6
        assert os.path.exists(os.path.join(idx_dir, "centroids.npy"))

        q = vecs[[5, 100, 200]]
        truth = brute_force_topk(ds, q, k=10)
        approx = IvfIndex.load(idx_dir).search(q, k=10, nprobe=2)
        recalls = []
        for qid, grp in truth.groupby("query_id"):
            want = set(grp["vec_id"])
            got = set(approx[approx["query_id"] == qid]["vec_id"])
            recalls.append(len(want & got) / len(want))
        assert min(recalls) >= 0.9, recalls
        # probe restriction is real: nprobe=1 scans a strict subset
        one = IvfIndex.load(idx_dir)
        assert len(one.probe_clusters(q, 1)) < len(one.probe_clusters(q, 6))

    def test_ivf_index_exact_mode_matches_brute_force(self, tmp_path):
        ds, vecs = self._clustered_ds(n_clusters=4, per=40)
        from plugin_debezium_ray.functions.ann import ivf_topk

        q = vecs[3:5]
        exact = brute_force_topk(ds, q, k=5)
        via_index = ivf_topk(
            ds, q, k=5, n_clusters=4, nprobe=4,
            index_dir=str(tmp_path / "ivf2"),
        )
        pd.testing.assert_frame_equal(
            exact.reset_index(drop=True), via_index.reset_index(drop=True)
        )


class TestMultimodal:
    def _img_ds(self):
        rng = np.random.default_rng(1)
        blobs = [rng.bytes(256) for _ in range(4)] + [None]
        return ray.data.from_arrow(
            pa.table({"img_id": list(range(5)),
                      "image": pa.array(blobs, type=pa.binary())})
        )

    def test_decode_pipeline_plumbing(self):
        """Stubbed decode, real plumbing: actor-pool stage, fixed-size
        tensor column, deterministic output, null passthrough."""
        ds = self._img_ds()
        out = ds.map_batches(
            ImageDecode, fn_constructor_kwargs={"size": (8, 8)},
            batch_format="pyarrow", batch_size=2, concurrency=2,
        ).map_batches(
            ImageFeatures, fn_constructor_kwargs={"size": (8, 8)},
            batch_format="pyarrow", batch_size=2, concurrency=2,
        )
        rows = sorted(out.take_all(), key=lambda r: r["img_id"])
        assert len(rows) == 5
        assert len(rows[0]["pixels"]) == 8 * 8 * 3
        assert len(rows[0]["features"]) == 6
        assert rows[4]["pixels"] is None and rows[4]["features"] is None
        # determinism of the stub decode
        out2 = self._img_ds().map_batches(
            ImageDecode, fn_constructor_kwargs={"size": (8, 8)},
            batch_format="pyarrow", batch_size=2, concurrency=2,
        )
        rows2 = sorted(out2.take_all(), key=lambda r: r["img_id"])
        assert np.array_equal(rows[0]["pixels"], rows2[0]["pixels"])

    def test_strict_mode_marks_codec_gap(self):
        dec = ImageDecode(strict=True)
        if dec._pil is None:
            with pytest.raises(NotImplementedError):
                dec(pa.table({"image": pa.array([b"xx"], pa.binary())}))

    def test_audio_and_meta(self):
        t = pa.table({"audio": pa.array([b"abc", None], pa.binary())})
        out = AudioFrameSample(n_frames=4)(t)
        assert len(out["frame_energy"][0].as_py()) == 4
        assert out["frame_energy"][1].as_py() is None
        t2 = attach_image_meta(pa.table({"image": pa.array([b"z"], pa.binary())}))
        meta = t2["image_meta"][0].as_py()
        assert meta["format"] is None and meta["width"] == -1


class TestImageCodec:
    """Pure-numpy codecs (functions/imagecodec.py): real decode for
    netpbm/BMP/WAV — round-trips, header parsing, and the wiring into
    the multimodal stages."""

    def test_ppm_round_trip(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
        assert np.array_equal(ic.decode_ppm(ic.encode_ppm(px)), px)
        gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
        assert np.array_equal(ic.decode_ppm(ic.encode_ppm(gray))[:, :, 0], gray)

    def test_ppm_comments_and_whitespace(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        body = bytes(range(2 * 2 * 3))
        data = b"P6 # a comment\n# another\n 2\t2 \n255\n" + body
        px = ic.decode_ppm(data)
        assert px.shape == (2, 2, 3) and px.tobytes() == body

    def test_bmp_round_trip_odd_width(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        rng = np.random.default_rng(8)
        # odd width exercises the 4-byte row padding
        px = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)

    def test_wav_round_trip(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        rng = np.random.default_rng(9)
        samples = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
        out, rate = ic.decode_wav(ic.encode_wav(samples, 16000))
        assert rate == 16000 and np.array_equal(out, samples)

    def test_resize_nearest_identity_and_shape(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
        assert np.array_equal(ic.resize_nearest(px, (4, 4)), px)
        assert ic.resize_nearest(px, (8, 2)).shape == (8, 2, 3)

    def test_image_decode_real_path_no_pil(self):
        """A PPM payload decodes for REAL (not the digest fake): the
        resized pixels must be a function of the actual image content."""
        from plugin_debezium_ray.functions import imagecodec as ic

        solid = np.full((16, 16, 3), 200, dtype=np.uint8)
        data = ic.encode_ppm(solid)
        dec = ImageDecode(size=(4, 4), strict=True)  # strict: fake forbidden
        if dec._pil is not None:
            pytest.skip("PIL present; native path not exercised")
        out = dec(pa.table({"image": pa.array([data], pa.binary())}))
        px = np.asarray(out["pixels"][0].as_py(), dtype=np.uint8)
        assert np.all(px == 200)

    def test_image_decode_gray_promotes_to_rgb(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        gray = np.full((8, 8), 31, dtype=np.uint8)
        dec = ImageDecode(size=(2, 2), strict=True)
        if dec._pil is not None:
            pytest.skip("PIL present")
        out = dec(pa.table({"image": pa.array([ic.encode_ppm(gray)],
                                              pa.binary())}))
        assert out["pixels"][0].as_py() == [31] * 12

    def test_audio_real_wav_energy(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        # first half silence, second half full-scale square wave
        quiet = np.zeros(500, dtype=np.int16)
        loud = np.full(500, 32767, dtype=np.int16)
        data = ic.encode_wav(np.concatenate([quiet, loud]), 8000)
        out = AudioFrameSample(n_frames=2, strict=True)(
            pa.table({"audio": pa.array([data], pa.binary())})
        )
        e = out["frame_energy"][0].as_py()
        assert e[0] < 0.01 and abs(e[1] - 1.0) < 0.01

    def test_meta_real_headers(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        ppm = ic.encode_ppm(np.zeros((3, 7, 3), dtype=np.uint8))
        bmp = ic.encode_bmp(np.zeros((2, 5, 3), dtype=np.uint8))
        t = attach_image_meta(
            pa.table({"image": pa.array([ppm, bmp], pa.binary())})
        )
        m0, m1 = t["image_meta"].to_pylist()
        assert m0 == {"format": "ppm", "width": 7, "height": 3, "channels": 3}
        assert m1 == {"format": "bmp", "width": 5, "height": 2, "channels": 3}

    def test_sniff(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        assert ic.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
        assert ic.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
        assert ic.sniff_format(b"hello") is None

    def test_codec_round_trip_properties(self):
        """Hypothesis: encode→decode is identity for arbitrary shapes,
        channel counts, sample rates and frame counts."""
        from hypothesis import given, settings, strategies as st

        from plugin_debezium_ray.functions import imagecodec as ic

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(1, 12), w=st.integers(1, 12),
            gray=st.booleans(), seed=st.integers(0, 2**31),
        )
        def ppm_rt(h, w, gray, seed):
            rng = np.random.default_rng(seed)
            shape = (h, w) if gray else (h, w, 3)
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = ic.decode_ppm(ic.encode_ppm(px))
            assert np.array_equal(out, px.reshape(h, w, -1))

        @settings(max_examples=40, deadline=None)
        @given(h=st.integers(1, 12), w=st.integers(1, 12),
               seed=st.integers(0, 2**31))
        def bmp_rt(h, w, seed):
            rng = np.random.default_rng(seed)
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)

        @settings(max_examples=40, deadline=None)
        @given(n=st.integers(1, 500), ch=st.integers(1, 4),
               rate=st.integers(1, 192_000), seed=st.integers(0, 2**31))
        def wav_rt(n, ch, rate, seed):
            rng = np.random.default_rng(seed)
            s = rng.integers(-32768, 32767, size=(n, ch), dtype=np.int16)
            out, r = ic.decode_wav(ic.encode_wav(s, rate))
            assert r == rate and np.array_equal(out, s)

        @settings(max_examples=25, deadline=None)
        @given(
            frames=st.lists(
                st.tuples(st.integers(1, 6), st.integers(1, 6),
                          st.booleans()),
                min_size=1, max_size=8,
            ),
            k=st.integers(1, 10), seed=st.integers(0, 2**31),
        )
        def stream_rt(frames, k, seed):
            rng = np.random.default_rng(seed)
            fs = [
                rng.integers(
                    0, 256, size=(h, w) if gray else (h, w, 3),
                    dtype=np.uint8,
                )
                for h, w, gray in frames
            ]
            data = ic.encode_ppm_stream(fs)
            decoded, total = ic.decode_ppm_stream(data, sample=k)
            assert total == len(fs)
            assert len(decoded) == min(k, len(fs))
            # first frame always included and byte-exact
            f0 = fs[0] if fs[0].ndim == 3 else fs[0][:, :, None]
            assert np.array_equal(decoded[0], f0)

        ppm_rt()
        bmp_rt()
        wav_rt()
        stream_rt()

    def test_malformed_payloads_degrade_not_crash(self):
        """A corrupt blob whose magic matches a codec must not abort a
        non-strict stage — it degrades to the deterministic fake for
        that row; strict mode surfaces the error."""
        from plugin_debezium_ray.functions.multimodal import VideoFrameSample

        bad = [
            b"P6 garbage",                   # unparseable netpbm header
            b"P6\n4 4\n255\n" + b"\x00" * 5,  # truncated pixel payload
            b"BMxx",                          # BMP magic, no header
        ]
        col = pa.table({"image": pa.array(bad, pa.binary())})
        dec = ImageDecode(size=(4, 4), strict=False)
        if dec._pil is None:
            out = dec(col)  # must not raise
            assert out["pixels"].null_count == 0
            with pytest.raises(Exception):
                ImageDecode(size=(4, 4), strict=True)(col)

        wav_bad = pa.table(
            {"audio": pa.array(
                [b"RIFF\x00\x00\x00\x00WAVEtrunc"], pa.binary()
            )}
        )
        out = AudioFrameSample(n_frames=2, strict=False)(wav_bad)
        assert len(out["frame_energy"][0].as_py()) == 2
        with pytest.raises(Exception):
            AudioFrameSample(n_frames=2, strict=True)(wav_bad)

        vid_bad = pa.table({"video": pa.array([b"P6 nope"], pa.binary())})
        out = VideoFrameSample(n_frames=2, size=(2, 2), strict=False)(vid_bad)
        assert out["frame_count"][0].as_py() == -1  # fake path marker
        with pytest.raises(Exception):
            VideoFrameSample(n_frames=2, size=(2, 2), strict=True)(vid_bad)

        # meta: magic-matching-but-unparseable → honest unparsed marker
        meta = attach_image_meta(col)["image_meta"].to_pylist()
        assert meta[2]["width"] == -1

    def test_ppm_stream_round_trip_and_sampling(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        rng = np.random.default_rng(11)
        frames = [rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
                  for _ in range(7)]
        data = ic.encode_ppm_stream(frames)
        all_frames, total = ic.decode_ppm_stream(data)
        assert total == 7
        assert all(np.array_equal(a, b) for a, b in zip(all_frames, frames))
        # sampled decode: first and last always included, evenly spaced
        sampled, total = ic.decode_ppm_stream(data, sample=3)
        assert total == 7 and len(sampled) == 3
        assert np.array_equal(sampled[0], frames[0])
        assert np.array_equal(sampled[2], frames[6])

    def test_ppm_stream_mixed_frame_sizes(self):
        from plugin_debezium_ray.functions import imagecodec as ic

        a = np.zeros((2, 2, 3), dtype=np.uint8)
        b = np.full((5, 3), 9, dtype=np.uint8)  # gray frame, other dims
        frames, total = ic.decode_ppm_stream(
            ic.encode_ppm_stream([a, b]), sample=None
        )
        assert total == 2
        assert frames[0].shape == (2, 2, 3) and frames[1].shape == (5, 3, 1)

    def test_video_frame_sample_stage(self):
        from plugin_debezium_ray.functions import imagecodec as ic
        from plugin_debezium_ray.functions.multimodal import VideoFrameSample

        frames = [np.full((8, 8, 3), 10 * i, dtype=np.uint8)
                  for i in range(6)]
        clip = ic.encode_ppm_stream(frames)
        stage = VideoFrameSample(n_frames=2, size=(4, 4), strict=True)
        out = stage(pa.table({"video": pa.array([clip, None], pa.binary())}))
        assert out["frame_count"][0].as_py() == 6
        assert out["frame_count"][1].as_py() is None
        px = np.asarray(out["frames"][0].as_py(), np.uint8).reshape(2, 4, 4, 3)
        assert np.all(px[0] == 0) and np.all(px[1] == 50)  # first + last

    def test_video_strict_rejects_unknown_container(self):
        from plugin_debezium_ray.functions.multimodal import VideoFrameSample

        with pytest.raises(NotImplementedError):
            VideoFrameSample(strict=True)(
                pa.table({"video": pa.array([b"\x00\x00ftypmp4"], pa.binary())})
            )


class TestCorpusPrep:
    """Composite prep pipeline: gate semantics, dedup interaction and
    per-language stats — every edge the SQL oracle also encodes."""

    def test_gate_dedup_stats(self):
        from plugin_debezium_ray.pipelines.corpus import corpus_prep

        rows = [
            # kept: 6 tokens, no punct
            (1, "alpha beta gamma delta epsilon zeta", "en"),
            # duplicate of 1 after normalization (case + whitespace) → dropped
            (2, "  ALPHA beta   GAMMA delta epsilon zeta ", "de"),
            # dropped: only 4 tokens
            (3, "too few tokens here", "en"),
            # dropped: punct-heavy (ratio > 0.2)
            (4, "a.b.c.d.e f.g.h.i.j k,l,m,n,o", "en"),
            # kept: second en doc
            (5, "one two three four five six seven", "en"),
            # dropped: null text
            (6, None, "fr"),
            # kept: fr doc, exactly at min_tokens
            (7, "un deux trois quatre cinq", "fr"),
        ]
        ds = ray.data.from_pandas(
            pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
        )
        out = corpus_prep(ds, min_tokens=5, max_punct_ratio=0.2)
        got = {
            r["lang"]: (r["n_docs"], r["total_tokens"])
            for r in out.take_all()
        }
        # doc 2's normalized content equals doc 1's → min-id keeper is 1
        # (lang=en), so de contributes nothing
        assert got == {"en": (2, 13), "fr": (1, 5)}

    def test_boundary_punct_ratio_kept(self):
        from plugin_debezium_ray.pipelines.corpus import corpus_prep

        # 5 tokens, 25 chars, 5 punct → ratio exactly 0.2 (<=) → kept
        txt = "ab. cd. ef. gh. ij. kkkkk"
        assert len(txt) == 25
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1], "text": [txt], "lang": ["en"]})
        )
        out = corpus_prep(ds, min_tokens=5, max_punct_ratio=0.2).take_all()
        assert [(r["lang"], r["n_docs"]) for r in out] == [("en", 1)]


class TestSelection:
    """Deterministic splits + benchmark decontamination."""

    def test_duckdb_hash64_matches_duckdb(self):
        import duckdb

        from plugin_debezium_ray.functions import selection as sel

        xs = np.array([0, 1, 42, 97, 12345678901234, 2**63 - 1], dtype=np.int64)
        want = [
            r[0]
            for r in duckdb.sql(
                "SELECT hash(x) FROM (SELECT unnest(?) AS x)", params=[xs.tolist()]
            ).fetchall()
        ]
        got = sel.duckdb_hash64(xs).tolist()
        assert got == want

    def test_hash_split_deterministic_and_partition_proof(self):
        from plugin_debezium_ray.functions import selection as sel

        ids = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64)})
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
        a = (
            sel.hash_split(ray.data.from_pandas(ids), splits)
            .to_pandas().set_index("doc_id")["split"]
        )
        # same ids through a different partitioning → identical assignment
        b = (
            sel.hash_split(
                ray.data.from_pandas(ids).repartition(7), splits
            ).to_pandas().set_index("doc_id")["split"]
        )
        assert a.sort_index().equals(b.sort_index())
        frac = a.value_counts(normalize=True)
        assert 0.75 < frac["train"] < 0.85  # avalanche ≈ requested fractions
        assert set(a.unique()) == {"train", "val", "test"}

    def test_hash_split_rejects_bad_fractions(self):
        from plugin_debezium_ray.functions import selection as sel

        with pytest.raises(ValueError):
            sel.hash_split(
                ray.data.from_pandas(pd.DataFrame({"doc_id": [1]})),
                {"train": 0.5, "val": 0.2},
            )

    def _decon_corpus(self):
        bench_txt = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (0, bench_txt),                                    # benchmark member
            (1, "prefix alpha beta gamma delta epsilon suffix"),  # shares 1 gram
            (2, "alpha beta gamma delta epsilon zeta trailing words"),  # shares several
            (3, "completely unrelated document about other things entirely"),
            (4, "short doc"),                                  # < k words: never flagged
            (5, None),                                         # null text: never flagged
        ]
        return pd.DataFrame(rows, columns=["doc_id", "text"])

    def test_decontaminate_drops_overlapping_docs(self):
        from plugin_debezium_ray.functions import selection as sel

        df = self._decon_corpus()
        docs = ray.data.from_pandas(df)
        bench = ray.data.from_pandas(df[df.doc_id == 0])
        kept = sel.decontaminate(docs, bench, k=5).to_pandas()
        assert sorted(kept["doc_id"]) == [3, 4, 5]
        flagged = sel.decontaminate(
            docs, bench, k=5, keep_contaminated=True
        ).to_pandas()
        assert sorted(flagged["doc_id"]) == [0, 1, 2]

    def test_decontaminate_min_overlaps(self):
        from plugin_debezium_ray.functions import selection as sel

        df = self._decon_corpus()
        docs = ray.data.from_pandas(df)
        bench = ray.data.from_pandas(df[df.doc_id == 0])
        # doc 1 shares exactly one 5-gram; doc 2 shares ≥ 2 → only doc 2
        # (and the benchmark doc itself) fall at min_overlaps=2
        kept = sel.decontaminate(docs, bench, k=5, min_overlaps=2).to_pandas()
        assert sorted(kept["doc_id"]) == [1, 3, 4, 5]

    def test_decontaminate_empty_benchmark_keeps_all(self):
        from plugin_debezium_ray.functions import selection as sel

        df = self._decon_corpus()
        docs = ray.data.from_pandas(df)
        bench = ray.data.from_pandas(df[df.doc_id < 0])
        kept = sel.decontaminate(docs, bench, k=5).to_pandas()
        assert sorted(kept["doc_id"]) == [0, 1, 2, 3, 4, 5]
        # bloom mode on an empty benchmark also keeps everything
        kept_b = sel.decontaminate(docs, bench, k=5,
                                   gram_filter="bloom").to_pandas()
        assert sorted(kept_b["doc_id"]) == [0, 1, 2, 3, 4, 5]

    def test_decontaminate_bloom_mode(self):
        """The fixed-size Bloom broadcast: equals the exact probe at a
        generous size, and NEVER false-negative at a tiny one (every
        exact-mode drop is also dropped by bloom — one-sided error)."""
        import pytest

        from plugin_debezium_ray.functions import selection as sel

        df = self._decon_corpus()
        docs = ray.data.from_pandas(df)
        bench = ray.data.from_pandas(df[df.doc_id == 0])
        exact = set(sel.decontaminate(docs, bench, k=5)
                    .to_pandas()["doc_id"])
        roomy = set(sel.decontaminate(docs, bench, k=5,
                                      gram_filter="bloom",
                                      bloom_bits=1 << 20)
                    .to_pandas()["doc_id"])
        assert roomy == exact
        tiny = set(sel.decontaminate(docs, bench, k=5,
                                     gram_filter="bloom",
                                     bloom_bits=64, bloom_probes=2)
                   .to_pandas()["doc_id"])
        assert tiny <= exact  # may over-drop, never under-drop
        with pytest.raises(ValueError, match="gram_filter"):
            sel.decontaminate(docs, bench, gram_filter="nope")
        with pytest.raises(ValueError, match="multiple of 8"):
            sel.decontaminate(docs, bench, gram_filter="bloom",
                              bloom_bits=13)

    def test_stratified_sample_nested_and_deterministic(self):
        from plugin_debezium_ray.functions import selection as sel

        df = pd.DataFrame({
            "doc_id": np.arange(3000, dtype=np.int64),
            "lang": np.tile(["en", "de", "fr"], 1000),
        })
        ds = ray.data.from_pandas(df)
        half = sel.stratified_sample(ds, {"en": 0.5}).to_pandas()
        # untouched groups keep every row
        assert (half["lang"] != "en").sum() == 2000
        en_half = set(half.loc[half.lang == "en", "doc_id"])
        assert 350 < len(en_half) < 650
        # nested property: the 25% sample is a subset of the 50% sample
        quarter = sel.stratified_sample(ds, {"en": 0.25}).to_pandas()
        en_quarter = set(quarter.loc[quarter.lang == "en", "doc_id"])
        assert en_quarter <= en_half
        # determinism across a different partitioning
        again = sel.stratified_sample(
            ray.data.from_pandas(df).repartition(5), {"en": 0.5}
        ).to_pandas()
        assert set(again.loc[again.lang == "en", "doc_id"]) == en_half

    def test_stratified_sample_zero_and_full(self):
        from plugin_debezium_ray.functions import selection as sel

        df = pd.DataFrame({
            "doc_id": np.arange(100, dtype=np.int64),
            "lang": ["en"] * 50 + ["de"] * 50,
        })
        out = sel.stratified_sample(
            ray.data.from_pandas(df), {"en": 0.0}, default_fraction=1.0
        ).to_pandas()
        assert (out["lang"] == "en").sum() == 0
        assert (out["lang"] == "de").sum() == 50


class TestQualityRepresentatives:
    """quality_col keeps the best copy per near-dup cluster (tie → min
    id), on BOTH the small-path shortcut and the distributed tail."""

    def _corpus(self):
        base = " ".join(f"tok{i} shared body of the cluster" for i in range(10))
        base_b = " ".join(f"other{i} второй distinct corpus text" for i in range(10))
        rows = [
            # cluster A: 3 near-dups, best quality is doc 11
            (10, base, 3.0),
            (11, base.replace("tok0", "tok0x"), 9.0),
            (12, base.replace("tok1", "tok1x"), 5.0),
            # cluster B: 2 exact dups, tied quality → min id (20) wins
            (20, base_b, 4.0),
            (21, base_b, 4.0),
            # singleton survives regardless of quality
            (30, "totally unrelated text about unrelated affairs entirely", 0.0),
        ]
        return pd.DataFrame(rows, columns=["doc_id", "text", "quality"])

    @pytest.mark.parametrize("small_max", [20_000, 0])
    def test_best_quality_survives(self, small_max):
        df = self._corpus()
        kept = dedup.minhash_dedup(
            ray.data.from_pandas(df),
            threshold=0.5, num_perm=64, bands=16, k=3,
            quality_col="quality", small_path_max_pairs=small_max,
        ).to_pandas()
        assert sorted(kept["doc_id"]) == [11, 20, 30]

    @pytest.mark.parametrize("small_max", [20_000, 0])
    def test_default_still_min_id(self, small_max):
        df = self._corpus()
        kept = dedup.minhash_dedup(
            ray.data.from_pandas(df),
            threshold=0.5, num_perm=64, bands=16, k=3,
            small_path_max_pairs=small_max,
        ).to_pandas()
        assert sorted(kept["doc_id"]) == [10, 20, 30]


class TestRedaction:
    def test_pii_defaults_order_and_counts(self):
        t = pa.table({"text": [
            "contact john.doe+spam@example.co.uk or +1-415-555-0175",
            "server 192.168.0.1, backup 10.0.0.255",
            "ids 12345678 then a.b@c.io",
            "no pii here",
            None,
        ]})
        out = text.PatternRedactor()(t)
        assert out["text_redacted"].to_pylist() == [
            "contact <EMAIL> or <PHONE>",
            "server <IP>, backup <IP>",
            "ids <PHONE> then <EMAIL>",
            "no pii here",
            None,
        ]
        assert out["n_email"].to_pylist() == [1, 0, 1, 0, None]
        assert out["n_ip"].to_pylist() == [0, 2, 0, 0, None]
        # email digits were consumed BEFORE the phone pass
        assert out["n_phone"].to_pylist() == [1, 0, 1, 0, None]

    def test_custom_patterns(self):
        t = pa.table({"c_name": ["Customer#000000042", "plain"]})
        out = text.PatternRedactor(
            patterns=(("ids", r"\d{6,}", "<ID>"),),
            text_col="c_name", out_col="name_redacted",
        )(t)
        assert out["name_redacted"].to_pylist() == ["Customer#<ID>", "plain"]
        assert out["n_ids"].to_pylist() == [1, 0]


class TestPacking:
    """Sequence packing: the distributed ordered prefix sum must equal
    the single-threaded scan, across block boundaries and edge docs."""

    def test_matches_serial_scan(self):
        from plugin_debezium_ray.functions.packing import pack_sequences

        rng = np.random.default_rng(3)
        n = 500
        texts = [
            " ".join(f"w{j}" for j in range(rng.integers(0, 40)))
            for _ in range(n)
        ]
        texts[7] = ""        # empty doc packs as 0 tokens
        texts[13] = None     # null doc packs as 0 tokens
        df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                           "text": texts})
        # shuffle the input: packing order is defined by doc_id, not
        # arrival order
        shuffled = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
        ds = ray.data.from_pandas(shuffled).repartition(9)
        L = 64
        out = (pack_sequences(ds, seq_len=L).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        # serial reference
        counts = [0 if t is None or not t.split() else len(t.split())
                  for t in texts]
        cum = 0
        first, last, off = [], [], []
        for c in counts:
            start = cum
            cum += c
            first.append(start // L)
            last.append(max((cum - 1) // L, start // L))
            off.append(start % L)
        assert out["n_tokens"].tolist() == counts
        assert out["first_seq"].tolist() == first
        assert out["last_seq"].tolist() == last
        assert out["seq_offset"].tolist() == off
        # long docs really do span sequences in this fixture
        assert (out["last_seq"] > out["first_seq"]).any()

    def test_precomputed_token_col(self):
        from plugin_debezium_ray.functions.packing import pack_sequences

        df = pd.DataFrame({"doc_id": [3, 1, 2], "bpe": [10, 5, 7]})
        out = (pack_sequences(ray.data.from_pandas(df), seq_len=8,
                              token_col="bpe")
               .to_pandas().sort_values("doc_id"))
        # order by id: 5, 7, 10 tokens → starts 0, 5, 12
        assert out["first_seq"].tolist() == [0, 0, 1]
        assert out["last_seq"].tolist() == [0, 1, 2]
        assert out["seq_offset"].tolist() == [0, 5, 4]

    def test_empty_corpus(self):
        from plugin_debezium_ray.functions.packing import pack_sequences

        df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "text": pd.Series([], dtype="object")})
        out = pack_sequences(ray.data.from_pandas(df), seq_len=8)
        assert out.count() == 0


class TestRepetition:
    def test_repetition_stats(self):
        t = pa.table({"text": [
            "a a a a b",            # 5 words, 2 distinct, top a=4
            "all words are unique", # 4/4
            "",                     # empty → zeros
            "   ",                  # whitespace-only → zeros
            None,                   # null → nulls
            "Case CASE case",       # lowercased: 3 words, 1 distinct
        ]})
        out = text.repetition_stats_batch(t)
        assert out["n_distinct_words"].to_pylist() == [2, 4, 0, 0, None, 1]
        dup = out["dup_word_ratio"].to_pylist()
        assert dup[0] == pytest.approx(1 - 2 / 5)
        assert dup[1] == 0.0 and dup[2] == 0.0 and dup[3] == 0.0
        assert dup[4] is None
        assert dup[5] == pytest.approx(1 - 1 / 3)
        top = out["top_word_ratio"].to_pylist()
        assert top[0] == pytest.approx(4 / 5)
        assert top[1] == pytest.approx(1 / 4)
        assert top[2] == 0.0 and top[4] is None
        assert top[5] == pytest.approx(1.0)


class TestChunking:
    def test_overlapping_windows(self):
        from plugin_debezium_ray.functions.packing import chunk_documents

        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d e f g", "x y", "", None],
        }))
        out = (chunk_documents(ds, chunk_tokens=5, overlap=2).to_pandas()
               .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
        got = list(zip(out["doc_id"], out["chunk_id"], out["chunk_text"]))
        assert got == [
            (1, 0, "a b c d e"), (1, 1, "d e f g"), (1, 2, "g"),
            (2, 0, "x y"),
        ]
        assert out["n_chunk_tokens"].tolist() == [5, 4, 1, 2]

    def test_no_overlap_and_validation(self):
        from plugin_debezium_ray.functions.packing import chunk_documents

        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1], "text": ["a b c d"],
        }))
        out = chunk_documents(ds, chunk_tokens=2).to_pandas()
        assert out["chunk_text"].tolist() == ["a b", "c d"]
        with pytest.raises(ValueError):
            chunk_documents(ds, chunk_tokens=4, overlap=4)

    def test_vectorized_matches_loop_reference(self):
        # the Arrow split+take+binary_join path must be byte-equal to a
        # per-doc regex loop on hostile whitespace (tabs/newlines/runs,
        # NBSP must NOT split — RE2 \s semantics), empty/null docs, and
        # both overlap settings
        import re

        from plugin_debezium_ray.functions.packing import chunk_documents

        docs = pd.DataFrame({
            "doc_id": list(range(8)),
            "text": [
                "a\tb\nc  d\r\re f",
                "one",
                "nb sp stays one token",
                "  leading and trailing \t ",
                "", None, "   ",
                " ".join(f"w{i}" for i in range(100)),
            ],
        })
        word_re = re.compile(r"[^\t\n\f\r ]+")
        for ct, ov in [(5, 2), (3, 0), (32, 8)]:
            out = (chunk_documents(
                       ray.data.from_pandas(docs).repartition(3),
                       chunk_tokens=ct, overlap=ov)
                   .to_pandas().sort_values(["doc_id", "chunk_id"])
                   .reset_index(drop=True))
            ref = []
            for did, tx in zip(docs["doc_id"], docs["text"]):
                if tx is None:
                    continue
                toks = word_re.findall(tx)
                for ci, s in enumerate(range(0, len(toks), ct - ov)):
                    e = min(s + ct, len(toks))
                    ref.append((did, ci, e - s, " ".join(toks[s:e])))
            got = list(zip(out["doc_id"], out["chunk_id"],
                           out["n_chunk_tokens"], out["chunk_text"]))
            assert got == ref, (ct, ov)

    def test_preserve_whitespace_raw_spans(self):
        from plugin_debezium_ray.functions.packing import chunk_documents

        # raw-span mode keeps inner whitespace byte-exact and trims
        # only OUTSIDE the first/last token of each chunk
        doc = "  aa   bb\tcc  \n dd "
        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1, 2, 3], "text": [doc, "   \t ", None],
        }))
        out = (chunk_documents(ds, chunk_tokens=2, overlap=1,
                               preserve_whitespace=True)
               .to_pandas().sort_values(["doc_id", "chunk_id"]))
        assert out["doc_id"].tolist() == [1, 1, 1, 1]  # blank/null: none
        assert out["chunk_text"].tolist() == [
            "aa   bb", "bb\tcc", "cc  \n dd", "dd",
        ]
        assert out["n_chunk_tokens"].tolist() == [2, 2, 2, 1]
        # normalized mode over the same doc reassembles single-spaced
        norm = (chunk_documents(ds, chunk_tokens=2, overlap=1)
                .to_pandas().sort_values(["doc_id", "chunk_id"]))
        assert norm["chunk_text"].tolist() == [
            "aa bb", "bb cc", "cc dd", "dd",
        ]


class TestReviewRegressions:
    """Pins for the round-3 self-review findings."""

    def test_pack_sequences_null_precomputed_counts(self):
        from plugin_debezium_ray.functions.packing import pack_sequences

        df = pd.DataFrame({"doc_id": [1, 2, 3],
                           "bpe": pd.array([4, None, 5], dtype="Int64")})
        out = (pack_sequences(ray.data.from_pandas(df), seq_len=4,
                              token_col="bpe")
               .to_pandas().sort_values("doc_id"))
        # null count packs as 0 tokens, later docs unaffected
        assert out["n_tokens"].tolist() == [4, 0, 5]
        assert out["first_seq"].tolist() == [0, 1, 1]
        assert out["seq_offset"].tolist() == [0, 0, 0]

    def test_pack_sequences_empty_corpus_keeps_id_type(self):
        from plugin_debezium_ray.functions.packing import pack_sequences

        # an Arrow-typed empty source (what a parquet read yields)
        ds = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([], pa.string()),
             "text": pa.array([], pa.string())}
        ))
        out = pack_sequences(ds, seq_len=8)
        sch = out.schema()
        assert sch.types[sch.names.index("doc_id")] == pa.string()

    def test_quality_winner_nan_is_worst_and_deterministic(self):
        base = " ".join(f"q{i} same cluster body text" for i in range(8))
        df = pd.DataFrame({
            "doc_id": [1, 2],
            "text": [base, base],
            "quality": [float("nan"), 5.0],
        })
        kept = dedup.minhash_dedup(
            ray.data.from_pandas(df), threshold=0.5, num_perm=64,
            bands=16, k=3, quality_col="quality",
        ).to_pandas()
        assert sorted(kept["doc_id"]) == [2]  # NaN sorts worst, not first

    def test_chunk_and_repetition_match_re2_whitespace(self):
        from plugin_debezium_ray.functions.packing import chunk_documents

        # NBSP is NOT whitespace to RE2 (Arrow/DuckDB): one token
        nbsp_doc = "a b c"
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": [1], "text": [nbsp_doc]}))
        chunks = chunk_documents(ds, chunk_tokens=10).to_pandas()
        assert chunks["n_chunk_tokens"].tolist() == [2]  # not 3
        stats = text.repetition_stats_batch(
            pa.table({"text": [nbsp_doc]}))
        assert stats["n_distinct_words"].to_pylist() == [2]

    def test_cosine_pairs_exact_empty_input(self):
        df = pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                           "embedding": pd.Series([], dtype="object")})
        out = dedup.cosine_pairs_exact(
            ray.data.from_pandas(df), threshold=0.5)
        assert out.count() == 0

    def test_hash_split_rejects_negative_fraction(self):
        from plugin_debezium_ray.functions import selection as sel

        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            sel.hash_split(
                ray.data.from_pandas(pd.DataFrame({"doc_id": [1]})),
                {"train": 1.2, "val": -0.2},
            )


class TestBroadcastJoin:
    def _sides(self):
        big = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, 3, 2, None], pa.int64()),
            "v": pa.array([10.0, 20.0, 30.0, 21.0, 99.0]),
        }))
        small = ray.data.from_arrow(pa.table({
            "sk": pa.array([1, 2], pa.int64()),
            "name": pa.array(["one", "two"]),
        }))
        return big, small

    def test_inner_and_left(self):
        from plugin_debezium_ray.functions.joins import broadcast_join

        big, small = self._sides()
        inner = (broadcast_join(big, small, on="k", right_on="sk")
                 .to_pandas().sort_values(["k", "v"]))
        assert inner["name"].tolist() == ["one", "two", "two"]
        left = (broadcast_join(big, small, on="k", right_on="sk", how="left")
                .to_pandas().sort_values(["v"]))
        # unmatched (k=3) and null-key rows survive with null name
        assert len(left) == 5
        assert left[left.v == 30.0]["name"].isna().all()
        assert left[left.v == 99.0]["name"].isna().all()

    def test_small_side_guard(self):
        from plugin_debezium_ray.functions.joins import broadcast_join

        big, small = self._sides()
        with pytest.raises(ValueError, match="small_max_rows"):
            broadcast_join(big, small, on="k", right_on="sk",
                           small_max_rows=1).to_pandas()

    def test_bad_how(self):
        from plugin_debezium_ray.functions.joins import broadcast_join

        big, small = self._sides()
        with pytest.raises(ValueError, match="how"):
            broadcast_join(big, small, on="k", right_on="sk", how="outer")


class TestSketches:
    def test_hll_error_bound_and_merge(self):
        from plugin_debezium_ray.functions import sketches as sk

        rng = np.random.default_rng(11)
        n_distinct = 50_000
        vals = [f"value-{i}" for i in rng.integers(0, n_distinct, 120_000)]
        exact = len(set(vals))
        # direct register math: error within 3 standard errors (p=14)
        regs = sk.hll_accumulate(
            np.zeros(1 << 14, dtype=np.uint8), np.array(vals, object), 14
        )
        est = sk.hll_estimate(regs)
        assert abs(est - exact) / exact < 3 * 1.04 / np.sqrt(1 << 14)
        # merge associativity: two half-folds maxed == one full fold
        half_a = sk.hll_accumulate(
            np.zeros(1 << 14, dtype=np.uint8),
            np.array(vals[:60_000], object), 14)
        half_b = sk.hll_accumulate(
            np.zeros(1 << 14, dtype=np.uint8),
            np.array(vals[60_000:], object), 14)
        assert np.array_equal(np.maximum(half_a, half_b), regs)

    def test_hll_dataset_aggregate_matches_direct(self):
        from plugin_debezium_ray.functions import sketches as sk

        vals = [f"doc-{i % 700}" for i in range(5_000)] + [None] * 50
        ds = ray.data.from_pandas(pd.DataFrame({"text": vals})).repartition(7)
        est = sk.approx_count_distinct(ds, "text", p=14)
        regs = sk.hll_accumulate(
            np.zeros(1 << 14, dtype=np.uint8), np.array(vals, object), 14
        )
        # distributed tree-merge == single-threaded fold, exactly
        assert est == int(round(sk.hll_estimate(regs)))
        assert abs(est - 700) / 700 < 0.05

    def test_quantize_embeddings(self):
        from plugin_debezium_ray.functions.ann import quantize_embeddings

        vecs = [[0.5, -0.25, 1.0], [0.0, 0.0, 0.0], [-2.0, 1.0, 0.5]]
        ds = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": [1, 2, 3], "embedding": vecs}))
        out = quantize_embeddings(ds).to_pandas().sort_values("vec_id")
        got_q = [list(map(int, v)) for v in out["q"]]
        assert got_q[0] == [63, -31, 127]
        assert got_q[1] == [0, 0, 0]  # zero vector → zeros
        assert got_q[2] == [-127, 63, 31]
        assert out["scale"].tolist() == [1.0, 0.0, 2.0]
        assert out["q_sum"].tolist() == [159, 0, -33]

    def test_quantize_preserves_cosine_ranking(self):
        from plugin_debezium_ray.functions.ann import quantize_embeddings

        rng = np.random.default_rng(5)
        n, dim = 200, 64
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        ds = ray.data.from_pandas(pd.DataFrame({
            "vec_id": np.arange(n),
            "embedding": [v.tolist() for v in vecs]}))
        out = quantize_embeddings(ds).to_pandas().sort_values("vec_id")
        q = np.stack(out["q"].to_numpy()).astype(np.float64)
        f = vecs.astype(np.float64)
        def top10(m, i):
            sims = (m @ m[i]) / (np.linalg.norm(m, axis=1)
                                 * np.linalg.norm(m[i]) + 1e-12)
            order = np.argsort(-sims)
            return [j for j in order if j != i][:10]
        # int8 cosine top-10 overlaps float top-10 heavily
        overlaps = [len(set(top10(q, i)) & set(top10(f, i)))
                    for i in range(20)]
        assert np.mean(overlaps) >= 8.0

    def test_broadcast_join_empty_block_keeps_joined_schema(self):
        from plugin_debezium_ray.functions.joins import broadcast_join

        big, small = TestBroadcastJoin()._sides()
        # one block filters to zero rows, another keeps rows: every
        # UDF-produced block must carry the JOINED schema (a short-
        # circuit would mix pre-join-schema blocks into the stream)
        mixed = big.repartition(5).filter(expr="v == 20.0")
        out = broadcast_join(mixed, small, on="k", right_on="sk",
                             how="left").to_pandas()
        assert list(out.columns) == ["k", "v", "name"]
        assert out["name"].tolist() == ["two"]

    def test_hll_empty_dataset_is_zero(self):
        from plugin_debezium_ray.functions import sketches as sk

        ds = ray.data.from_pandas(pd.DataFrame({"text": ["a", "b"]}))
        assert sk.approx_count_distinct(
            ds.filter(expr="text == 'nope'"), "text") == 0


class TestAsofJoin:
    def _sides(self):
        left = pd.DataFrame({
            "id": [1, 2, 3, 4, 5, 6],
            "k": ["a", "a", "a", "b", "b", "c"],
            "t": [5, 10, 3, 7, 1, 9],
        })
        right = pd.DataFrame({
            "k": ["a", "a", "b"],
            "t": [4, 10, 6],
            "mark": [100, 200, 300],
        })
        return left, right

    def test_backward_semantics_and_typed_nulls(self):
        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        left, right = self._sides()
        out_ds = asof_join_broadcast(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right), on="t", by="k",
        )
        # unmatched rows carry TYPED nulls — int64 stays int64
        assert out_ds.schema().types[-1] == pa.int64()
        out = out_ds.to_pandas().sort_values("id")
        want = {1: 100, 2: 200, 3: None, 4: 300, 5: None, 6: None}
        got = {int(i): (None if pd.isna(m) else int(m))
               for i, m in zip(out["id"], out["mark"])}
        assert got == want

    def test_matches_duckdb_asof_join(self):
        import duckdb

        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        rng = np.random.default_rng(17)
        n = 2000
        left = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 20, n),
            "t": rng.integers(0, 1000, n),
        })
        right = (pd.DataFrame({
            "k": rng.integers(0, 25, 120),
            "t": rng.integers(0, 1000, 120),
            "mark": np.arange(120, dtype=np.int64),
        }).drop_duplicates(["k", "t"]))
        out = (asof_join_broadcast(
                   ray.data.from_pandas(left).repartition(7),
                   ray.data.from_pandas(right), on="t", by="k")
               .to_pandas().sort_values("id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        ref = con.execute(
            "SELECT l.id, r.mark FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t ORDER BY l.id"
        ).df()
        assert out["mark"].fillna(-1).tolist() == \
            ref["mark"].fillna(-1).tolist()

    def test_forward_nearest_and_exact_match_toggle(self):
        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        left, right = self._sides()
        lds = ray.data.from_pandas(left)
        rds = ray.data.from_pandas(right)
        fwd = (asof_join_broadcast(lds, rds, on="t", by="k",
                                   direction="forward")
               .to_pandas().set_index("id")["mark"])
        # id1 (a,5): next a-mark at t=10 -> 200; id3 (a,3): t=4 -> 100
        assert fwd[1] == 200 and fwd[3] == 100 and pd.isna(fwd[5]) is False
        near = (asof_join_broadcast(lds, rds, on="t", by="k",
                                    direction="nearest")
                .to_pandas().set_index("id")["mark"])
        assert near[3] == 100  # |3-4| beats |3-10|
        noex = (asof_join_broadcast(lds, rds, on="t", by="k",
                                    allow_exact_matches=False)
                .to_pandas().set_index("id")["mark"])
        assert noex[2] == 100  # t=10 no longer matches itself

    def test_null_keys_never_match(self):
        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        left = pd.DataFrame({
            "id": [1, 2, 3],
            "k": ["a", None, "a"],
            "t": [5.0, 5.0, None],
        })
        _, right = self._sides()
        right = right.assign(t=right["t"].astype(float))
        out = (asof_join_broadcast(
                   ray.data.from_pandas(left),
                   ray.data.from_pandas(right), on="t", by="k")
               .to_pandas().set_index("id")["mark"])
        assert out[1] == 100 and pd.isna(out[2]) and pd.isna(out[3])

    def test_shuffle_variant_key_with_no_right_rows(self):
        # a left key absent from the right side entirely: the group has
        # zero right rows — every left row surfaces unmatched (this
        # indexed an empty array before the sf0.1 fix)
        from plugin_debezium_ray.functions.joins import asof_join_shuffle

        left = pd.DataFrame({
            "id": [1, 2, 3], "k": [1, 2, 2], "t": [5, 5, 9]})
        right = pd.DataFrame({"k": [2], "t": [4], "mark": [77]})
        out = (asof_join_shuffle(
                   ray.data.from_pandas(left), ray.data.from_pandas(right),
                   on="t", by="k")
               .to_pandas().set_index("id")["mark"])
        assert pd.isna(out[1]) and out[2] == 77 and out[3] == 77

    def test_shuffle_variant_equals_broadcast(self):
        from plugin_debezium_ray.functions.joins import (
            asof_join_broadcast,
            asof_join_shuffle,
        )

        rng = np.random.default_rng(29)
        n = 1500
        left = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 15, n),
            "t": rng.integers(0, 500, n),
        })
        # inject null keys on the left: they must surface unmatched
        left.loc[[3, 7], "k"] = pd.NA
        left = left.astype({"k": "Int64"})
        right = (pd.DataFrame({
            "k": rng.integers(0, 18, 200).astype("int64"),
            "t": rng.integers(0, 500, 200),
            "mark": np.arange(200, dtype=np.int64),
        }).drop_duplicates(["k", "t"]))
        for exact in (True, False):
            a = (asof_join_broadcast(
                     ray.data.from_pandas(left).repartition(5),
                     ray.data.from_pandas(right), on="t", by="k",
                     allow_exact_matches=exact)
                 .to_pandas().sort_values("id").reset_index(drop=True))
            b = (asof_join_shuffle(
                     ray.data.from_pandas(left).repartition(5),
                     ray.data.from_pandas(right).repartition(3),
                     on="t", by="k", allow_exact_matches=exact)
                 .to_pandas().sort_values("id").reset_index(drop=True))
            assert len(b) == n
            assert a["mark"].fillna(-1).tolist() == \
                b["mark"].fillna(-1).tolist()
        assert b.set_index("id").loc[[3, 7], "mark"].isna().all()
        # forward / nearest directions agree with the broadcast variant
        for direction in ("forward", "nearest"):
            a = (asof_join_broadcast(
                     ray.data.from_pandas(left),
                     ray.data.from_pandas(right), on="t", by="k",
                     direction=direction)
                 .to_pandas().sort_values("id"))
            b = (asof_join_shuffle(
                     ray.data.from_pandas(left),
                     ray.data.from_pandas(right), on="t", by="k",
                     direction=direction)
                 .to_pandas().sort_values("id"))
            assert a["mark"].fillna(-1).tolist() == \
                b["mark"].fillna(-1).tolist()

    def test_validation(self):
        import pytest

        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        left, right = self._sides()
        lds = ray.data.from_pandas(left)
        with pytest.raises(ValueError, match="direction"):
            asof_join_broadcast(lds, ray.data.from_pandas(right),
                                on="t", by="k", direction="sideways")
        with pytest.raises(ValueError, match="collide"):
            asof_join_broadcast(
                lds, ray.data.from_pandas(right.rename(columns={"mark": "id"})),
                on="t", by="k")
        with pytest.raises(ValueError, match="small_max_rows"):
            asof_join_broadcast(lds, ray.data.from_pandas(right),
                                on="t", by="k", small_max_rows=2)


class TestGlobalOrderRank:
    def test_rank_matches_argsort_and_is_partition_proof(self):
        from plugin_debezium_ray.functions.packing import global_order_rank

        rng = np.random.default_rng(41)
        df = pd.DataFrame({
            "doc_id": np.arange(2000, dtype=np.int64),
            "key": rng.permutation(2000).astype(np.int64),
        })
        want = {int(d): int(r) for r, d in
                enumerate(df.sort_values(["key", "doc_id"])["doc_id"])}
        for parts in (3, 11):
            out = global_order_rank(
                ray.data.from_pandas(df).repartition(parts),
                order_cols=["key", "doc_id"],
            ).to_pandas()
            got = dict(zip(out["doc_id"].astype(int),
                           out["rank"].astype(int)))
            assert got == want
        # drop_order_cols removes the helper column
        out = global_order_rank(
            ray.data.from_pandas(df), order_cols=["key", "doc_id"],
            drop_order_cols=["key"],
        ).to_pandas()
        assert list(out.columns) == ["doc_id", "rank"]

    def test_empty_input(self):
        from plugin_debezium_ray.functions.packing import global_order_rank

        empty = ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64")}))
        assert global_order_rank(
            empty, order_cols=["doc_id"]).count() == 0


class TestReviewRegressionsR4:
    """Pins for the round-4 self-review findings."""

    def test_asof_nullable_int_keys_no_dtype_crash(self):
        # an int64 key column with one null must not flip to float64 and
        # MergeError against the int64 right frame — nulls just never match
        from plugin_debezium_ray.functions.joins import asof_join_broadcast

        left = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "k": pa.array([1, None, 1], pa.int64()),
            "t": pa.array([5, 5, None], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, None], pa.int64()),
            "t": pa.array([4, 1], pa.int64()),
            "mark": pa.array([100, 999], pa.int64()),
        })
        out = (asof_join_broadcast(
                   ray.data.from_arrow(left), ray.data.from_arrow(right),
                   on="t", by="k")
               .to_pandas().set_index("id")["mark"])
        assert out[1] == 100 and pd.isna(out[2]) and pd.isna(out[3])
        assert 999 not in set(out.dropna())  # null RIGHT keys never match

    def test_interval_inverted_bounds_ignored(self):
        from plugin_debezium_ray.functions.joins import (
            interval_join_broadcast,
        )

        left = pd.DataFrame({"id": [1, 2], "t": [5.0, 15.0]})
        iv = pd.DataFrame({
            "iv_id": [10, 20],
            "start_ts": [20.0, 0.0],   # first interval is INVERTED
            "end_ts": [0.0, 30.0],
        })
        out = (interval_join_broadcast(
                   ray.data.from_pandas(left), ray.data.from_pandas(iv),
                   on="t")
               .to_pandas())
        assert sorted(zip(out["id"], out["iv_id"])) == [(1, 20), (2, 20)]

    def test_quantiles_date_group_key(self):
        import datetime as dt

        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        t = pa.table({
            "d": pa.array([dt.date(2026, 1, 1)] * 3 + [dt.date(2026, 1, 2)] * 2),
            "x": pa.array([3, 1, 2, 10, 20], pa.int64()),
        })
        out = exact_quantiles(ray.data.from_arrow(t), "x", [0.5], by="d")
        # pandas renders date32 cells as Timestamps — compare as dates
        got = {pd.Timestamp(d).date(): v
               for d, v in zip(out["d"], out["value"])}
        assert got == {dt.date(2026, 1, 1): 2, dt.date(2026, 1, 2): 10}

    def test_quantiles_nan_group_is_one_group(self):
        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        df = pd.DataFrame({
            "g": [1.0, 1.0, np.nan, np.nan, np.nan],
            "x": [5, 7, 1, 2, 3],
        })
        out = exact_quantiles(
            ray.data.from_pandas(df).repartition(3), "x", [1.0], by="g")
        assert len(out) == 2  # NaN rows form ONE group, not one per row
        nan_rows = out[out["g"].isna()]
        assert len(nan_rows) == 1 and nan_rows["value"].iloc[0] == 3

    def test_quantile_q_validation(self):
        import pytest

        from plugin_debezium_ray.functions.quantiles import (
            exact_quantiles,
            filter_by_quantile,
        )

        ds = ray.data.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            exact_quantiles(ds, "x", [0.5, 25])
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            filter_by_quantile(ds, "x", 25)  # "25th percentile" typo guard
        with pytest.raises(ValueError, match="keep"):
            filter_by_quantile(ds, "x", 0.25, keep="sideways")

    def test_ion_negative_interval_nanoseconds(self):
        import pyarrow as _pa

        from plugin_debezium_ray.serde import ion_dumps

        assert ion_dumps(_pa.MonthDayNano([0, 0, -1])) == \
            '"P0M0DT-0.000000001S"'
        assert ion_dumps(_pa.MonthDayNano([1, -2, -1_500_000_000])) == \
            '"P1M-2DT-1.500000000S"'

    def test_decontaminate_rolled_gram_not_swap_symmetric(self):
        """Grams differing only by swapping their first two tokens must
        NOT collide: an unmixed rolling start made sm64(t1 ^ t2)
        symmetric and flagged 'stream data query ...' as contaminated by
        a benchmark containing 'data stream query ...' (real sf0.001
        false positive)."""
        from plugin_debezium_ray.functions.selection import _doc_gram_lanes

        _, a0, a1 = _doc_gram_lanes(["stream data query fast agg"], 5)
        _, b0, b1 = _doc_gram_lanes(["data stream query fast agg"], 5)
        assert (int(a0[0]), int(a1[0])) != (int(b0[0]), int(b1[0]))
        # and equal sequences still hash equal
        _, c0, c1 = _doc_gram_lanes(["stream data query fast agg"], 5)
        assert (int(a0[0]), int(a1[0])) == (int(c0[0]), int(c1[0]))

    def test_decontaminate_h0_collision_run_scan(self):
        # two DISTINCT benchmark grams sharing an h0 value: the probe
        # must scan the whole equal-h0 run, not just its first entry
        from plugin_debezium_ray.functions.selection import _Decontaminator

        import ray as _ray

        payload = (
            np.array([7, 7, 9], dtype=np.uint64),     # b0 with a dup run
            np.array([100, 200, 300], dtype=np.uint64),
        )
        probe = _Decontaminator(
            _ray.put(payload), k=5, min_overlaps=1,
            text_col="text", keep_contaminated=False,
        )
        h0 = np.array([7, 7, 9, 8], dtype=np.uint64)
        h1 = np.array([200, 101, 300, 300], dtype=np.uint64)
        got = probe._hits(h0, h1)
        # [7,200] matches the SECOND entry of the run; [7,101] matches
        # neither; [9,300] single-entry hit; [8,*] absent
        assert got.tolist() == [True, False, True, False]


class TestShuffleJoin:
    def test_matches_duckdb_inner(self):
        import duckdb

        from plugin_debezium_ray.functions.joins import shuffle_join

        rng = np.random.default_rng(3)
        left = pd.DataFrame({
            "k": rng.integers(0, 50, 800),
            "v": rng.integers(0, 1000, 800),
        })
        right = pd.DataFrame({
            "rk": rng.integers(0, 60, 300),
            "w": rng.integers(0, 1000, 300),
        })
        out = shuffle_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            on="k", right_on="rk", num_partitions=4,
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        ref = con.execute(
            "SELECT k, v, w FROM l JOIN r ON l.k = r.rk").df()
        key = lambda d: sorted(zip(d["k"], d["v"], d["w"]))
        assert key(out) == key(ref)

    def test_how_validation(self):
        import pytest

        from plugin_debezium_ray.functions.joins import shuffle_join

        ds = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
        with pytest.raises(ValueError, match="how"):
            shuffle_join(ds, ds, on="k", how="sideways")


class TestIntervalJoin:
    def test_containment_overlap_and_nulls(self):
        import pytest

        from plugin_debezium_ray.functions.joins import (
            interval_join_broadcast,
        )

        left = pd.DataFrame({
            "id": [1, 2, 3, 4, 5],
            "t": [5.0, 10.0, 15.0, 99.0, None],
        })
        iv = pd.DataFrame({
            "iv_id": [10, 20, 30],
            "start_ts": [0.0, 8.0, None],
            "end_ts": [11.0, 20.0, 50.0],
        })
        out = (interval_join_broadcast(
                   ray.data.from_pandas(left).repartition(3),
                   ray.data.from_pandas(iv), on="t")
               .to_pandas())
        got = sorted(zip(out["id"], out["iv_id"]))
        # start inclusive, end exclusive; overlaps multiply-match;
        # null t and null-bounded intervals never match; id=4 unmatched
        assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]
        with pytest.raises(ValueError, match="collide"):
            interval_join_broadcast(
                ray.data.from_pandas(left),
                ray.data.from_pandas(iv.rename(columns={"iv_id": "id"})),
                on="t")

    def test_keyed_interval_join_matches_sql(self):
        import duckdb

        from plugin_debezium_ray.functions.joins import (
            interval_join_broadcast,
        )

        rng = np.random.default_rng(31)
        left = pd.DataFrame({
            "id": np.arange(2500, dtype=np.int64),
            "k": rng.integers(0, 12, 2500),
            "t": rng.integers(0, 5000, 2500).astype(float),
        })
        left.loc[[5, 6], "k"] = pd.NA  # null keys never match
        left = left.astype({"k": "Int64"})
        starts = rng.integers(0, 5000, 80).astype(float)
        iv = pd.DataFrame({
            "k": rng.integers(0, 14, 80).astype("int64"),
            "iv_id": np.arange(80, dtype=np.int64),
            "start_ts": starts,
            "end_ts": starts + rng.integers(1, 600, 80),
        })
        out = (interval_join_broadcast(
                   ray.data.from_pandas(left).repartition(5),
                   ray.data.from_pandas(iv), on="t", by="k")
               .to_pandas())
        con = duckdb.connect()
        con.register("l", left)
        con.register("iv", iv)
        ref = con.execute(
            "SELECT l.id, iv.iv_id FROM l JOIN iv ON l.k = iv.k "
            "AND l.t >= iv.start_ts AND l.t < iv.end_ts"
        ).df()
        assert sorted(zip(out["id"], out["iv_id"])) == \
            sorted(zip(ref["id"], ref["iv_id"]))
        assert "k" in out.columns and "iv_id" in out.columns

    def test_nan_keys_never_match(self):
        # regression: float-NaN left keys passed the `is not None`
        # check, factorized to code -1, and uniques[-1] silently WRAPPED
        # to the LAST key's intervals; a batch whose valid-time rows
        # were ALL NaN-keyed crashed with IndexError on empty uniques.
        from plugin_debezium_ray.functions.joins import (
            interval_join_broadcast,
        )

        # block A: every key NaN (the old IndexError shape)
        la = pd.DataFrame({
            "id": [1, 2],
            "k": [float("nan"), float("nan")],
            "t": [5.0, 15.0],
        })
        # block B: mixed NaN / valid / null keys
        lb = pd.DataFrame({
            "id": [3, 4, 5, 6],
            "k": [1.0, float("nan"), 2.0, None],
            "t": [5.0, 5.0, 15.0, 5.0],
        })
        iv = pd.DataFrame({
            "k": [1.0, 2.0, float("nan")],  # NaN interval key: dropped
            "iv_id": [10, 20, 30],
            "start_ts": [0.0, 10.0, 0.0],
            "end_ts": [100.0, 100.0, 100.0],
        })
        left = ray.data.from_pandas(la).union(ray.data.from_pandas(lb))
        out = interval_join_broadcast(
            left, ray.data.from_pandas(iv), on="t", by="k",
        ).to_pandas()
        assert sorted(zip(out["id"], out["iv_id"])) == [(3, 10), (5, 20)]

    def test_matches_sql_range_join(self):
        import duckdb

        from plugin_debezium_ray.functions.joins import (
            interval_join_broadcast,
        )

        rng = np.random.default_rng(23)
        left = pd.DataFrame({
            "id": np.arange(3000, dtype=np.int64),
            "t": rng.integers(0, 10_000, 3000),
        })
        starts = rng.integers(0, 10_000, 60)
        iv = pd.DataFrame({
            "iv_id": np.arange(60, dtype=np.int64),
            "start_ts": starts,
            "end_ts": starts + rng.integers(1, 800, 60),
        })
        out = (interval_join_broadcast(
                   ray.data.from_pandas(left).repartition(5),
                   ray.data.from_pandas(iv), on="t")
               .to_pandas())
        con = duckdb.connect()
        con.register("l", left)
        con.register("iv", iv)
        ref = con.execute(
            "SELECT l.id, iv.iv_id FROM l JOIN iv "
            "ON l.t >= iv.start_ts AND l.t < iv.end_ts"
        ).df()
        assert sorted(zip(out["id"], out["iv_id"])) == \
            sorted(zip(ref["id"], ref["iv_id"]))


class TestThresholdSample:
    def test_rule_and_monotonicity(self):
        from plugin_debezium_ray.functions.selection import (
            duckdb_hash64,
            threshold_sample,
        )

        n = 5000
        ids = np.arange(n, dtype=np.int64)
        thr_lo = np.where(ids % 2 == 0, 2_000, 7_000).astype(np.int64)
        df = pd.DataFrame({"doc_id": ids, "_thr": thr_lo})
        kept = threshold_sample(
            ray.data.from_pandas(df).repartition(6), thr_col="_thr"
        ).to_pandas()
        want = ids[(duckdb_hash64(ids) % np.uint64(10_000)).astype(np.int64)
                   < thr_lo]
        assert sorted(kept["doc_id"]) == sorted(want)
        # monotone: every row kept at thr stays kept at thr + 1000
        df2 = df.assign(_thr=df["_thr"] + 1000)
        kept2 = threshold_sample(
            ray.data.from_pandas(df2), thr_col="_thr").to_pandas()
        assert set(kept["doc_id"]) <= set(kept2["doc_id"])
        # null thresholds drop the row
        df3 = df.astype({"_thr": "Int64"})
        df3.loc[:, "_thr"] = pd.NA
        assert threshold_sample(
            ray.data.from_pandas(df3), thr_col="_thr").count() == 0


class TestSemanticDedup:
    def _planted(self):
        rng = np.random.default_rng(11)
        base = rng.normal(size=(40, 16)).astype(np.float32)
        # plant exact duplicates of rows 0..4 at ids 100..104
        vecs = np.concatenate([base, base[:5]])
        ids = np.concatenate([np.arange(40), np.arange(100, 105)])
        return pd.DataFrame({
            "vec_id": ids.astype(np.int64),
            "embedding": [v.tolist() for v in vecs],
        })

    def test_drops_planted_duplicates_keeps_lowest_id(self):
        from plugin_debezium_ray.functions.dedup import semantic_dedup

        df = self._planted()
        out = semantic_dedup(
            ray.data.from_pandas(df).repartition(4),
            n_clusters=4, threshold=0.95,
        ).to_pandas()
        survivors = set(out["vec_id"])
        assert {100, 101, 102, 103, 104} & survivors == set()
        assert {0, 1, 2, 3, 4} <= survivors  # originals (lower id) kept
        # audit view is the exact complement
        from plugin_debezium_ray.functions.dedup import (
            semantic_dedup as sd,
        )
        flagged = sd(ray.data.from_pandas(df), n_clusters=4,
                     threshold=0.95, keep_flagged=True).to_pandas()
        assert set(flagged["vec_id"]) == set(df["vec_id"]) - survivors

    def test_partitioning_invariance(self):
        from plugin_debezium_ray.functions.dedup import semantic_dedup

        df = self._planted()
        a = semantic_dedup(ray.data.from_pandas(df).repartition(2),
                           n_clusters=3, threshold=0.95).to_pandas()
        b = semantic_dedup(ray.data.from_pandas(df).repartition(9),
                           n_clusters=3, threshold=0.95).to_pandas()
        assert sorted(a["vec_id"]) == sorted(b["vec_id"])

    def test_strip_blocking_equals_full_matrix(self):
        from plugin_debezium_ray.functions.dedup import semantic_dedup

        df = self._planted()
        a = semantic_dedup(ray.data.from_pandas(df), n_clusters=2,
                           threshold=0.95).to_pandas()
        b = semantic_dedup(ray.data.from_pandas(df), n_clusters=2,
                           threshold=0.95, max_cluster_block=3).to_pandas()
        assert sorted(a["vec_id"]) == sorted(b["vec_id"])

    def test_empty_block_keeps_one_output_schema(self):
        # an empty input block rides the whole plan; no block of the
        # output stream may keep the internal _cluster column
        from plugin_debezium_ray.functions.dedup import semantic_dedup

        df = self._planted()
        ds = ray.data.from_pandas(df).union(
            ray.data.from_pandas(df.iloc[0:0]))
        out = semantic_dedup(ds, n_clusters=3, threshold=0.95)
        schemas = {tuple(b.column_names)
                   for b in out.iter_batches(batch_format="pyarrow")}
        for names in schemas:
            assert "_cluster" not in names
        assert len({tuple(sorted(n)) for n in schemas}) == 1


class TestTfidf:
    def test_doc_term_counts_batch(self):
        from plugin_debezium_ray.functions.text import doc_term_counts_batch

        t = pa.table({
            "doc_id": [1, 2, 3, 4],
            "text": ["a B a  c", "b", None, "   "],
        })
        out = doc_term_counts_batch(t)
        got = sorted(zip(out["doc_id"].to_pylist(),
                         out["term"].to_pylist(),
                         out["tf"].to_pylist()))
        assert got == [(1, "a", 2), (1, "b", 1), (1, "c", 1), (2, "b", 1)]

    def test_top_terms_reference_and_log_mode(self):
        from plugin_debezium_ray.functions.text import top_terms_by_tfidf

        # 'rare' appears only in doc 1 → beats the ubiquitous 'the'
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["the the rare", "the the the", "the common common"],
        })
        for idf in ("raw", "log"):
            out = top_terms_by_tfidf(
                ray.data.from_pandas(df).repartition(3), k=1, idf=idf,
            ).to_pandas().set_index("doc_id")
            assert out.loc[1, "term"] == "rare"
            assert out.loc[3, "term"] == "common"
            assert out.loc[1, "df"] == 1 and out.loc[1, "tf"] == 1
        import pytest
        with pytest.raises(ValueError, match="idf"):
            top_terms_by_tfidf(ray.data.from_pandas(df), idf="nope")


class TestExactQuantiles:
    def test_global_matches_duckdb(self):
        import duckdb

        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(5)
        vals = rng.integers(-500, 500, 3001).astype(np.int64)
        df = pd.DataFrame({"x": vals})
        qs = [0.0, 0.01, 0.25, 0.28, 0.5, 2 / 3, 0.9, 0.999, 1.0]
        out = exact_quantiles(
            ray.data.from_pandas(df).repartition(9), "x", qs)
        con = duckdb.connect()
        con.register("t", df)
        for q, v in zip(out["q"], out["value"]):
            ref = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
            assert v == ref, (q, v, ref)

    def test_grouped_with_null_values_and_null_group(self):
        import duckdb

        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        rng = np.random.default_rng(6)
        n = 2000
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c", None], n),
            "x": rng.integers(0, 100, n).astype(float),
        })
        df.loc[rng.choice(n, 50, replace=False), "x"] = np.nan
        out = exact_quantiles(
            ray.data.from_pandas(df).repartition(8), "x", [0.5, 0.9],
            by="g",
        )
        con = duckdb.connect()
        con.register("t", df)
        ref = con.execute("""
            SELECT g, 0.5 AS q, quantile_disc(x, 0.5) AS value
            FROM t GROUP BY g
            UNION ALL
            SELECT g, 0.9, quantile_disc(x, 0.9) FROM t GROUP BY g
        """).df()
        key = lambda d: sorted(
            (("∅" if pd.isna(g) else g), float(q), float(v))
            for g, q, v in zip(d["g"], d["q"], d["value"])
        )
        assert key(out) == key(ref)

    def test_empty_and_single(self):
        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        empty = ray.data.from_pandas(
            pd.DataFrame({"x": pd.Series([], dtype="int64")}))
        assert len(exact_quantiles(empty, "x", [0.5])) == 0
        one = ray.data.from_pandas(pd.DataFrame({"x": [7]}))
        out = exact_quantiles(one, "x", [0.0, 0.5, 1.0])
        assert out["value"].tolist() == [7, 7, 7]

    def test_max_groups_guard(self):
        from plugin_debezium_ray.functions.quantiles import exact_quantiles

        df = pd.DataFrame({
            "g": np.arange(20, dtype=np.int64),  # 20 distinct groups
            "x": np.arange(20, dtype=np.int64),
        })
        ds = ray.data.from_pandas(df)
        with pytest.raises(ValueError, match="max_groups"):
            exact_quantiles(ds, "x", [0.5], by="g", max_groups=10)
        # at the bound it still works
        out = exact_quantiles(ds, "x", [0.5], by="g", max_groups=20)
        assert len(out) == 20


class TestGroupedTopK:
    def test_matches_window_reference(self):
        from plugin_debezium_ray.functions.ranking import grouped_top_k

        rng = np.random.default_rng(9)
        n = 3000
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], n),
            "score": rng.integers(0, 50, n),  # heavy ties
        })
        out = (grouped_top_k(
                   ray.data.from_pandas(df).repartition(11),
                   group_col="lang", score_col="score",
                   id_col="doc_id", k=7)
               .to_pandas().sort_values(["lang", "doc_id"])
               .reset_index(drop=True))
        # reference: pandas window (score desc, id asc)
        ref = (df.sort_values(["score", "doc_id"],
                              ascending=[False, True], kind="stable")
               .groupby("lang", sort=False).head(7)
               .sort_values(["lang", "doc_id"]).reset_index(drop=True))
        assert out[["doc_id", "lang", "score"]].equals(
            ref[["doc_id", "lang", "score"]])

    def test_small_group_and_ascending(self):
        from plugin_debezium_ray.functions.ranking import grouped_top_k

        df = pd.DataFrame({
            "doc_id": [1, 2, 3], "lang": ["en", "en", "fr"],
            "score": [5, 9, 1],
        })
        out = grouped_top_k(
            ray.data.from_pandas(df), group_col="lang",
            score_col="score", id_col="doc_id", k=2, ascending=True,
        ).to_pandas()
        got = sorted(zip(out["lang"], out["doc_id"]))
        # fr has fewer than k rows — all survive; ascending keeps lowest
        assert got == [("en", 1), ("en", 2), ("fr", 3)]

    def test_nullable_numeric_group_hash_stable(self):
        # regression: a block CONTAINING a null used to convert the
        # int64 group col to float64 objects while null-free blocks
        # hashed np.int64 objects — the same group landed in two
        # partitions and k doubled.  Two explicit blocks, group 16 in
        # both, null only in the second.
        from plugin_debezium_ray.functions.ranking import grouped_top_k

        t1 = pa.table({
            "g": pa.array([16, 16, 16], pa.int64()),
            "score": pa.array([1, 2, 3], pa.int64()),
            "doc_id": pa.array([0, 1, 2], pa.int64()),
        })
        t2 = pa.table({
            "g": pa.array([16, 16, None], pa.int64()),
            "score": pa.array([4, 5, 6], pa.int64()),
            "doc_id": pa.array([3, 4, 5], pa.int64()),
        })
        ds = ray.data.from_arrow(t1).union(ray.data.from_arrow(t2))
        out = grouped_top_k(
            ds, group_col="g", score_col="score", id_col="doc_id", k=2,
        ).to_pandas()
        g16 = out[out["g"] == 16]
        assert len(g16) == 2, f"group split across partitions: {out}"
        assert sorted(g16["doc_id"]) == [3, 4]  # scores 4, 5 win
        # the null group is its own group and keeps its single row
        assert out["g"].isna().sum() == 1


class TestVectorsOf:
    """Zero-copy embedding-column ingestion (`_vectors_of`)."""

    def _ref(self, col, dtype):
        rows = [np.asarray(v, dtype=dtype) for v in col.to_pylist()]
        return np.stack(rows) if rows else np.empty((0, 0), dtype=dtype)

    def test_fixed_size_list_zero_copy(self):
        from plugin_debezium_ray.functions.dedup import _vectors_of

        m = np.arange(24, dtype=np.float32).reshape(6, 4)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(m.reshape(-1)), 4)
        got = _vectors_of(pa.chunked_array([arr]))
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, m)
        # sliced array must honour the offset
        got2 = _vectors_of(arr.slice(2, 3))
        np.testing.assert_array_equal(got2, m[2:5])

    def test_variable_list_equal_lengths(self):
        from plugin_debezium_ray.functions.dedup import _vectors_of

        rows = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
        arr = pa.array(rows, type=pa.list_(pa.float32()))
        got = _vectors_of(arr, np.float64)
        np.testing.assert_array_equal(got, self._ref(arr, np.float64))
        assert got.dtype == np.float64
        # sliced list array (non-zero offsets[0])
        got2 = _vectors_of(arr.slice(1, 2))
        np.testing.assert_array_equal(got2, np.array(rows[1:3], np.float32))

    def test_ragged_raises(self):
        from plugin_debezium_ray.functions.dedup import _vectors_of

        # embeddings must be equal-length; ragged input surfaces as the
        # same ValueError the old per-row np.stack path raised
        ragged = pa.array([[1.0], [2.0, 3.0], [4.0]],
                          type=pa.list_(pa.float64()))
        with pytest.raises(ValueError):
            _vectors_of(ragged, np.float64)

    def test_empty(self):
        from plugin_debezium_ray.functions.dedup import _vectors_of

        arr = pa.array([], type=pa.list_(pa.float32()))
        got = _vectors_of(arr, np.float32)
        assert got.shape[0] == 0

    def test_matches_old_path_on_testdata_shape(self):
        from plugin_debezium_ray.functions.dedup import _vectors_of

        rng = np.random.default_rng(3)
        m = rng.normal(size=(50, 8)).astype(np.float32)
        arr = pa.array([r.tolist() for r in m], type=pa.list_(pa.float32()))
        np.testing.assert_array_equal(_vectors_of(arr, np.float32), m)


class TestGroupKeyHash:
    """Block-stable partition hashing for group keys."""

    def test_int_hash_stable_across_null_presence(self):
        from plugin_debezium_ray.functions.selection import group_key_hash64

        clean = group_key_hash64(pa.array([16, 17, 18], pa.int64()))
        dirty = group_key_hash64(pa.array([16, None, 18], pa.int64()))
        assert clean[0] == dirty[0]
        assert clean[2] == dirty[2]

    def test_int_and_float_same_value_same_hash(self):
        from plugin_debezium_ray.functions.selection import group_key_hash64

        hi = group_key_hash64(pa.array([16], pa.int64()))
        hf = group_key_hash64(pa.array([16.0], pa.float64()))
        assert hi[0] == hf[0]

    def test_zero_and_nan_canonicalized(self):
        from plugin_debezium_ray.functions.selection import group_key_hash64

        h = group_key_hash64(pa.array([0.0, -0.0], pa.float64()))
        assert h[0] == h[1]
        h2 = group_key_hash64(
            pa.array([float("nan"), None], pa.float64()))
        assert h2[0] == h2[1]

    def test_string_and_exotic_paths(self):
        from plugin_debezium_ray.functions.selection import group_key_hash64

        hs = group_key_hash64(pa.array(["a", "b", None]))
        assert hs[0] != hs[1]
        a = group_key_hash64(pa.array([True, False, None]))
        b = group_key_hash64(pa.array([True, False, True]))
        assert a[0] == b[0] and a[1] == b[1]


class TestGroupedQuantilesDs:
    """Distributed per-group quantiles (result stays a Dataset)."""

    def test_matches_duckdb_per_group(self):
        import duckdb

        from plugin_debezium_ray.functions.quantiles import (
            grouped_quantiles_ds,
        )

        rng = np.random.default_rng(17)
        n = 4000
        df = pd.DataFrame({
            "g": rng.integers(0, 37, n),
            "x": rng.integers(-1000, 1000, n).astype("float64"),
        })
        df.loc[::97, "x"] = None  # null values ignored
        out = (grouped_quantiles_ds(
                   ray.data.from_pandas(df).repartition(7),
                   "x", [0.5, 0.95, 0.28], by="g")
               .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", df)
        ref = con.execute("""
            WITH nn AS (SELECT * FROM t WHERE x IS NOT NULL)
            SELECT * FROM (
              SELECT g, 0.28 AS q, quantile_disc(x, 0.28) AS value
              FROM nn GROUP BY g
              UNION ALL
              SELECT g, 0.5, quantile_disc(x, 0.5) FROM nn GROUP BY g
              UNION ALL
              SELECT g, 0.95, quantile_disc(x, 0.95) FROM nn GROUP BY g
            ) ORDER BY g, q
        """).df()
        assert len(out) == len(ref)
        assert np.array_equal(out["g"], ref["g"])
        assert np.allclose(out["q"], ref["q"])
        assert np.array_equal(out["value"], ref["value"])

    def test_string_groups_and_null_nan_keys(self):
        from plugin_debezium_ray.functions.quantiles import (
            exact_quantiles,
            grouped_quantiles_ds,
        )

        df = pd.DataFrame({
            "g": ["a", "a", "b", None, None, "a"],
            "x": [3, 1, 9, 5, 7, 2],
        })
        out = (grouped_quantiles_ds(
                   ray.data.from_pandas(df).repartition(3), "x", [0.5],
                   by="g")
               .to_pandas())
        got = {(r["g"] if isinstance(r["g"], str) else None): r["value"]
               for _, r in out.iterrows()}
        assert got == {"a": 2, "b": 9, None: 5}
        # parity with the driver-side form on the same input
        drv = exact_quantiles(
            ray.data.from_pandas(df), "x", [0.5], by="g")
        want = {(g if isinstance(g, str) else None): v
                for g, v in zip(drv["g"], drv["value"])}
        assert got == want

    def test_partitioning_invariance_and_empty(self):
        from plugin_debezium_ray.functions.quantiles import (
            grouped_quantiles_ds,
        )

        rng = np.random.default_rng(5)
        df = pd.DataFrame({
            "g": rng.integers(0, 9, 500),
            "x": rng.normal(size=500),
        })
        a = (grouped_quantiles_ds(ray.data.from_pandas(df).repartition(2),
                                  "x", [0.5, 0.9], by="g", num_partitions=4)
             .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
        b = (grouped_quantiles_ds(ray.data.from_pandas(df).repartition(11),
                                  "x", [0.5, 0.9], by="g", num_partitions=32)
             .to_pandas().sort_values(["g", "q"]).reset_index(drop=True))
        assert a.equals(b)
        empty = ray.data.from_pandas(
            pd.DataFrame({"g": pd.Series([], dtype="int64"),
                          "x": pd.Series([], dtype="float64")}))
        assert grouped_quantiles_ds(empty, "x", [0.5], by="g").count() == 0
        import pytest as _pt
        with _pt.raises(ValueError, match="quantiles"):
            grouped_quantiles_ds(empty, "x", [1.5], by="g")


class TestMixtureResample:
    def test_matches_sql_and_proportions(self):
        import duckdb

        from plugin_debezium_ray.functions.selection import mixture_resample

        rng = np.random.default_rng(21)
        n = 30_000
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(
                ["en", "de", "fr", "xx"], n, p=[0.7, 0.15, 0.1, 0.05]),
        })
        out = mixture_resample(
            ray.data.from_pandas(df).repartition(8),
            group_col="lang", ratios={"en": 2, "de": 1, "fr": 1},
        ).to_pandas()
        con = duckdb.connect()
        con.register("d", df)
        ref = con.execute("""
            WITH cnt AS (SELECT lang, count(*) AS n FROM d
                         WHERE lang IN ('en','de','fr') GROUP BY lang),
            w(lang, r) AS (VALUES ('en', 2), ('de', 1), ('fr', 1)),
            tot AS (SELECT min(n * 4 // r) AS t FROM cnt JOIN w USING (lang)),
            thr AS (SELECT w.lang, ((tot.t * w.r // 4) * 10000) // cnt.n AS cut
                    FROM w JOIN cnt USING (lang), tot)
            SELECT d.doc_id, d.lang FROM d JOIN thr USING (lang)
            WHERE hash(d.doc_id) % 10000 < thr.cut
        """).df()
        assert sorted(out["doc_id"]) == sorted(ref["doc_id"])
        # proportions approach 2:1:1 (within hash-quantization noise)
        g = out.groupby("lang")["doc_id"].count()
        assert "xx" not in g.index  # unlisted group dropped
        assert abs(g["en"] / g["de"] - 2.0) < 0.15
        assert abs(g["fr"] / g["de"] - 1.0) < 0.15
        # never upsamples: each group bounded by its input count
        src = df.groupby("lang")["doc_id"].count()
        assert all(g[k] <= src[k] for k in g.index)

    def test_stability_and_validation(self):
        import pytest as _pt

        from plugin_debezium_ray.functions.selection import mixture_resample

        df = pd.DataFrame({
            "doc_id": np.arange(1000, dtype=np.int64),
            "lang": ["en" if i % 3 else "de" for i in range(1000)],
        })
        a = mixture_resample(ray.data.from_pandas(df).repartition(2),
                             group_col="lang", ratios={"en": 1, "de": 1}
                             ).to_pandas()
        b = mixture_resample(ray.data.from_pandas(df).repartition(9),
                             group_col="lang", ratios={"en": 1, "de": 1}
                             ).to_pandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # rerun-stable
        with _pt.raises(ValueError, match="positive integers"):
            mixture_resample(ray.data.from_pandas(df), group_col="lang",
                             ratios={"en": 0.5})
        with _pt.raises(ValueError, match="absent"):
            mixture_resample(ray.data.from_pandas(df), group_col="lang",
                             ratios={"en": 1, "zz": 1})
        with _pt.raises(ValueError, match="non-empty"):
            mixture_resample(ray.data.from_pandas(df), group_col="lang",
                             ratios={})


class TestRound5ReviewRegressions:
    """Pins for the round-5 self-review findings."""

    def test_grouped_quantiles_empty_keeps_output_schema(self):
        # the union-seeded (by, q, value) schema must survive an empty
        # result: Dataset.schema() typed, select_columns validates.
        # (`to_pandas()` of ANY 0-row Dataset drops columns in Ray 2.49
        # — a framework-wide quirk, pure typed Arrow sources included —
        # so the contract is pinned at the Dataset level.)
        from plugin_debezium_ray.functions.quantiles import (
            grouped_quantiles_ds,
        )

        empty = ray.data.from_pandas(pd.DataFrame({
            "g": pd.Series([], dtype="int64"),
            "x": pd.Series([], dtype="float64"),
        }))
        out = grouped_quantiles_ds(empty, "x", [0.5], by="g")
        sch = out.schema()
        assert sch is not None and list(sch.names) == ["g", "q", "value"]
        assert out.select_columns(["value"]).count() == 0
        # all values null → groups absent, but schema intact
        allnull = ray.data.from_pandas(pd.DataFrame({
            "g": [1, 2], "x": [None, None],
        }).astype({"x": "float64"}))
        out2 = grouped_quantiles_ds(allnull, "x", [0.5], by="g")
        sch2 = out2.schema()
        assert sch2 is not None and list(sch2.names) == ["g", "q", "value"]
        assert out2.count() == 0

    def test_exact_dedup_keep_cols_requires_id(self):
        from plugin_debezium_ray.functions.dedup import exact_dedup

        ds = ray.data.from_pandas(pd.DataFrame({
            "doc_id": [1], "text": ["x"], "lang": ["en"],
        }))
        with pytest.raises(ValueError, match="keep_cols"):
            exact_dedup(ds, id_col="doc_id", text_col="text",
                        keep_cols=["lang"])

    def test_probe_cache_fifo_bound(self):
        from plugin_debezium_ray.functions import joins

        joins._PROBE_CACHE.clear()
        for i in range(5):
            joins._PROBE_CACHE[("c", str(i), ())] = object()
            while len(joins._PROBE_CACHE) > joins._PROBE_CACHE_MAX:
                joins._PROBE_CACHE.pop(next(iter(joins._PROBE_CACHE)))
        assert len(joins._PROBE_CACHE) <= joins._PROBE_CACHE_MAX
        joins._PROBE_CACHE.clear()
