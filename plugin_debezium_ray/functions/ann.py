"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and every ``map_batches`` task computes a numpy matmul
against its batch, emitting only per-batch top-k candidates; a tiny
driver-side merge reduces them to the global top-k (k × num_queries
rows — never the corpus).

Scale path: IVF — deterministic k-means (Lloyd's, fixed seed/iters,
distributed partial-sum updates), then search only the ``nprobe``
nearest centroid partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _stack(col) -> np.ndarray:
    # zero-copy buffer reshape for fixed/equal-length list columns
    from plugin_debezium_ray.functions.dedup import _vectors_of

    return _vectors_of(col, np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BatchTopK:
    """map_batches callable: cosine of batch × broadcast queries → the
    batch's top-k rows per query.  Query matrix fetched from the object
    store once per actor (``ray.get`` in __init__)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 self.id_col: pa.array([], pa.int64()),
                 "score": pa.array([], pa.float32())}
            )
        vecs = _normalize(_stack(t[self.vec_col]))
        ids = t[self.id_col].to_numpy()
        sims = vecs @ self.q.T  # (batch, n_queries)
        k = min(self.k, len(ids))
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, n_queries)
        qn = self.q.shape[0]
        out_q = np.repeat(np.arange(qn, dtype=np.int64), k)
        out_i = ids[top.T.reshape(-1)]
        out_s = sims[top.T.reshape(-1), np.repeat(np.arange(qn), k)]
        return pa.table(
            {"query_id": pa.array(out_q),
             self.id_col: pa.array(out_i),
             "score": pa.array(out_s.astype(np.float32))}
        )


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Global cosine top-k per query row of ``queries``.

    Returns a small DataFrame (num_queries × k rows) with columns
    ``query_id, <id_col>, score, rank`` — ties broken by ascending id
    for determinism."""
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    ref = ray.put(queries)
    cand = ds.map_batches(
        BatchTopK,
        fn_constructor_args=(ref, k, id_col, vec_col),
        batch_format="pyarrow",
        concurrency=(1, 4),  # autoscaling pool: never blocks on small CPU budgets
    )
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    rows = fetch_small_rows(cand)  # ≤ k × n_queries × n_blocks, still small
    by_q: dict[int, list] = {}
    for r in rows:
        # heap on (score, -id): max score wins, ties → smaller id
        heapq.heappush(
            by_q.setdefault(int(r["query_id"]), []),
            (float(r["score"]), -int(r[id_col])),
        )
        if len(by_q[int(r["query_id"])]) > k:
            heapq.heappop(by_q[int(r["query_id"])])
    out = []
    for qid, heap in sorted(by_q.items()):
        ranked = sorted(heap, key=lambda x: (-x[0], -x[1]))
        for rank, (score, neg_id) in enumerate(ranked, 1):
            out.append((qid, -neg_id, score, rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


# ------------------------------------------------------------------ IVF


def kmeans_fit_sample(
    ds: "ray.data.Dataset",
    n_clusters: int,
    *,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 3,
    sample_size: int = 65536,
) -> np.ndarray:
    """Deterministic k-means on a BOUNDED sample, Lloyd's run locally:
    the corpus is scanned once (``limit`` reads only enough blocks), not
    once per iteration — the index-build fit for 10^10-row corpora.
    Sample-based centroids are the standard IVF practice (the quantizer
    needs distributional coverage, not every row)."""
    sample = ds.limit(sample_size).take_all()
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in sample])
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)),
                               replace=False)]
    for _ in range(iters):
        d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for c in range(len(centroids)):
            sel = assign == c
            if sel.any():
                centroids[c] = mat[sel].mean(axis=0)
    return centroids


class IvfIndex:
    """Persisted IVF index over an embedding Dataset.

    Build = ONE bounded-sample k-means fit + ONE assignment pass that
    writes the corpus as cluster-partitioned Parquet
    (``cluster=NNN/…``) plus the centroid matrix — the corpus is
    scanned once at build, never at query time.  Search reads ONLY the
    probed cluster partitions (union of each query's ``nprobe`` nearest
    centroids) and runs the brute-force top-k over that slice.

    Resumable/multi-query: the on-disk layout is the index; repeated
    searches reuse it with zero corpus scans."""

    META = "ivf_meta.json"

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 id_col: str, vec_col: str):
        self.index_dir = index_dir
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        n_clusters: int,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        iters: int = 10,
        seed: int = 3,
    ) -> "IvfIndex":
        import json
        import os

        centroids = kmeans_fit_sample(
            ds, n_clusters, vec_col=vec_col, iters=iters, seed=seed
        )
        cref = ray.put(centroids)

        class Assign:
            def __init__(self, cref):
                self.c = ray.get(cref)

            def __call__(self, t: pa.Table) -> pa.Table:
                vecs = _stack(t[vec_col])
                assign = np.argmin(
                    ((vecs[:, None, :] - self.c[None, :, :]) ** 2).sum(-1),
                    axis=1,
                )
                return t.append_column(
                    "cluster", pa.array(assign.astype(np.int64))
                )

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(
            Assign, fn_constructor_args=(cref,), batch_format="pyarrow",
            concurrency=(1, 8),
        ).write_parquet(index_dir, partition_cols=["cluster"])
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
        with open(os.path.join(index_dir, cls.META), "w") as f:
            json.dump({"n_clusters": int(len(centroids)),
                       "id_col": id_col, "vec_col": vec_col}, f)
        return cls(index_dir, centroids, id_col, vec_col)

    @classmethod
    def load(cls, index_dir: str) -> "IvfIndex":
        import json
        import os

        with open(os.path.join(index_dir, cls.META)) as f:
            meta = json.load(f)
        centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        return cls(index_dir, centroids, meta["id_col"], meta["vec_col"])

    def probe_clusters(self, queries: np.ndarray, nprobe: int) -> list[int]:
        return _nearest_clusters(self.centroids, queries, nprobe)

    def search(
        self, queries: np.ndarray, k: int = 10, *, nprobe: int = 4
    ) -> pd.DataFrame:
        # Ray 2.49's read_parquet accepts one directory or a list of
        # FILES, not a list of directories — glob the partition files
        paths = _partition_paths(
            self.index_dir, self.probe_clusters(queries, nprobe)
        )
        if not paths:  # every probed centroid owns zero corpus rows
            return _empty_topk(self.id_col)
        probed = ray.data.read_parquet(paths)
        return brute_force_topk(
            probed, queries, k, id_col=self.id_col, vec_col=self.vec_col
        )


def kmeans_fit(
    ds: "ray.data.Dataset",
    n_clusters: int,
    *,
    vec_col: str = "embedding",
    iters: int = 5,
    seed: int = 3,
    sample_blocks: int = 1,
) -> np.ndarray:
    """Deterministic distributed Lloyd's: init from a seeded sample, then
    ``iters`` rounds of per-batch partial (sum, count) → driver combine.
    Only (n_clusters × dim) state ever reaches the driver."""
    sample = ds.limit(max(n_clusters * 20, 256)).take_all()
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float32) for r in sample])
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=n_clusters, replace=False)]

    class Partial:
        """Actor-pool stage: centroids fetched ONCE per actor in
        __init__ (state-loaded-once symmetry with the other stages)."""

        def __init__(self, cref):
            self.c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref

        def __call__(self, t: pa.Table) -> pa.Table:
            c = self.c
            vecs = _stack(t[vec_col])
            assign = np.argmin(
                ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1
            )
            sums = np.zeros_like(c)
            counts = np.zeros(len(c), dtype=np.int64)
            np.add.at(sums, assign, vecs)
            np.add.at(counts, assign, 1)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c), dtype=np.int64)),
                    "sum": pa.array(list(sums)),
                    "count": pa.array(counts),
                }
            )

    for _ in range(iters):
        cref = ray.put(centroids)
        from plugin_debezium_ray.smallfetch import fetch_small_rows

        parts = fetch_small_rows(
            ds.map_batches(
                Partial,
                fn_constructor_args=(cref,),
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        )
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in parts:
            sums[int(r["cluster"])] += np.asarray(r["sum"], dtype=np.float32)
            counts[int(r["cluster"])] += int(r["count"])
        nonzero = counts > 0
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
    return centroids


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    *,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """IVF search: restrict the brute-force scan to rows whose nearest
    centroid is among each query's ``nprobe`` closest.  Approximate by
    construction; recall grows with nprobe (== brute force when
    nprobe == n_clusters).

    With ``index_dir`` the persisted-index path is used: build once
    (single corpus pass, cluster-partitioned Parquet) if absent, then
    probe only the matching partitions — repeated queries never rescan
    the corpus.  Without it, falls back to the index-free one-shot scan
    (fit + in-stream assignment filter)."""
    import os

    if index_dir is not None:
        if os.path.exists(os.path.join(index_dir, IvfIndex.META)):
            idx = IvfIndex.load(index_dir)
        else:
            idx = IvfIndex.build(
                ds, index_dir, n_clusters, id_col=id_col, vec_col=vec_col
            )
        return idx.search(queries, k, nprobe=nprobe)

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    if centroids is None:
        centroids = kmeans_fit(ds, n_clusters, vec_col=vec_col)
    cref = ray.put(centroids)
    q_assign = np.argsort(
        ((queries[:, None, :] - centroids[None, :, :]) ** 2).sum(-1), axis=1
    )[:, :nprobe]
    probe_set = sorted({int(c) for row in q_assign for c in row})
    probe_arr = pa.array(probe_set, type=pa.int64())

    def filter_probed(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vecs = _stack(t[vec_col])
        assign = np.argmin(
            ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(-1), axis=1
        )
        keep = pa.compute.is_in(
            pa.array(assign.astype(np.int64)), value_set=probe_arr
        )
        return t.filter(keep)

    probed = ds.map_batches(filter_probed, batch_format="pyarrow")
    return brute_force_topk(probed, queries, k, id_col=id_col, vec_col=vec_col)


# ------------------------------------------------------- quantization


def quantize_embeddings(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Per-vector int8 scalar quantization: ``q = trunc(x · 127 / s)``
    with ``s = max(|x|)`` — the standard 4×-compression step before an
    ANN index ships vectors across a cluster (cosine ranking is
    preserved to ~1% at dim ≥ 64).  Returns
    ``(id, scale, q: list<int8>, q_sum, q_min, q_max)`` — the checksum
    columns make the op SQL-verifiable without comparing list columns.

    trunc (not round) on float64 math: numpy and SQL engines agree on
    trunc bit-for-bit, while round-half-to-even vs half-away would
    diverge on exact .5 products.  Zero vectors quantize to zeros.
    Embarrassingly parallel per-batch map — no shuffle, no state."""

    def quant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], t[id_col].type),
                 "scale": pa.array([], pa.float64()),
                 "q": pa.array([], pa.list_(pa.int8())),
                 "q_sum": pa.array([], pa.int64()),
                 "q_min": pa.array([], pa.int64()),
                 "q_max": pa.array([], pa.int64())}
            )
        from plugin_debezium_ray.functions.dedup import _vectors_of

        vecs = _vectors_of(t[vec_col], np.float64)
        s = np.abs(vecs).max(axis=1)
        safe = np.where(s == 0.0, 1.0, s)
        q = np.trunc(vecs * 127.0 / safe[:, None]).astype(np.int8)
        q[s == 0.0] = 0
        n, dim = q.shape
        q_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(q.reshape(-1)), dim
        ).cast(pa.list_(pa.int8()))
        return pa.table(
            {
                id_col: t[id_col],
                "scale": pa.array(s),
                "q": q_arr,
                "q_sum": pa.array(q.sum(axis=1, dtype=np.int64)),
                "q_min": pa.array(q.min(axis=1).astype(np.int64)),
                "q_max": pa.array(q.max(axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow")


# ------------------------------------------------------------------- PQ


def pq_fit(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_size: int = 65536,
    iters: int = 10,
    seed: int = 5,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search" — public): the dimension
    splits into ``m`` subvectors and each subspace gets its own
    ``k``-centroid k-means, fit on a BOUNDED deterministic sample (the
    same one-scan practice as ``kmeans_fit_sample``).  Vectors are
    L2-normalized BEFORE fitting so the asymmetric inner-product search
    approximates cosine.  Returns ``(m, k, dim//m)`` float32.

    Distances use the matmul identity ``argmin_c ||x−c||² = argmin_c
    (||c||² − 2x·c)`` — never an (n, k, dsub) broadcast tensor."""
    sample = ds.limit(sample_size).take_all()
    mat = _normalize(np.stack([
        np.asarray(r[vec_col], dtype=np.float32) for r in sample
    ]))
    return pq_fit_matrix(mat, m=m, k=k, iters=iters,
                         rng=np.random.default_rng(seed))


def pq_fit_matrix(
    mat: np.ndarray, *, m: int, k: int, iters: int, rng
) -> np.ndarray:
    """The local codebook fit over an already-normalized sample matrix
    — split out so ``IvfPqIndex.build`` can reuse ONE sample for both
    the coarse and the PQ quantizer."""
    n, dim = mat.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float32)
    for s in range(m):
        x = np.ascontiguousarray(mat[:, s * dsub:(s + 1) * dsub])
        kk = min(k, n)
        c = x[rng.choice(n, size=kk, replace=False)].copy()
        for _ in range(iters):
            scores = (c * c).sum(1)[None, :] - 2.0 * (x @ c.T)
            assign = np.argmin(scores, axis=1)
            for j in range(kk):
                sel = assign == j
                if sel.any():
                    c[j] = x[sel].mean(axis=0)
        if kk < k:  # degenerate tiny corpus: pad with repeats
            c = np.concatenate([c, np.repeat(c[:1], k - kk, axis=0)])
        books[s] = c
    return books


def _encode_subspaces(xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectorized per-subspace nearest-centroid codes for a normalized
    (n, dim) matrix — the ONE encode implementation shared by
    ``pq_encode`` and ``IvfPqIndex.build``.  Validates the dimension
    exactly: a dim LARGER than m·dsub would otherwise be silently
    truncated (scores computed from a prefix of every vector)."""
    mm, k, dsub = books.shape
    if xn.shape[1] != mm * dsub:
        raise ValueError(
            f"vector dim {xn.shape[1]} != m*dsub {mm * dsub} of codebooks"
        )
    codes = np.empty((len(xn), mm), dtype=np.uint8)
    for s in range(mm):
        xs = np.ascontiguousarray(xn[:, s * dsub:(s + 1) * dsub])
        c = books[s]
        scores = (c * c).sum(1)[None, :] - 2.0 * (xs @ c.T)
        codes[:, s] = np.argmin(scores, axis=1).astype(np.uint8)
    return codes


def _codes_matrix(col, m: int) -> np.ndarray:
    """Zero-copy (n, m) uint8 view of a fixed_size_binary(m) column —
    one buffer reshape, no per-row Python bytes (the hot ADC path)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = arr.buffers()[1]
    return np.frombuffer(
        buf, dtype=np.uint8, count=len(arr) * m, offset=arr.offset * m
    ).reshape(len(arr), m)


def _nearest_clusters(
    centroids: np.ndarray, queries: np.ndarray, nprobe: int
) -> "list[int]":
    """Union of each query's ``nprobe`` nearest centroids (matmul
    identity) — the ONE probe implementation shared by both persisted
    indexes."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    order = np.argsort(
        (centroids * centroids).sum(1)[None, :] - 2.0 * (q @ centroids.T),
        axis=1,
    )[:, :nprobe]
    return sorted({int(c) for row in order for c in row})


def _partition_paths(index_dir: str, clusters: "list[int]") -> list:
    """Parquet files of the probed ``cluster=N`` partitions.  Clusters
    that received zero corpus rows have no directory and glob to
    nothing — callers must handle an EMPTY list (read_parquet([])
    raises)."""
    import glob
    import os

    return [
        f
        for c in clusters
        for f in sorted(glob.glob(os.path.join(
            index_dir, f"cluster={c}", "*.parquet"
        )))
    ]


def _empty_topk(id_col: str) -> pd.DataFrame:
    return pd.DataFrame({
        "query_id": pd.Series([], dtype=np.int64),
        id_col: pd.Series([], dtype=np.int64),
        "score": pd.Series([], dtype=np.float32),
        "rank": pd.Series([], dtype=np.int64),
    })


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Encode every vector to ``m`` uint8 codes (``dim·4 → m`` bytes —
    32× at dim=64/m=8): per-batch vectorized nearest-centroid per
    subspace against the broadcast codebooks.  Output columns:
    ``(id_col, code: fixed_size_binary(m))``."""
    if codebooks.shape[1] > 256:
        raise ValueError("uint8 codes require k <= 256")
    ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(t: pa.Table) -> pa.Table:
        books = ray.get(ref)  # zero-copy plasma mmap, cached per node
        mm, k, dsub = books.shape
        if t.num_rows == 0:
            return pa.table({
                id_col: t[id_col],
                "code": pa.array([], pa.binary(mm)),
            })
        codes = _encode_subspaces(_normalize(_stack(t[vec_col])), books)
        return pa.table({
            id_col: t[id_col],
            "code": pa.array([bytes(row) for row in codes],
                             pa.binary(mm)),
        })

    return ds.map_batches(encode, batch_format="pyarrow")


class _PqTopK:
    """map_batches callable: asymmetric-distance (ADC) top-k per batch —
    each query precomputes an (m, k) inner-product lookup table against
    the codebooks ONCE per actor; a batch of codes scores via pure
    table gathers + row sums (no float vector ever reloaded)."""

    def __init__(self, payload_ref, topk: int, id_col: str):
        books, queries = ray.get(payload_ref)
        mm, k, dsub = books.shape
        q = _normalize(np.atleast_2d(
            np.asarray(queries, dtype=np.float32)
        ))
        # LUT[qi, s, c] = <q_sub, centroid_c> — row sums give q·x̂
        self.lut = np.einsum(
            "qsd,scd->qsc", q.reshape(len(q), mm, dsub), books,
        ).astype(np.float32)
        self.m = mm
        self.topk = topk
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, qs_out, scores_out = [], [], []
        if t.num_rows:
            codes = _codes_matrix(t["code"], self.m)
            ids = t[self.id_col].to_numpy(zero_copy_only=False)
            cols = np.arange(self.m)
            for qi in range(len(self.lut)):
                s = self.lut[qi][cols, codes].sum(axis=1)
                kk = min(self.topk, len(s))
                part = np.argpartition(-s, kk - 1)[:kk]
                ids_out.append(ids[part])
                scores_out.append(s[part])
                qs_out.append(np.full(kk, qi, dtype=np.int64))
        if not ids_out:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float32()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(qs_out)),
            self.id_col: pa.array(np.concatenate(ids_out)),
            "score": pa.array(np.concatenate(scores_out)),
        })


def pq_topk(
    codes: "ray.data.Dataset",
    codebooks: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    refine: int = 0,
    vectors: "ray.data.Dataset | None" = None,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate cosine top-k over PQ codes: per-block ADC top-k
    (codes never decompress) then a small driver merge — the same
    streaming shape as ``brute_force_topk`` at 1/32nd the bytes
    scanned.  Ties break by ascending id.

    ``refine=R`` (with ``vectors`` = the original id+vector Dataset)
    enables the standard PQ rerank: shortlist ``R·k`` per query via
    ADC, then exactly rescore ONLY the shortlisted ids in one filtered
    scan (broadcast id set; at 10^10 rows the scan decodes vectors for
    the few thousand candidates, not the corpus) — recall approaches
    exact while the full-precision read stays O(R·k·queries)."""
    if refine and vectors is None:
        # fail fast — checking after the corpus-wide ADC scan would
        # burn the whole distributed pass before raising
        raise ValueError("refine > 0 requires the vectors dataset")
    shortlist = k * refine if refine else k
    ref = ray.put((np.ascontiguousarray(codebooks),
                   np.atleast_2d(np.asarray(queries, dtype=np.float32))))
    cand = codes.map_batches(
        _PqTopK,
        fn_constructor_args=(ref, shortlist, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    rows = fetch_small_rows(cand)
    by_q: dict[int, list] = {}
    for r in rows:
        heapq.heappush(
            by_q.setdefault(int(r["query_id"]), []),
            (float(r["score"]), -int(r[id_col])),
        )
        if len(by_q[int(r["query_id"])]) > shortlist:
            heapq.heappop(by_q[int(r["query_id"])])
    if refine:
        import pyarrow.compute as pc

        cand_ids = sorted({-nid for h in by_q.values() for _, nid in h})
        idset = pa.array(cand_ids, type=pa.int64())
        iref = ray.put(idset)

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(pc.fill_null(
                pc.is_in(t[id_col], value_set=ray.get(iref)), False
            ))

        return brute_force_topk(
            vectors.map_batches(keep, batch_format="pyarrow"),
            queries, k, id_col=id_col, vec_col=vec_col,
        )
    out = []
    for qid, heap in sorted(by_q.items()):
        ranked = sorted(heap, key=lambda x: (-x[0], -x[1]))
        for rank, (score, neg_id) in enumerate(ranked, 1):
            out.append((qid, -neg_id, score, rank))
    return pd.DataFrame(out, columns=["query_id", id_col, "score", "rank"])


class IvfPqIndex:
    """IVF-PQ: the billion-scale composition (FAISS-style, Jégou et
    al. 2011) of the two persisted structures above — the corpus
    writes ONCE as cluster-partitioned Parquet of ``(id, code,
    vector)`` where ``code`` is the m-byte PQ code.  A search touches
    (a) only the ``nprobe`` probed cluster PARTITIONS and (b) only the
    ``(id, code)`` COLUMNS for the ADC scan — at 10^10 vectors the hot
    read is nprobe/n_clusters of the corpus at m bytes per row; the
    full-precision vector column is read only by the optional rerank,
    for the probed partitions, filtered to the shortlist ids.

    Encoding is on the raw (normalized) vectors, not IVF residuals —
    simpler, and the rerank recovers the recall residual-encoding
    would buy (documented trade-off)."""

    META = "ivfpq_meta.json"

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 codebooks: np.ndarray, id_col: str, vec_col: str):
        self.index_dir = index_dir
        self.centroids = centroids
        self.codebooks = codebooks
        self.id_col = id_col
        self.vec_col = vec_col

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        index_dir: str,
        n_clusters: int,
        *,
        m: int = 16,
        pq_k: int = 256,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        iters: int = 10,
        seed: int = 3,
    ) -> "IvfPqIndex":
        import json
        import os

        # ONE bounded sample feeds BOTH quantizers (two limit().take_all()
        # scans would read the corpus head twice); the coarse Lloyd uses
        # the same matmul identity as the subspace fits — never an
        # (n, k, d) broadcast tensor
        sample = ds.limit(65536).take_all()
        mat = np.stack([
            np.asarray(r[vec_col], dtype=np.float32) for r in sample
        ])
        rng = np.random.default_rng(seed)
        centroids = mat[rng.choice(
            len(mat), size=min(n_clusters, len(mat)), replace=False
        )].copy()
        for _ in range(iters):
            assign = np.argmin(
                (centroids * centroids).sum(1)[None, :]
                - 2.0 * (mat @ centroids.T), axis=1,
            )
            for j in range(len(centroids)):
                sel = assign == j
                if sel.any():
                    centroids[j] = mat[sel].mean(axis=0)
        books = pq_fit_matrix(
            _normalize(mat), m=m, k=pq_k, iters=iters,
            rng=np.random.default_rng(seed + 1),
        )
        ref = ray.put((np.ascontiguousarray(centroids),
                       np.ascontiguousarray(books)))

        def assign_encode(t: pa.Table) -> pa.Table:
            c, b = ray.get(ref)  # zero-copy plasma, cached per node
            mm = b.shape[0]
            if t.num_rows == 0:
                return pa.table({
                    id_col: t[id_col],
                    "code": pa.array([], pa.binary(mm)),
                    vec_col: t[vec_col],
                    "cluster": pa.array([], pa.int64()),
                })
            x = _stack(t[vec_col])
            # matmul identity — never an (n, k, d) broadcast tensor
            assign = np.argmin(
                (c * c).sum(1)[None, :] - 2.0 * (x @ c.T), axis=1
            ).astype(np.int64)
            codes = _encode_subspaces(_normalize(x), b)
            return pa.table({
                id_col: t[id_col],
                "code": pa.array([bytes(r) for r in codes], pa.binary(mm)),
                vec_col: t[vec_col],
                "cluster": pa.array(assign),
            })

        os.makedirs(index_dir, exist_ok=True)
        ds.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
            index_dir, partition_cols=["cluster"]
        )
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
        np.save(os.path.join(index_dir, "codebooks.npy"), books)
        with open(os.path.join(index_dir, cls.META), "w") as f:
            json.dump({"n_clusters": int(len(centroids)), "m": int(m),
                       "pq_k": int(pq_k), "id_col": id_col,
                       "vec_col": vec_col}, f)
        return cls(index_dir, centroids, books, id_col, vec_col)

    @classmethod
    def load(cls, index_dir: str) -> "IvfPqIndex":
        import json
        import os

        with open(os.path.join(index_dir, cls.META)) as f:
            meta = json.load(f)
        return cls(
            index_dir,
            np.load(os.path.join(index_dir, "centroids.npy")),
            np.load(os.path.join(index_dir, "codebooks.npy")),
            meta["id_col"], meta["vec_col"],
        )

    def _probed_paths(self, queries: np.ndarray, nprobe: int) -> list:
        return _partition_paths(
            self.index_dir,
            _nearest_clusters(self.centroids, queries, nprobe),
        )

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        *,
        nprobe: int = 4,
        refine: int = 0,
    ) -> pd.DataFrame:
        paths = self._probed_paths(queries, nprobe)
        if not paths:  # every probed centroid owns zero corpus rows
            return _empty_topk(self.id_col)
        codes = ray.data.read_parquet(
            paths, columns=[self.id_col, "code"]  # m bytes/row scanned
        )
        vectors = (
            ray.data.read_parquet(
                paths, columns=[self.id_col, self.vec_col]
            ) if refine else None
        )
        return pq_topk(
            codes, self.codebooks, queries, k,
            id_col=self.id_col, refine=refine, vectors=vectors,
            vec_col=self.vec_col,
        )
