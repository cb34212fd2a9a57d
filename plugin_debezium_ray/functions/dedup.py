"""Deduplication for large-scale training-data pipelines, Ray-Data-first.

All pipelines follow the scale pattern from the public dedup literature
(MinHash/LSH: Broder '97; SimHash: Charikar '02; winnowing: Schleimer
'03) and the Ray Data groupby idiom:

  map_batches (vectorized signature computation, stateless)
    → explode to (bucket-key, doc) rows
    → ONE groupby on the bucket key (the only shuffle)
    → within-group verification / representative selection
    → small candidate-pair set → connected components

Connected components run driver-side ONLY over the candidate-pair set
(provably small: candidates, not corpus).  Nothing materializes the
corpus on the driver.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# ----------------------------------------------------------- exact dedup


def add_content_hash(t: pa.Table, *, text_col: str = "text",
                     normalize: bool = False) -> pa.Table:
    """sha1 content hash column (optionally lowercase + whitespace-collapsed
    — the normalized variant matches DuckDB
    ``md5(lower(regexp_replace(text,'\\s+',' ','g')))`` modulo hash fn)."""
    vals = t[text_col].to_pylist()
    if normalize:
        ws = re.compile(r"\s+")
        vals = [None if v is None else ws.sub(" ", v.lower()).strip() for v in vals]
    out = [
        None if v is None else hashlib.sha1(v.encode("utf-8")).hexdigest()
        for v in vals
    ]
    return t.append_column("content_hash", pa.array(out, type=pa.string()))


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
) -> "ray.data.Dataset":
    """Keep the min-id representative per distinct content.

    hash in map_batches → groupby(content_hash) → first — the canonical
    hash-partition + per-group-first exact dedup.  Returns the surviving
    rows (original columns)."""
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col=text_col, normalize=normalize),
        batch_format="pyarrow",
    )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    kept = hashed.groupby("content_hash").map_groups(keep_min, batch_format="pandas")
    return kept.drop_columns(["content_hash"])


# ------------------------------------------------------------- minhash


_WORD_RE = re.compile(r"\S+")


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of word k-shingles (k consecutive tokens).

    Vectorized: build the shingle strings once, hash the whole array with
    pandas' fixed-key SipHash (deterministic across processes) instead of
    per-shingle hashlib calls."""
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    shingles = np.array(
        [" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))],
        dtype=object,
    )
    return pd.util.hash_array(shingles)


class MinHasher:
    """Per-batch MinHash signatures: ``num_perm`` hash functions
    h_i(x) = splitmix64(x XOR seed_i) (Broder '97 minwise estimation with
    independent mixing functions instead of modular affine permutations —
    fully vectorized uint64, no Python-object bignum math).  Seeds are
    built ONCE per actor in ``__init__`` (actor pool)."""

    def __init__(self, num_perm: int = 128, k: int = 3, text_col: str = "text",
                 seed: int = 1):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        from plugin_debezium_ray.sources.rand import splitmix64

        x = _shingle_hashes(text, self.k)
        # (num_perm, n_shingles) mixed values — min over shingles
        vals = splitmix64(np.bitwise_xor.outer(self.seeds, x))
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs = [
            None if v is None else self.signature(v)
            for v in t[self.text_col].to_pylist()
        ]
        arr = pa.array(
            [None if s is None else s.tolist() for s in sigs],
            type=pa.list_(pa.uint64()),
        )
        return t.append_column("minhash", arr)


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    seed: int = 1,
    num_partitions: int = 64,
    max_all_pairs_bucket: int = 64,
) -> list[tuple]:
    """Candidate near-dup pairs via LSH banding: signature → ``bands``
    bands of r=num_perm/bands rows → ONE groupby on a coarse partition of
    the band-hash space → **vectorized** within-partition pairing.

    Millions of (band, band_hash) buckets would mean millions of
    ``map_groups`` calls; instead buckets are routed to
    ``num_partitions`` coarse groups and paired with a pandas self-merge
    (all-pairs for buckets ≤ ``max_all_pairs_bucket``; star-to-min-doc
    beyond, which preserves connected-component clustering while keeping
    giant near-identical clusters linear, not quadratic).
    """
    from plugin_debezium_ray.sources.rand import splitmix64

    r = num_perm // bands
    hasher = MinHasher(num_perm=num_perm, k=k, text_col=text_col, seed=seed)

    def explode_bands(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        valid = [i for i, v in enumerate(texts) if v is not None]
        if not valid:
            return pa.table(
                {id_col: pa.array([], t[id_col].type),
                 "band": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int32())}
            )
        sigs = np.stack([hasher.signature(texts[i]) for i in valid])
        sigs = sigs.reshape(len(valid), bands, r)
        # vectorized band hash: xor-fold + mix over the r minhashes
        bh = np.zeros((len(valid), bands), dtype=np.uint64)
        for j in range(r):
            bh = splitmix64(bh ^ sigs[:, :, j])
        bh = splitmix64(bh ^ np.arange(bands, dtype=np.uint64)[None, :])
        out_ids = np.repeat(ids[valid], bands)
        out_band = np.tile(np.arange(bands, dtype=np.int32), len(valid))
        out_bh = bh.reshape(-1)
        return pa.table(
            {
                id_col: pa.array(out_ids),
                "band": pa.array(out_band),
                "band_hash": pa.array(out_bh),
                "part": pa.array((out_bh % np.uint64(num_partitions)).astype(np.int32)),
            }
        )

    exploded = ds.map_batches(explode_bands, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([id_col, "band", "band_hash"])
        sizes = g.groupby(["band", "band_hash"])[id_col].transform("size")
        g2 = g[sizes > 1]
        if g2.empty:
            return pd.DataFrame({"a": [], "b": []})
        small = g2[sizes[g2.index] <= max_all_pairs_bucket]
        parts = []
        if not small.empty:
            m = small.merge(small, on=["band", "band_hash"])
            m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
            parts.append(m[[f"{id_col}_x", f"{id_col}_y"]].rename(
                columns={f"{id_col}_x": "a", f"{id_col}_y": "b"}))
        big = g2[sizes[g2.index] > max_all_pairs_bucket]
        if not big.empty:
            mins = big.groupby(["band", "band_hash"])[id_col].transform("min")
            star = big[big[id_col] != mins]
            parts.append(pd.DataFrame({"a": mins[star.index].to_numpy(),
                                       "b": star[id_col].to_numpy()}))
        out = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
            {"a": [], "b": []})
        return out.drop_duplicates()

    pair_ds = exploded.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )
    pairs = {(row["a"], row["b"]) for row in pair_ds.take_all()}
    return sorted(pairs)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard (the verification step after LSH)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def connected_components_distributed(
    pairs_ds: "ray.data.Dataset",
    *,
    max_iters: int = 20,
) -> "ray.data.Dataset":
    """Connected components over a candidate-pair Dataset that is too big
    for the driver: iterative min-label propagation, one groupby-min per
    round (the standard large-graph CC-on-a-dataflow-engine pattern).

    Input: columns ``a``, ``b`` (edges).  Output: columns ``node``,
    ``root`` (root = min node id of the component).  Converges in
    O(diameter) rounds; near-dup graphs are unions of small cliques, so
    2-3 rounds typically suffice.  Each round's shuffle carries one row
    per (edge endpoint), never the corpus.
    """
    import pyarrow as pa

    def edges_both(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        )

    edges = pairs_ds.map_batches(edges_both, batch_format="pyarrow")

    def min_peer(g: pa.Table) -> pa.Table:
        import pyarrow.compute as apc

        node = g["node"][0]
        lbl = min(apc.min(g["peer"]).as_py(), node.as_py())
        return pa.table({"node": pa.array([node.as_py()], g["node"].type),
                         "root": pa.array([lbl], g["peer"].type)})

    # init: root(n) = min(n, neighbors(n))
    labels = edges.groupby("node").map_groups(min_peer, batch_format="pyarrow")
    node_type = edges.schema().types[0]

    def as_peer_labels(t: pa.Table) -> pa.Table:
        # map_groups emits zero-column empty blocks for empty groups;
        # give them the join-side schema or the hash join chokes
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {"peer_key": pa.array([], node_type),
                 "peer_root": pa.array([], node_type)}
            )
        return t.select(["node", "root"]).rename_columns(
            ["peer_key", "peer_root"]
        )

    prev_sum = None
    for _ in range(max_iters):
        # propagate roots across edges with a distributed hash join; the
        # only driver-side value per round is one scalar (sum of roots —
        # strictly decreasing until convergence)
        peer_labels = labels.map_batches(as_peer_labels, batch_format="pyarrow")
        peer_roots = edges.join(
            peer_labels,
            join_type="inner",
            num_partitions=16,
            on=("peer",),
            right_on=("peer_key",),
        ).map_batches(
            lambda t: (
                t.select(["node", "peer_root"]).rename_columns(["node", "root"])
                if t.num_columns
                else pa.table(
                    {"node": pa.array([], node_type),
                     "root": pa.array([], node_type)}
                )
            ),
            batch_format="pyarrow",
        )
        combined = labels.union(peer_roots)

        def keep_min(g: pa.Table) -> pa.Table:
            import pyarrow.compute as apc

            return pa.table(
                {
                    "node": pa.array([g["node"][0].as_py()], g["node"].type),
                    "root": pa.array(
                        [apc.min(g["root"]).as_py()], g["root"].type
                    ),
                }
            )

        # repartition launders the zero-column empty blocks that the
        # sort-based groupby emits for empty ranges — Ray's hash join
        # rejects schema-less blocks on the build side
        labels = (
            combined.groupby("node")
            .map_groups(keep_min, batch_format="pyarrow")
            .repartition(16)
            .materialize()
        )
        s = labels.sum("root")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def connected_components(pairs: list[tuple], nodes=None) -> dict:
    """Union-find over the (small) candidate-pair set → {node: root}."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes or []:
        find(n)
    return {n: find(n) for n in parent}


def minhash_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dedup: candidates → Jaccard-verify →
    components → drop non-representatives (min id survives).

    Verification needs the candidate docs' texts: fetched via a filtered
    read of ONLY candidate ids (broadcast id set), never the corpus."""
    pairs = minhash_lsh_pairs(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, k=k,
    )
    cand_ids = {x for p in pairs for x in p}
    if cand_ids:
        texts_ds = ds.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t[id_col], value_set=pa.array(list(cand_ids)))
            ).select([id_col, text_col]),
            batch_format="pyarrow",
        )
        texts = {r[id_col]: r[text_col] for r in texts_ds.take_all()}
        verified = [
            (a, b) for a, b in pairs if jaccard(texts[a], texts[b], k) >= threshold
        ]
    else:
        verified = []
    roots = connected_components(verified)
    dupes = {n for n, r in roots.items() if r != n}
    if not dupes:
        return ds
    dupes_arr = pa.array(list(dupes))
    return ds.map_batches(
        lambda t: t.filter(
            pa.compute.invert(pa.compute.is_in(t[id_col], value_set=dupes_arr))
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash (Charikar '02): sign of the feature-hash bit sums.
    Near-dups = small Hamming distance; bucketed by 4×16-bit chunks so
    any pair within distance 3 shares ≥1 chunk (pigeonhole)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in self.word_re.findall(text.lower()):
            h = np.uint64(int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big"))
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        vals = [
            None if v is None else self.simhash(v)
            for v in t[self.text_col].to_pylist()
        ]
        return t.append_column("simhash", pa.array(vals, type=pa.uint64()))


def simhash_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> list[tuple]:
    """Candidate pairs with Hamming(simhash) ≤ max_hamming via 16-bit
    chunk bucketing + within-bucket verify."""
    hasher = SimHasher(text_col=text_col)

    def explode(t: pa.Table) -> pa.Table:
        t = hasher(t)
        ids, chunk_ids, chunk_vals, sims = [], [], [], []
        for i, sh in enumerate(t["simhash"].to_pylist()):
            if sh is None:
                continue
            doc = t[id_col][i].as_py()
            for c in range(4):
                ids.append(doc)
                chunk_ids.append(c)
                chunk_vals.append((sh >> (16 * c)) & 0xFFFF)
                sims.append(sh)
        return pa.table(
            {id_col: ids, "chunk": chunk_ids, "chunk_val": chunk_vals,
             "simhash": pa.array(sims, type=pa.uint64())}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates(id_col).sort_values(id_col)
        ids = rows[id_col].to_numpy()
        shs = rows["simhash"].to_numpy(dtype=np.uint64)
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if bin(int(shs[i]) ^ int(shs[j])).count("1") <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pair_ds = exploded.groupby(["chunk", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return sorted({(r["a"], r["b"]) for r in pair_ds.take_all()})


# ------------------------------------------------- ngram-jaccard dedup


def ngram_jaccard_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
) -> "ray.data.Dataset":
    """n-gram Jaccard dedup = MinHash-LSH candidates + EXACT Jaccard
    verification at a given shingle size (the thorough variant)."""
    return minhash_dedup(
        ds, id_col=id_col, text_col=text_col, threshold=threshold,
        num_perm=num_perm, bands=bands, k=k,
    )


# ------------------------------------------- embedding cosine near-dup


def embedding_dedup_pairs(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 5,
    dim: int | None = None,
) -> list[tuple]:
    """Cosine near-dup candidates via random-hyperplane LSH: per table,
    a sign signature (num_planes bits) → bucket groupby → within-bucket
    exact cosine ≥ threshold.  ``num_tables`` independent tables boost
    recall (prob. a cos-θ pair collides in ≥1 table =
    1-(1-(1-θ/π)^planes)^tables).  One shuffle total: rows explode to
    (table, sig) keys before the single groupby.  Hyperplanes are
    deterministic from the seed, built once per actor."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float32)

    def sig(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pandas().to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        normed = vecs / np.maximum(norms, 1e-12)
        ids_out, tbl_out, sig_out, vec_out = [], [], [], []
        ids = t[id_col].to_pylist()
        vl = t[vec_col].to_pylist()
        for tbl in range(num_tables):
            bits = (normed @ planes[tbl].T) > 0
            sigs = (bits * (1 << np.arange(num_planes))).sum(axis=1)
            ids_out.extend(ids)
            tbl_out.extend([tbl] * len(ids))
            sig_out.extend(sigs.tolist())
            vec_out.extend(vl)
        return pa.table(
            {
                id_col: pa.array(ids_out),
                "table": pa.array(tbl_out, type=pa.int32()),
                "sig": pa.array(sig_out, type=pa.int64()),
                vec_col: pa.array(vec_out, type=t[vec_col].type),
            }
        )

    bucketed = ds.map_batches(sig, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        vecs = np.stack(g[vec_col].to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        normed = vecs / np.maximum(norms, 1e-12)
        sims = normed @ normed.T
        ii, jj = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pair_ds = bucketed.groupby(["table", "sig"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return sorted({(r["a"], r["b"]) for r in pair_ds.take_all()})
