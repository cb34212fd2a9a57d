"""Deduplication for large-scale training-data pipelines, Ray-Data-first.

All pipelines follow the scale pattern from the public dedup literature
(MinHash/LSH: Broder '97; SimHash: Charikar '02; winnowing: Schleimer
'03) and the Ray Data groupby idiom:

  map_batches (vectorized signature computation, stateless)
    → explode to (bucket-key, doc) rows
    → ONE groupby on a COARSE partition of the bucket-key space
      (millions of tiny buckets would mean millions of map_groups
      calls; a coarse partition keeps group count = num_partitions)
    → vectorized within-partition candidate pairing (capped per bucket)
    → distributed verification (pairs ⋈ payload, twice) → edge Dataset
    → distributed connected components (groupby-min label propagation)
    → drop duplicates via a left_anti join

End-to-end distributed: no stage materializes the corpus, the pair set,
or the component labels on the driver — candidate pairs, verified
edges and labels all stay Datasets.  The only driver-side values are
O(1) scalars (convergence checks, empty-set guards).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data



def _join_parts(requested: int) -> int:
    """Hash-join partition count bounded by the session's CPU budget:
    each join partition is a long-lived aggregator actor (1 CPU), so
    requesting more partitions than free CPUs deadlocks a small local
    session.  On a real cluster ``requested`` wins."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 — uninitialised session
        cpus = 4
    return max(2, min(requested, cpus - 2))

# ----------------------------------------------------------- exact dedup


def add_content_hash(t: pa.Table, *, text_col: str = "text",
                     normalize: bool = False) -> pa.Table:
    """Two-lane 128-bit content hash columns (``_h0``, ``_h1``) — fully
    vectorized (Arrow normalization kernels + keyed SipHash per lane; a
    single 64-bit lane would risk birthday collisions at 10^10 docs).
    The normalized variant lowercases and collapses whitespace, matching
    DuckDB ``trim(regexp_replace(lower(text),'\\s+',' ','g'))`` grouping."""
    col = t[text_col]
    if normalize:
        col = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(col), r"\s+", " ")
        )
    obj = (
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    ).to_numpy(zero_copy_only=False)
    h0 = pd.util.hash_array(obj, hash_key="content-hash-l0-")
    h1 = pd.util.hash_array(obj, hash_key="content-hash-l1-")
    out = t.append_column("_h0", pa.array(h0))
    return out.append_column("_h1", pa.array(h1))


def exact_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
    num_partitions: int = 64,
    keep_cols: "list[str] | None" = None,
) -> "ray.data.Dataset":
    """Keep the min-id representative per distinct content.

    hash in map_batches → ONE groupby on a coarse partition of the hash
    space → vectorized pandas idxmin per content hash within each
    partition.  One shuffle, no per-document groups (group count =
    ``num_partitions``, each holding |corpus|/P rows — the scale-safe
    replacement for the one-pandas-frame-per-distinct-hash idiom).
    Returns the surviving rows (original columns — or only
    ``keep_cols`` when given: pass it whenever the caller doesn't need
    the text back, so the corpus BYTES never ride the shuffle — only
    the 128-bit hashes and the kept columns do.  At 100 TB that is the
    difference between shuffling hashes and shuffling the corpus)."""

    if keep_cols is not None and id_col not in keep_cols:
        # fail fast: the winner pick needs id_col; omitting it would
        # otherwise surface as an opaque KeyError inside a Ray task
        # after the full hash + shuffle already ran
        raise ValueError(
            f"keep_cols must include id_col {id_col!r}, got {keep_cols}"
        )

    def hashed(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col=text_col, normalize=normalize)
        if keep_cols is not None:
            t = t.select(list(keep_cols) + ["_h0", "_h1"])
        part = (t["_h0"].to_numpy() % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby(["_h0", "_h1"], sort=False)[id_col].idxmin()
        return g.loc[win.to_numpy()].drop(columns=["_h0", "_h1", "_part"])

    return (
        ds.map_batches(hashed, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(keep_min, batch_format="pandas")
    )


# ------------------------------------------------------------- minhash


_WORD_RE = re.compile(r"\S+")


def _batch_shingles(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """All docs' k-shingle hashes in ONE ``pd.util.hash_array`` call.

    Returns (hashes, offsets): doc i's shingle hashes are
    ``hashes[offsets[i]:offsets[i+1]]`` (every doc emits ≥1 shingle)."""
    all_shingles: list[str] = []
    offsets = np.empty(len(texts) + 1, dtype=np.int64)
    offsets[0] = 0
    for d, text in enumerate(texts):
        toks = _WORD_RE.findall(text.lower())
        if len(toks) < k:
            toks = toks + [""] * (k - len(toks))
        n = max(1, len(toks) - k + 1)
        all_shingles.extend(" ".join(toks[i : i + k]) for i in range(n))
        offsets[d + 1] = len(all_shingles)
    hashes = pd.util.hash_array(np.array(all_shingles, dtype=object))
    return hashes, offsets


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hashes of one doc's word k-shingles (the single-doc view of
    ``_batch_shingles`` — identical values)."""
    h, _ = _batch_shingles([text], k)
    return h


class MinHasher:
    """Batched MinHash signatures: ``num_perm`` hash functions
    h_i(x) = splitmix64(x XOR seed_i) (Broder '97 minwise estimation with
    independent mixing functions instead of modular affine permutations —
    fully vectorized uint64, no Python-object bignum math).  Seeds are
    built ONCE per actor in ``__init__`` (actor pool); the per-batch work
    is one shingle-hash pass + one (num_perm × n_shingles) min-reduce
    per chunk of docs."""

    # bound the (num_perm × n_shingles) mixing matrix per chunk (~100 MB
    # at 128 perms) so giant batches of long docs can't blow the heap
    MAX_CHUNK_SHINGLES = 100_000

    def __init__(self, num_perm: int = 128, k: int = 3, text_col: str = "text",
                 seed: int = 1):
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, vectorized across docs:
        one hash_array call for all shingles, one outer mix per chunk,
        ``np.minimum.reduceat`` over doc boundaries."""
        hashes, offsets = _batch_shingles(texts, self.k)
        return self.signatures_from_shingles(hashes, offsets)

    def signatures_from_shingles(
        self, hashes: np.ndarray, offsets: np.ndarray
    ) -> np.ndarray:
        """Signatures from an already-computed shingle-hash pass (lets a
        caller that shingled the batch for exact verification reuse the
        pass for the estimated-Jaccard prefilter — no double regex)."""
        from plugin_debezium_ray.sources.rand import splitmix64

        n_docs = len(offsets) - 1
        out = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        d0 = 0
        while d0 < n_docs:
            d1 = d0
            while (
                d1 < n_docs
                and offsets[d1 + 1] - offsets[d0] <= self.MAX_CHUNK_SHINGLES
            ):
                d1 += 1
            d1 = max(d1, d0 + 1)  # a single over-long doc still processes
            chunk = hashes[offsets[d0] : offsets[d1]]
            vals = splitmix64(np.bitwise_xor.outer(self.seeds, chunk))
            cuts = (offsets[d0 : d1] - offsets[d0]).astype(np.int64)
            out[d0:d1] = np.minimum.reduceat(vals, cuts, axis=1).T
            d0 = d1
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        valid = [i for i, v in enumerate(texts) if v is not None]
        sigs: list = [None] * len(texts)
        if valid:
            mat = self.signatures([texts[i] for i in valid])
            for j, i in enumerate(valid):
                sigs[i] = mat[j].tolist()
        arr = pa.array(sigs, type=pa.list_(pa.uint64()))
        return t.append_column("minhash", arr)


def minhash_lsh_pairs_ds(
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
    distinct: bool = True,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs via LSH banding, as a Dataset (a, b).

    signature → ``bands`` bands of r=num_perm/bands rows → ONE groupby on
    a coarse partition of the band-hash space → **vectorized**
    within-partition pairing (all-pairs for buckets ≤
    ``max_all_pairs_bucket``; star-to-min-doc beyond, which preserves
    connected-component clustering while keeping giant near-identical
    clusters linear, not quadratic) → distinct (a, b).

    Nothing reaches the driver: the pair set stays distributed."""
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
        sigs = hasher.signatures([texts[i] for i in valid])
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
    if not distinct:
        # caller dedups (e.g. a driver-side set over a bounded pair
        # list) — skip the extra distinct shuffle
        return pair_ds
    return distinct_pairs(pair_ds, num_partitions=num_partitions)


def distinct_pairs(
    pair_ds: "ray.data.Dataset", *, num_partitions: int = 16
) -> "ray.data.Dataset":
    """Distributed distinct on (a, b): ONE coarse-partition sort shuffle
    + vectorized in-partition drop_duplicates (pairs emitted by several
    bands/buckets collapse to one edge).  A ``groupby().aggregate`` here
    would spin up a hash-aggregator actor pool per call — measured 12 s
    of pure startup latency on an 88k-row pair set."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["a", "b"]], index=False)
        df = df.copy()
        df["_part"] = (h % np.uint64(num_partitions)).astype(np.int32)
        return df

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns=["_part"])

    return (
        pair_ds.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(dedup_part, batch_format="pandas")
        # launder schema-less empty blocks out of the sort-based groupby
        # (they poison a downstream hash join — Ray 2.49 behavior)
        .repartition(min(num_partitions, 16))
    )


def minhash_lsh_pairs(ds: "ray.data.Dataset", **kw) -> list[tuple]:
    """Small-scale convenience: the candidate pairs as a sorted list
    (tests / notebooks — NOT the 100-TB path; use ``minhash_lsh_pairs_ds``
    and keep the pair set distributed)."""
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    return sorted(
        (r["a"], r["b"]) for r in fetch_small_rows(minhash_lsh_pairs_ds(ds, **kw))
    )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact k-shingle Jaccard (the verification step after LSH)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def verify_jaccard_pairs(
    pair_ds: "ray.data.Dataset",
    docs_ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 16,
    prefilter_perms: int = 32,
    prefilter_margin: float | None = None,
    prefilter_min_pair_ratio: float = 8.0,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate pairs, fully distributed:
    two hash joins attach the texts (pairs ⋈ docs on a, then on b — each
    text ships once per candidate edge, never the corpus), then a
    vectorized per-batch verify (one shingle-hash pass over the batch's
    distinct texts).  Returns the surviving edges (a, b).

    Exact verification runs on sorted unique uint64 shingle arrays via
    ``np.intersect1d`` (C merge) — no Python set objects.  On
    PAIR-DENSE batches (≥ ``prefilter_min_pair_ratio`` candidate pairs
    per distinct text — hot near-dup clusters where pairs ≫ docs) an
    **estimated-Jaccard prefilter** (Broder '97: the fraction of
    agreeing minhash components estimates J) runs first as ONE matrix
    compare, dropping candidates whose estimate falls below
    ``threshold - margin`` before they pay the exact intersection.  The
    ratio gate matters: signatures cost ``perms × shingles`` per
    distinct text, so on pair-sparse batches (the common LSH output,
    where most candidates are true dups) the prefilter is pure overhead
    — measured 40 s with an unconditional 128-perm prefilter vs 23.5 s
    without on a 50k-doc corpus.  ``prefilter_margin`` defaults to 4σ
    of the estimator (σ = sqrt(t(1-t)/perms); 0.28 at 32 perms,
    t=0.8), making a false drop of a true ≥threshold pair ~1e-5 — and
    signatures are deterministic (fixed seed), so results are
    reproducible run-to-run."""
    prefilter = MinHasher(num_perm=prefilter_perms, k=k)
    if prefilter_margin is None:
        prefilter_margin = 4.0 * float(
            np.sqrt(threshold * (1.0 - threshold) / prefilter_perms)
        )
    parts = _join_parts(num_partitions)

    def side(name: str) -> "ray.data.Dataset":
        return docs_ds.map_batches(
            lambda t, name=name: pa.table(
                {name: t[id_col].combine_chunks(),
                 f"_text_{name}": t[text_col].combine_chunks()}
            ),
            batch_format="pyarrow",
        ).repartition(parts)

    joined = pair_ds.join(
        side("a"), "inner", parts, on=("a",)
    ).join(side("b"), "inner", parts, on=("b",))

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"a": t["a"], "b": t["b"]}) if t.num_columns else t
        ta = t["_text_a"].to_pylist()
        tb = t["_text_b"].to_pylist()
        uniq = list({x for x in ta + tb if x is not None})
        hashes, offsets = _batch_shingles(uniq, k)
        # per-doc sorted unique shingle arrays: exact set ops stay in C
        usets = [
            np.unique(hashes[offsets[i] : offsets[i + 1]])
            for i in range(len(uniq))
        ]
        index = {x: i for i, x in enumerate(uniq)}
        ia = np.array([index.get(x, -1) for x in ta], dtype=np.int64)
        ib = np.array([index.get(y, -1) for y in tb], dtype=np.int64)
        valid = (ia >= 0) & (ib >= 0)
        keep = np.zeros(len(t), dtype=bool)
        cand = np.where(valid)[0]
        if cand.size >= prefilter_min_pair_ratio * max(len(uniq), 1):
            # pair-dense batch: estimated Jaccard from minhash agreement,
            # one vectorized (pairs × perms) compare — reuses the shingle
            # pass, and each text's signature amortizes over ≥ratio pairs
            sigs = prefilter.signatures_from_shingles(hashes, offsets)
            est = (sigs[ia[cand]] == sigs[ib[cand]]).mean(axis=1)
            cand = cand[est >= threshold - prefilter_margin]
        for i in cand:
            ua, ub = usets[ia[i]], usets[ib[i]]
            ni = np.intersect1d(ua, ub, assume_unique=True).size
            union = ua.size + ub.size - ni
            keep[i] = (1.0 if union == 0 else ni / union) >= threshold
        return t.select(["a", "b"]).filter(pa.array(keep))

    return joined.map_batches(verify, batch_format="pyarrow")


def connected_components_distributed(
    pairs_ds: "ray.data.Dataset",
    *,
    max_iters: int = 20,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Connected components over a candidate-pair Dataset that is too big
    for the driver: iterative min-label propagation, one built-in
    ``groupby().aggregate(Min)`` per round (the standard
    CC-on-a-dataflow-engine pattern — no per-node pandas groups).

    Input: columns ``a``, ``b`` (edges).  Output: columns ``node``,
    ``root`` (root = min node id of the component).  Converges in
    O(diameter) rounds; near-dup graphs are unions of small cliques, so
    2-3 rounds typically suffice.  Each round's shuffle carries one row
    per (edge endpoint), never the corpus; the only driver value per
    round is one scalar (sum of labels, strictly decreasing until
    convergence)."""
    num_partitions = _join_parts(num_partitions)

    def _min_root(ds_in: "ray.data.Dataset", node_col: str,
                  val_col: str) -> "ray.data.Dataset":
        """min(val) per node via ONE coarse-partition sort shuffle +
        vectorized in-partition pandas groupby-min (a built-in
        ``aggregate(Min)`` pays a hash-aggregator actor-pool startup per
        ROUND of the loop — the dominant cost at small edge counts)."""

        def add_part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_part"] = (
                pd.util.hash_array(df[node_col].to_numpy())
                % np.uint64(num_partitions)
            ).astype(np.int32)
            return df

        def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(node_col, sort=False, as_index=False)[
                val_col
            ].min()

        return (
            ds_in.map_batches(add_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(reduce_part, batch_format="pandas")
            .repartition(num_partitions)
        )

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
    edges = edges.repartition(num_partitions).materialize()

    def clamp_self(t: pa.Table) -> pa.Table:
        # root(n) = min(root, n): the label can never exceed the node
        return pa.table(
            {
                "node": t["node"].combine_chunks(),
                "root": pc.min_element_wise(
                    t["root"].combine_chunks(), t["node"].combine_chunks()
                ),
            }
        )

    labels = (
        _min_root(
            edges.map_batches(
                lambda t: t.rename_columns(["node", "root"]),
                batch_format="pyarrow",
            ),
            "node",
            "root",
        )
        .map_batches(clamp_self, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )

    prev_sum = None
    for _ in range(max_iters):
        peer_labels = labels.map_batches(
            lambda t: t.rename_columns(["peer_key", "peer_root"]),
            batch_format="pyarrow",
        ).repartition(num_partitions)
        peer_roots = edges.join(
            peer_labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("peer",),
            right_on=("peer_key",),
        ).map_batches(
            lambda t: pa.table(
                {"node": t["node"].combine_chunks(),
                 "root": t["peer_root"].combine_chunks()}
            ),
            batch_format="pyarrow",
        )
        labels = (
            _min_root(labels.union(peer_roots), "node", "root")
            .materialize()
        )
        s = labels.sum("root")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


def connected_components(pairs: list[tuple], nodes=None) -> dict:
    """Union-find over a SMALL in-memory pair list → {node: root}
    (tests / oracle cross-check; the distributed path is
    ``connected_components_distributed``)."""
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


def drop_duplicate_ids(
    ds: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Remove non-representative rows (node != root) via a distributed
    LEFT ANTI join — the dupe set never reaches the driver."""
    parts = _join_parts(num_partitions)
    dupes = labels.filter(expr="node != root").map_batches(
        lambda t: pa.table({"_dupe_id": t["node"].combine_chunks()}),
        batch_format="pyarrow",
    ).repartition(parts)
    return ds.join(
        dupes,
        join_type="left_anti",
        num_partitions=parts,
        on=(id_col,),
        right_on=("_dupe_id",),
    )


def select_representatives(
    ds: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    quality_col: str,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Quality-aware alternative to ``drop_duplicate_ids``: within each
    duplicate component keep the member with the HIGHEST
    ``quality_col`` (tie → min id) — real pipelines keep the best copy,
    not the lowest-numbered one.  Rows outside any component always
    survive.  Null quality sorts worst.

    Distributed shape: one hash join attaches quality to the component
    members (the members set is bounded by the duplicate population,
    never the corpus), ONE coarse-partition groupby picks each
    component's winner, one join + LEFT ANTI drops the losers.  Nothing
    reaches the driver."""
    parts = _join_parts(num_partitions)

    def qcols(t: pa.Table) -> pa.Table:
        return pa.table(
            {"_qid": t[id_col].combine_chunks(),
             "_q": pc.cast(t[quality_col], pa.float64()).combine_chunks()}
        )

    qds = ds.map_batches(qcols, batch_format="pyarrow").repartition(parts)
    # materialized: bounded by the duplicate population; two consumers
    # below would otherwise re-run the corpus-side join twice
    members = labels.repartition(parts).join(
        qds, join_type="inner", num_partitions=parts,
        on=("node",), right_on=("_qid",),
    ).materialize()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_part"] = (
            pd.util.hash_array(df["root"].to_numpy()) % np.uint64(parts)
        ).astype(np.int32)
        return df

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.sort_values(
            ["_q", "node"], ascending=[False, True], kind="stable"
        )
        w = g2.drop_duplicates("root")
        return w[["root", "node"]].rename(columns={"node": "_winner"})

    winners = (
        members.map_batches(add_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(pick, batch_format="pandas")
        .repartition(parts)
    )
    losers = (
        members.join(
            winners, join_type="inner", num_partitions=parts, on=("root",)
        )
        .filter(expr="node != _winner")
        .map_batches(
            lambda t: pa.table({"_dupe_id": t["node"].combine_chunks()}),
            batch_format="pyarrow",
        )
        .repartition(parts)
    )
    return ds.join(
        losers,
        join_type="left_anti",
        num_partitions=parts,
        on=(id_col,),
        right_on=("_dupe_id",),
    )


def minhash_dedup(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    k: int = 3,
    num_partitions: int = 16,
    small_path_max_pairs: int = 20_000,
    quality_col: str | None = None,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dedup: LSH candidate pairs (Dataset) →
    exact-Jaccard verify → connected components → drop
    non-representatives (min id survives; pass ``quality_col`` to keep
    each component's HIGHEST-quality member instead, tie → min id).

    Two tails, switched on the MEASURED candidate-pair count (one driver
    scalar), never on guesswork:

    - pair count ≤ ``small_path_max_pairs``: the pair set is provably
      small → verify/union-find on the driver over ONLY the candidate
      rows (a bounded broadcast — the classic small-side shortcut).
    - above the bound (the 100-TB case): fully distributed — two hash
      joins attach texts to pairs, groupby-min label propagation for
      components, LEFT ANTI join drops dupes.  Nothing corpus- or
      pair-set-sized ever reaches the driver (``small_path_max_pairs=0``
      forces this path; the no-materialization pytest runs it with
      ``take_all`` poisoned)."""
    pairs = minhash_lsh_pairs_ds(
        ds, id_col=id_col, text_col=text_col, num_perm=num_perm,
        bands=bands, k=k, distinct=False,
        num_partitions=max(num_partitions, 4) * 4,
    ).materialize()
    n_pairs = pairs.count()  # O(1) driver scalar (upper bound: pre-distinct)
    if n_pairs == 0:
        return ds

    if n_pairs <= small_path_max_pairs:
        from plugin_debezium_ray.smallfetch import fetch_small_table

        pt = fetch_small_table(pairs)  # ≤ bound (one parallel block fetch)
        plist = sorted(set(zip(pt["a"].to_pylist(), pt["b"].to_pylist())))
        cand_ids = {x for p in plist for x in p}
        id_arr = pa.array(list(cand_ids))
        fetch_cols = [id_col, text_col] + (
            [quality_col] if quality_col else []
        )
        texts_ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t[id_col], value_set=id_arr))
            .select(fetch_cols),
            batch_format="pyarrow",
        )
        tt = fetch_small_table(texts_ds)  # ≤ 2·bound
        texts = dict(zip(tt[id_col].to_pylist(), tt[text_col].to_pylist()))
        verified = [
            (a, b) for a, b in plist
            if jaccard(texts[a], texts[b], k) >= threshold
        ]
        roots = connected_components(verified)
        if quality_col is None:
            dupes = {n for n, r in roots.items() if r != n}
        else:
            qual = dict(zip(tt[id_col].to_pylist(),
                            tt[quality_col].to_pylist()))

            def qkey(n):
                # max quality, tie → min id; null AND NaN quality sort
                # worst (NaN would poison min()'s comparisons and make
                # the winner order-dependent)
                q = qual.get(n)
                q = float("-inf") if q is None or q != q else float(q)
                return (-q, n)

            comp: dict = {}
            for n, r in roots.items():
                comp.setdefault(r, []).append(n)
            winners = {min(ns, key=qkey) for ns in comp.values()}
            dupes = {n for n in roots if n not in winners}
        if not dupes:
            return ds
        dupes_arr = pa.array(list(dupes))
        return ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t[id_col], value_set=dupes_arr))
            ),
            batch_format="pyarrow",
        )

    verified = verify_jaccard_pairs(
        distinct_pairs(pairs, num_partitions=num_partitions), ds,
        id_col=id_col, text_col=text_col, k=k,
        threshold=threshold, num_partitions=num_partitions,
    ).materialize()
    if verified.count() == 0:
        return ds
    labels = connected_components_distributed(
        verified, num_partitions=num_partitions
    )
    if quality_col is not None:
        return select_representatives(
            ds, labels, id_col=id_col, quality_col=quality_col,
            num_partitions=num_partitions,
        )
    return drop_duplicate_ids(
        ds, labels, id_col=id_col, num_partitions=num_partitions
    )


# -------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash (Charikar '02): sign of the feature-hash bit sums.
    Near-dups = small Hamming distance; bucketed by 4×16-bit chunks so
    any pair within distance 3 shares ≥1 chunk (pigeonhole).

    Vectorized across the batch: ONE ``pd.util.hash_array`` call over all
    docs' words, bit expansion + ``np.add.reduceat`` over doc boundaries
    — no per-word hashlib calls.  The (words × 64) int32 bit matrix is
    processed in chunks of ≤ ``MAX_CHUNK_WORDS`` words (same guard as
    ``MinHasher.MAX_CHUNK_SHINGLES``), so a 131k-row batch of 1k-word
    docs peaks at ~100 MB instead of ~33 GB; a single doc longer than
    the bound is itself sub-chunked (the ±1 bit sums are additive)."""

    # bound the (words × 64) int32 bit/contrib matrices per chunk
    # (~100 MB at 200k words) regardless of doc length × batch size
    MAX_CHUNK_WORDS = 200_000

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = _WORD_RE
        self.shifts = np.arange(64, dtype=np.uint64)

    def _bit_sums(self, h: np.ndarray) -> np.ndarray:
        """(len(h), 64) ±1 contributions of each word hash's bits."""
        bits = ((h[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(
            np.int32
        )
        return 2 * bits - 1  # ±1 per bit

    def simhash_batch(self, texts: list[str]) -> np.ndarray:
        words: list[str] = []
        offsets = np.empty(len(texts) + 1, dtype=np.int64)
        offsets[0] = 0
        for d, text in enumerate(texts):
            toks = self.word_re.findall(text.lower())
            if not toks:
                toks = [""]
            words.extend(toks)
            offsets[d + 1] = len(words)
        h = pd.util.hash_array(np.array(words, dtype=object))
        out = np.empty(len(texts), dtype=np.uint64)
        cap = self.MAX_CHUNK_WORDS
        d0 = 0
        while d0 < len(texts):
            d1 = d0
            while d1 < len(texts) and offsets[d1 + 1] - offsets[d0] <= cap:
                d1 += 1
            if d1 == d0:
                # one doc alone exceeds the cap: accumulate its 64 bit
                # sums over word sub-chunks (sums are additive)
                total = np.zeros(64, dtype=np.int64)
                for s in range(int(offsets[d0]), int(offsets[d0 + 1]), cap):
                    e = min(s + cap, int(offsets[d0 + 1]))
                    total += self._bit_sums(h[s:e]).sum(axis=0, dtype=np.int64)
                sh = (total > 0).astype(np.uint64)
                out[d0] = (sh << self.shifts).sum(dtype=np.uint64)
                d0 += 1
                continue
            contrib = self._bit_sums(h[offsets[d0] : offsets[d1]])
            cuts = (offsets[d0:d1] - offsets[d0]).astype(np.int64)
            sums = np.add.reduceat(contrib, cuts, axis=0)
            sh = (sums > 0).astype(np.uint64)
            out[d0:d1] = (sh << self.shifts[None, :]).sum(axis=1, dtype=np.uint64)
            d0 = d1
        return out

    def simhash(self, text: str) -> int:
        return int(self.simhash_batch([text])[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        valid = [i for i, v in enumerate(texts) if v is not None]
        vals: list = [None] * len(texts)
        if valid:
            mat = self.simhash_batch([texts[i] for i in valid])
            for j, i in enumerate(valid):
                vals[i] = int(mat[j])
        return t.append_column("simhash", pa.array(vals, type=pa.uint64()))


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_matrix(shs: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances of uint64 simhashes, vectorized
    (XOR outer product + byte-LUT popcount — no Python bit loops)."""
    x = np.bitwise_xor.outer(shs, shs)
    return (
        _POP8[x.view(np.uint8)]
        .reshape(len(shs), len(shs), 8)
        .sum(axis=2, dtype=np.int32)
    )


def simhash_pairs_ds(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_partitions: int = 64,
    max_all_pairs_bucket: int = 256,
) -> "ray.data.Dataset":
    """Candidate pairs with Hamming(simhash) ≤ max_hamming via 16-bit
    chunk bucketing, as a Dataset (a, b).

    One groupby on a coarse partition of the (chunk, chunk_val) space;
    within each partition, per-bucket pairing is a vectorized XOR-outer
    + popcount matrix for buckets ≤ ``max_all_pairs_bucket`` and a
    star-to-min-doc cap beyond (hot chunk values — e.g. masses of short
    docs sharing a 16-bit chunk — stay linear, mirroring the minhash
    guard)."""
    hasher = SimHasher(text_col=text_col)

    def explode(t: pa.Table) -> pa.Table:
        t = hasher(t)
        sh = t["simhash"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        valid = np.array([s is not None for s in sh])
        if not valid.any():
            return pa.table(
                {id_col: pa.array([], t[id_col].type),
                 "chunk": pa.array([], pa.int32()),
                 "chunk_val": pa.array([], pa.int64()),
                 "simhash": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int32())}
            )
        sh = sh[valid].astype(np.uint64)
        ids = ids[valid]
        n = len(sh)
        chunks = np.tile(np.arange(4, dtype=np.int32), n)
        vals = (
            (sh[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64)))
            & np.uint64(0xFFFF)
        ).astype(np.int64).reshape(-1)
        part = (
            pd.util.hash_array(vals * 4 + chunks) % np.uint64(num_partitions)
        ).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "chunk": pa.array(chunks),
                "chunk_val": pa.array(vals),
                "simhash": pa.array(np.repeat(sh, 4)),
                "part": pa.array(part),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, bucket in g.groupby(["chunk", "chunk_val"], sort=False):
            rows = bucket.drop_duplicates(id_col).sort_values(id_col)
            if len(rows) < 2:
                continue
            ids = rows[id_col].to_numpy()
            shs = rows["simhash"].to_numpy().astype(np.uint64)
            if len(ids) > max_all_pairs_bucket:
                # star cap: verify only against the min-id doc
                x = np.bitwise_xor(shs, shs[0])
                dist = _POP8[x.view(np.uint8)].reshape(len(shs), 8).sum(
                    axis=1, dtype=np.int32
                )
                sel = (dist <= max_hamming) & (ids != ids[0])
                out_a.extend(np.full(sel.sum(), ids[0]))
                out_b.extend(ids[sel])
                continue
            dm = _hamming_matrix(shs)
            ii, jj = np.where(np.triu(dm <= max_hamming, k=1))
            out_a.extend(ids[ii])
            out_b.extend(ids[jj])
        return pd.DataFrame({"a": out_a, "b": out_b})

    pair_ds = exploded.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )
    return distinct_pairs(pair_ds, num_partitions=min(num_partitions, 16))


def simhash_pairs(ds: "ray.data.Dataset", **kw) -> list[tuple]:
    """Small-scale convenience wrapper (tests / notebooks); the scale
    path is ``simhash_pairs_ds``."""
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    return sorted(
        (r["a"], r["b"]) for r in fetch_small_rows(simhash_pairs_ds(ds, **kw))
    )


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


_GRAM_HASH_KEY = "ngramjaccardlane"  # 16 bytes — second independent lane


def ngram_jaccard_pairs_exact(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
    num_partitions: int = 32,
    max_docs_per_shingle: int | None = None,
) -> "ray.data.Dataset":
    """EXACT word-``k``-gram Jaccard similarity self-join: every document
    pair whose k-shingle Jaccard is ≥ ``threshold``, with the exact score
    — no LSH, no sampling, no approximation (the SQL-checkable
    counterpart of ``minhash_dedup``'s candidates+verify).

    Inverted-index formulation (any pair with J > 0 shares ≥ 1 shingle,
    so the shingle index has perfect recall):

      map_batches: per doc, the DISTINCT gram set → explode to
          (gram-hash₀, gram-hash₁, doc, n_grams) rows — the per-doc set
          size rides along so NO size join is needed later
        → ONE groupby on a coarse partition of the gram-hash space
        → vectorized in-partition pairing (self-merge per gram) with a
          PARTIAL (a, b) count pre-reduce before the second shuffle
        → ONE coarse groupby on the pair space: sum the intersection
          counts, J = c / (n_a + n_b − c), filter ≥ threshold.

    Two independent 64-bit gram-hash lanes make a cross-doc collision
    (which would inflate an intersection count) a 2⁻¹²⁸ event at any
    corpus size — same birthday-safety argument as ``exact_dedup``.

    Documents with fewer than ``k`` words have no full k-gram and are
    excluded (mirrors the oracle's ``len(w) >= k`` gate).

    Scale note: exact similarity join is inherently quadratic in a hot
    shingle's posting list (the SQL oracle pays the same self-join).
    ``max_docs_per_shingle`` caps a posting list by keeping the lowest
    doc ids (deterministic, documented recall loss on stop-word-like
    shingles); leave ``None`` for exact parity.  For 100-TB corpora use
    ``minhash_dedup`` — this op is the exact verifier / ground truth.
    """

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        grams: list[str] = []
        offsets = [0]
        keep_rows: list[int] = []
        for i, tx in enumerate(texts):
            toks = _WORD_RE.findall((tx or "").lower())
            if len(toks) < k:
                continue
            gs = {" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)}
            grams.extend(gs)
            offsets.append(len(grams))
            keep_rows.append(i)
        if not keep_rows:
            return pa.table(
                {"doc": pa.array([], t[id_col].type),
                 "n": pa.array([], pa.int64()),
                 "h0": pa.array([], pa.uint64()),
                 "h1": pa.array([], pa.uint64()),
                 "part": pa.array([], pa.int32())}
            )
        obj = np.array(grams, dtype=object)
        h0 = pd.util.hash_array(obj)
        # hash_key only keys OBJECT arrays (numeric inputs silently
        # ignore it — see MinHasher's splitmix lanes); grams are str
        # objects, so this is a genuinely independent second lane
        h1 = pd.util.hash_array(obj, hash_key=_GRAM_HASH_KEY)
        off = np.asarray(offsets, dtype=np.int64)
        n_per_doc = np.diff(off)
        return pa.table(
            {
                "doc": pa.array(np.repeat(ids[keep_rows], n_per_doc)),
                "n": pa.array(np.repeat(n_per_doc, n_per_doc)),
                "h0": pa.array(h0),
                "h1": pa.array(h1),
                "part": pa.array(
                    (h0 % np.uint64(num_partitions)).astype(np.int32)
                ),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=g["doc"].dtype),
             "b": pd.Series([], dtype=g["doc"].dtype),
             "na": pd.Series([], dtype="int64"),
             "nb": pd.Series([], dtype="int64"),
             "c": pd.Series([], dtype="int64")}
        )
        sizes = g.groupby(["h0", "h1"])["doc"].transform("size")
        g2 = g[sizes > 1]
        if g2.empty:
            return empty
        if max_docs_per_shingle is not None:
            g2 = g2.sort_values("doc", kind="stable")
            g2 = g2.groupby(["h0", "h1"]).head(max_docs_per_shingle)
        m = g2.merge(g2, on=["h0", "h1"])
        m = m[m["doc_x"] < m["doc_y"]]
        if m.empty:
            return empty
        out = (
            m.groupby(["doc_x", "doc_y"], sort=False)
            .agg(na=("n_x", "first"), nb=("n_y", "first"),
                 c=("h0", "size"))
            .reset_index()
            .rename(columns={"doc_x": "a", "doc_y": "b"})
        )
        return out[["a", "b", "na", "nb", "c"]]

    partial = exploded.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )

    def add_pair_part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df[["a", "b"]], index=False)
        df = df.copy()
        df["_part"] = (h % np.uint64(num_partitions)).astype(np.int32)
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["a", "b"], sort=False)
            .agg(na=("na", "first"), nb=("nb", "first"), c=("c", "sum"))
            .reset_index()
        )
        j = agg["c"].to_numpy(dtype=np.float64) / (
            agg["na"].to_numpy() + agg["nb"].to_numpy() - agg["c"].to_numpy()
        )
        keep = j >= threshold
        return pd.DataFrame(
            {"doc_a": agg["a"].to_numpy()[keep],
             "doc_b": agg["b"].to_numpy()[keep],
             "jaccard": j[keep]}
        )

    return (
        partial.map_batches(add_pair_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


# ------------------------------------------- embedding cosine near-dup


def _vecs_to_fsb(mat: np.ndarray) -> pa.Array:
    """(n, dim) float32 matrix → fixed_size_binary(dim*4) Arrow array
    (one buffer copy, no per-row Python)."""
    n, dim = mat.shape
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    return pa.Array.from_buffers(
        pa.binary(dim * 4), n, [None, pa.py_buffer(mat.tobytes())]
    )


def _fsb_to_vecs(col) -> np.ndarray:
    """fixed_size_binary(dim*4) column → (n, dim) float32 view."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    dim = arr.type.byte_width // 4
    flat = np.frombuffer(arr.buffers()[1], dtype=np.float32)
    start = arr.offset * dim
    return flat[start : start + len(arr) * dim].reshape(len(arr), dim)


def _vectors_of(col, dtype=None) -> np.ndarray:
    """Embedding column → (n, dim) matrix WITHOUT per-row Python.

    ``fixed_size_list`` and equal-length ``list``/``large_list`` columns
    are one contiguous child buffer in Arrow, so the matrix is a
    zero-copy reshape of that buffer (plus one vectorized ``astype``
    when ``dtype`` differs — micro-bench note in BASELINE.md round 5).
    Null entries or ragged lengths fall back to the per-row path (which
    raises ``ValueError`` on genuinely ragged/null vectors, matching the
    old ``np.stack``-of-rows behavior — embeddings must be dense).  The
    fast path can return a READ-ONLY view — callers must not mutate in
    place (normalization should be ``m = m / n``, never ``m /= n``)."""
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = ca.type
    flat = None
    if ca.null_count == 0 and len(ca) > 0:
        if pa.types.is_fixed_size_list(t):
            dim = t.list_size
            # .values ignores a slice offset — index it explicitly
            flat = ca.values.to_numpy(zero_copy_only=False)[
                ca.offset * dim : (ca.offset + len(ca)) * dim
            ]
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            offs = ca.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            dim = int(widths[0]) if len(widths) else 0
            if dim > 0 and (widths == dim).all():
                flat = ca.values.to_numpy(zero_copy_only=False)[
                    int(offs[0]) : int(offs[-1])
                ]
    if flat is not None:
        m = flat.reshape(len(ca), dim)
        return m if dtype is None else m.astype(dtype, copy=False)
    rows = [np.asarray(v, dtype=dtype) for v in ca.to_pylist()]
    if not rows:
        return np.empty((0, 0), dtype=dtype or np.float64)
    return np.stack(rows)


def embedding_dedup_pairs_ds(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 5,
    dim: int | None = None,
    num_partitions: int = 16,
    max_all_pairs_bucket: int = 4096,
) -> "ray.data.Dataset":
    """Cosine near-dup pairs via random-hyperplane LSH, as a Dataset
    (a, b): per table, a sign signature (num_planes bits) → ONE coarse
    groupby on the (table, sig) bucket space → **in-bucket vectorized
    verification**: one normalized matmul per bucket checks every pair at
    once, so only PASSING pairs ever materialize as rows (a candidate
    id-pair explosion — bucket² rows through a distinct + join — never
    happens).  Buckets larger than ``max_all_pairs_bucket`` fall back to
    star-to-min-doc verification (linear).  ``num_tables`` independent
    tables boost recall (prob. a cos-θ pair collides in ≥1 table =
    1-(1-(1-θ/π)^planes)^tables).

    Cost note: vectors ride the shuffle once per table (float32
    fixed-size binary, 4× smaller than list<double>); sizing
    ``num_planes`` so buckets stay ≲10³ keeps the per-bucket matmul the
    dominant (useful) work.  Hyperplanes are deterministic from the
    seed, built once."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float32)

    def sig(t: pa.Table) -> pa.Table:
        vecs = _vectors_of(t[vec_col])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        normed = (vecs / np.maximum(norms, 1e-12)).astype(np.float32)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig_mat = np.empty((num_tables, n), dtype=np.int64)
        for tbl in range(num_tables):
            bits = (normed @ planes[tbl].T) > 0
            sig_mat[tbl] = (bits * (1 << np.arange(num_planes))).sum(axis=1)
        tbl_idx = np.repeat(np.arange(num_tables, dtype=np.int32), n)
        sig_flat = sig_mat.reshape(-1)
        key = sig_flat * num_tables + tbl_idx
        part = (pd.util.hash_array(key) % np.uint64(num_partitions)).astype(
            np.int32
        )
        # normalized vectors ship as fixed-size binary: zero-copy numpy
        # round-trip, and cosine in-bucket reduces to a plain matmul
        fsb = _vecs_to_fsb(normed)
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, num_tables)),
                "table": pa.array(tbl_idx),
                "sig": pa.array(sig_flat),
                "part": pa.array(part),
                "_vec": pa.chunked_array([fsb] * num_tables),
            }
        )

    bucketed = ds.map_batches(sig, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, bucket in g.groupby(["table", "sig"], sort=False):
            rows = bucket.drop_duplicates(id_col).sort_values(id_col)
            if len(rows) < 2:
                continue
            ids = rows[id_col].to_numpy()
            normed = np.frombuffer(
                b"".join(rows["_vec"]), dtype=np.float32
            ).reshape(len(rows), -1)
            if len(ids) > max_all_pairs_bucket:
                cos = normed[1:] @ normed[0]
                sel = cos >= threshold
                out.append(pd.DataFrame(
                    {"a": np.full(int(sel.sum()), ids[0]), "b": ids[1:][sel]}
                ))
                continue
            sims = normed @ normed.T
            ii, jj = np.where(np.triu(sims >= threshold, k=1))
            out.append(pd.DataFrame({"a": ids[ii], "b": ids[jj]}))
        return (
            pd.concat(out, ignore_index=True).drop_duplicates()
            if out
            else pd.DataFrame({"a": [], "b": []})
        )

    verified = bucketed.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )
    return distinct_pairs(verified, num_partitions=min(num_partitions, 8))


def embedding_dedup_pairs(ds: "ray.data.Dataset", **kw) -> list[tuple]:
    """Small-scale convenience wrapper (tests / notebooks); the scale
    path is ``embedding_dedup_pairs_ds``."""
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    return sorted(
        (r["a"], r["b"])
        for r in fetch_small_rows(embedding_dedup_pairs_ds(ds, **kw))
    )


# --------------------------------------- exact cosine-threshold self-join


def _vecs_to_fsb64(mat: np.ndarray) -> pa.Array:
    """(n, dim) float64 matrix → fixed_size_binary(dim*8) Arrow array."""
    n, dim = mat.shape
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    return pa.Array.from_buffers(
        pa.binary(dim * 8), n, [None, pa.py_buffer(mat.tobytes())]
    )


def _fsb64_to_vecs(col) -> np.ndarray:
    """fixed_size_binary(dim*8) column → (n, dim) float64 view."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    dim = arr.type.byte_width // 8
    flat = np.frombuffer(arr.buffers()[1], dtype=np.float64)
    start = arr.offset * dim
    return flat[start : start + len(arr) * dim].reshape(len(arr), dim)


class _BlockPairScorer:
    """Actor-pool stage scoring one (block_i, block_j) pair per input
    row: fetch both normalized blocks from the object store (LRU-cached
    per actor), one strip-bounded matmul, emit only passing id pairs.
    Block refs ship once per actor in the constructor (a list of
    ObjectRefs pickles as refs, not data)."""

    _CACHE_BLOCKS = 4

    def __init__(self, refs, threshold: float, strip_rows: int):
        self.refs = refs
        self.threshold = threshold
        self.strip_rows = strip_rows
        self._cache: "dict[int, tuple[np.ndarray, np.ndarray]]" = {}
        self._lru: list[int] = []

    def _block(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(idx)
        if hit is not None:
            self._lru.remove(idx)
            self._lru.append(idx)
            return hit
        t = ray.get(self.refs[idx])
        if t.num_rows == 0:  # empty block: no buffer to view
            ids = np.empty(0, dtype=np.int64)
            mat = np.empty((0, 1), dtype=np.float64)
        else:
            ids = t["_id"].to_numpy(zero_copy_only=False)
            mat = _fsb64_to_vecs(t["_vec"])
        self._cache[idx] = (ids, mat)
        self._lru.append(idx)
        if len(self._lru) > self._CACHE_BLOCKS:
            self._cache.pop(self._lru.pop(0), None)
        return ids, mat

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_a, mat_a = self._block(i)
            ids_b, mat_b = self._block(j)
            if not len(ids_a) or not len(ids_b):
                continue
            for s in range(0, len(ids_a), self.strip_rows):
                sims = mat_a[s : s + self.strip_rows] @ mat_b.T
                ii, jj = np.nonzero(sims >= self.threshold)
                if not len(ii):
                    continue
                gi = s + ii
                if i == j:
                    keep = jj > gi
                    gi, jj = gi[keep], jj[keep]
                    if not len(gi):
                        continue
                a_ids, b_ids = ids_a[gi], ids_b[jj]
                out_a.append(np.minimum(a_ids, b_ids))
                out_b.append(np.maximum(a_ids, b_ids))
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        return pa.table(
            {"a": pa.array(np.concatenate(out_a)),
             "b": pa.array(np.concatenate(out_b))}
        )


def cosine_pairs_exact(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    block_rows: int = 4096,
    strip_rows: int = 1024,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """EXACT cosine-similarity self-join: every vector pair (a < b) with
    cos ≥ ``threshold`` — no LSH, no sampling (the SQL-checkable ground
    truth for ``embedding_dedup_pairs_ds``, mirroring what
    ``ngram_jaccard_pairs_exact`` is to ``minhash_dedup``).

    Blocked all-pairs formulation:

      repartition to ~``block_rows``-row blocks → per block, L2-normalize
          to float64 and stage ``(id, vec)`` in the object store (refs
          only; nothing transits the driver)
        → a tiny Dataset of the B·(B+1)/2 block-index pairs
        → actor pool: each task fetches two blocks (per-actor LRU),
          scores them with ONE strip-bounded matmul, emits only passing
          ``(a, b)`` rows.

    Each unordered vector pair is scored exactly once (cross pairs in
    the one (i<j) block pair; within-block pairs via the upper
    triangle), so no distinct pass is needed.  Peak task memory is
    2·block_rows·dim·8 B + strip_rows·block_rows·8 B regardless of
    corpus size.  Math is float64 end-to-end so results match a
    double-precision SQL oracle (``list_cosine_similarity`` over
    ``DOUBLE[]``) bit-for-bit away from the threshold boundary.

    Scale note: exact all-pairs is inherently O(n²/block_rows²) tasks —
    the honest cost of exact semantics.  For 100-TB corpora use
    ``embedding_dedup_pairs_ds`` (LSH) as the candidate generator and
    this kernel as the audit / post-LSH verifier on a bounded subset.
    Assumes ``id_col`` values are unique (they identify vectors).
    """

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"_id": pa.array([], t[id_col].type),
                 "_vec": pa.array([], pa.binary())}
            )
        vecs = _vectors_of(t[vec_col], np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        normed = vecs / np.maximum(norms, 1e-300)
        return pa.table(
            {"_id": t[id_col], "_vec": _vecs_to_fsb64(normed)}
        )

    prepped = (
        ds.select_columns([id_col, vec_col])
        .repartition(target_num_rows_per_block=block_rows)
        .map_batches(prep, batch_format="pyarrow", batch_size=None)
    )
    # materialize first: to_arrow_refs() on a lazy Dataset re-executes
    # the upstream for its internal schema() probe (see smallfetch)
    refs = prepped.materialize().to_arrow_refs()
    nblocks = len(refs)
    pairs = [
        {"i": i, "j": j} for i in range(nblocks) for j in range(i, nblocks)
    ]
    npairs = len(pairs)
    if npairs == 0:  # empty corpus → empty pair set
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
        )
    return ray.data.from_items(
        pairs, override_num_blocks=min(npairs, 64)
    ).map_batches(
        _BlockPairScorer,
        fn_constructor_kwargs={
            "refs": refs, "threshold": threshold, "strip_rows": strip_rows,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or max(1, min(npairs, 16)),
    )


# ------------------------------------------------------- semantic dedup


def semantic_dedup(
    ds: "ray.data.Dataset",
    *,
    n_clusters: int = 64,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_flagged: bool = False,
    max_cluster_block: int = 4096,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space with a
    bounded-sample fit, then WITHIN each cluster drop every vector
    whose cosine similarity to a lower-id vector of the same cluster is
    ≥ ``threshold`` (the lowest id of each semantic-duplicate set
    survives — deterministic under any partitioning).  Returns the
    surviving rows (or, with ``keep_flagged=True``, the dropped ones —
    the audit view).

    Scale shape — the published algorithm's own design: clustering
    bounds the O(m²) similarity check to within-cluster pairs, so pick
    ``n_clusters`` ∝ corpus size to keep clusters task-sized.  Stages:
    one bounded-sample k-means fit (corpus scanned once via ``limit``),
    one shuffle-free assignment pass against broadcast centroids
    (cosine argmax), ONE groupby shuffle on the cluster id, and a
    per-cluster pruning kernel whose pairwise matmul is evaluated in
    ``max_cluster_block``-column strips (memory O(m × strip), never the
    full m×m Gram matrix)."""
    import ray as _ray

    from plugin_debezium_ray.functions.ann import kmeans_fit_sample

    cents = kmeans_fit_sample(ds, n_clusters, vec_col=vec_col)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    cents = cents / np.maximum(norms, 1e-12)
    cref = _ray.put(cents.astype(np.float32))

    def assign(t: pa.Table) -> pa.Table:
        # stateless task: ray.get of the centroid matrix is a zero-copy
        # plasma mmap per task — no actor-pool spin-up (~1 s/pool)
        if t.num_rows == 0:
            return t.append_column("_cluster", pa.array([], pa.int32()))
        cents_m = _ray.get(cref)
        m = _vectors_of(t[vec_col], np.float32)
        # _vectors_of can hand back a read-only Arrow view — divide
        # out of place
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        c = np.argmax(m @ cents_m.T, axis=1).astype(np.int32)
        return t.append_column("_cluster", pa.array(c))

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # an empty block can arrive WITH the assign schema — drop the
            # helper column so every output block shares one schema
            if "_cluster" in t.column_names:
                return t.drop_columns(["_cluster"])
            return t
        order = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(order)
        m = _vectors_of(t[vec_col], np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        n = len(m)
        drop = np.zeros(n, dtype=bool)
        for s in range(0, n, max_cluster_block):
            e = min(s + max_cluster_block, n)
            sims = m @ m[s:e].T  # (n, strip)
            # column j (global s+j) is a duplicate if any STRICTLY
            # earlier row i < s+j reaches the threshold
            ii = np.arange(n)[:, None]
            jj = np.arange(s, e)[None, :]
            hit = (sims >= threshold) & (ii < jj)
            drop[s:e] |= hit.any(axis=0)
        keep = drop if keep_flagged else ~drop
        return t.filter(pa.array(keep)).drop_columns(["_cluster"])

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("_cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


# ------------------------------------------- incremental (index) dedup
#
# The add-a-shard path: at 100 TB you do NOT re-dedup the whole corpus
# when a new shard arrives — you keep a persisted index of the corpus'
# two-lane 128-bit content hashes, bucket-partitioned by hash, and
# anti-probe only the buckets the new shard touches.  The index is
# hashes only (16 bytes/doc + bucket dirs): ~160 GB for 10^10 docs,
# and a probe task reads ONE bucket partition — never the corpus, never
# the whole index.


def build_content_index(
    ds: "ray.data.Dataset",
    path: str,
    *,
    text_col: str = "text",
    normalize: bool = False,
    num_buckets: int = 256,
) -> dict:
    """Persist the corpus' content-hash index: bucket-partitioned
    parquet of (h0, h1) under ``path`` (hive layout, one directory per
    ``bucket = h0 % num_buckets``) plus an ``_index_meta.json`` pinning
    the hash scheme (``normalize``/``num_buckets``) so probes and
    extensions cannot silently mix schemes."""
    import json
    import os

    if os.path.exists(os.path.join(path, "_index_meta.json")):
        # appending a DIFFERENT scheme in place would leave old hashes
        # in wrong-modulus bucket dirs (probes silently miss them) —
        # the exact corruption the meta file exists to prevent
        raise ValueError(
            f"content index already exists at {path!r}; use "
            "extend_content_index to add a shard, or remove the "
            "directory to rebuild"
        )

    def hashed(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col=text_col, normalize=normalize)
        b = (t["_h0"].to_numpy() % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            "h0": t["_h0"], "h1": t["_h1"], "bucket": pa.array(b),
        })

    ds.map_batches(hashed, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )
    meta = {"version": 1, "num_buckets": num_buckets,
            "normalize": bool(normalize)}
    tmp = os.path.join(path, "_index_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_index_meta.json"))
    return meta


def _index_meta(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, "_index_meta.json")) as f:
        return json.load(f)


def extend_content_index(
    ds: "ray.data.Dataset", path: str, *, text_col: str = "text"
) -> dict:
    """Append a (deduplicated) shard's hashes to an existing index —
    the commit step after ``dedup_against_index`` keeps a shard.  Writes
    NEW files into the same bucket directories (Ray parquet filenames
    are unique per write), so a crashed extension never corrupts
    existing files; re-running only over-approximates membership, which
    is dedup-safe (already-indexed content stays indexed)."""
    meta = _index_meta(path)

    def hashed(t: pa.Table) -> pa.Table:
        t = add_content_hash(
            t, text_col=text_col, normalize=meta["normalize"]
        )
        b = (
            t["_h0"].to_numpy() % np.uint64(meta["num_buckets"])
        ).astype(np.int32)
        return pa.table({
            "h0": t["_h0"], "h1": t["_h1"], "bucket": pa.array(b),
        })

    ds.map_batches(hashed, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"]
    )
    return meta


def dedup_against_index(
    new: "ray.data.Dataset",
    path: str,
    *,
    text_col: str = "text",
    keep_cols: "list[str] | None" = None,
) -> "ray.data.Dataset":
    """Drop every new-shard row whose content hash already exists in
    the persisted index (cross-corpus exact dedup; within-shard
    duplicates are NOT touched — run ``exact_dedup`` on the shard
    first).  The shard is hashed per batch and co-grouped by index
    bucket; each probe task reads ONLY its bucket's partition directory
    (buckets the shard doesn't touch are never read) and runs the
    vectorized two-lane membership probe (searchsorted on lane 0,
    confirm lane 1 — same false-positive math as ``decontaminate``: a
    wrong drop needs a simultaneous 128-bit collision).  ``keep_cols``
    prunes the columns that ride the bucket shuffle, as in
    ``exact_dedup``.  The schema resolves eagerly (materialize an
    expensive lazy input first)."""
    import os

    import pyarrow.parquet as pq

    meta = _index_meta(path)
    nb, normalize = meta["num_buckets"], meta["normalize"]

    sch = new.schema()
    if keep_cols is not None:
        missing = [c for c in keep_cols if c not in sch.names]
        if missing:
            # fail fast, not as an opaque KeyError inside a Ray task
            # after hashing already ran (exact_dedup's guard, same idea)
            raise ValueError(
                f"keep_cols not in shard schema: {missing}"
            )
    out_cols = list(keep_cols) if keep_cols is not None else list(sch.names)
    _types = dict(zip(sch.names, sch.types))
    drop = ["_h0", "_h1", "_bucket"]

    def hashed(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col=text_col, normalize=normalize)
        if keep_cols is not None:
            t = t.select(list(keep_cols) + ["_h0", "_h1"])
        b = (t["_h0"].to_numpy() % np.uint64(nb)).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    def empty_out() -> "pa.Table | None":
        if any(not isinstance(_types.get(c), pa.DataType)
               for c in out_cols):
            return None
        return pa.table({
            c: pa.array([], type=_types[c]) for c in out_cols
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            seed = empty_out()
            if seed is not None:
                return seed
            return g.drop_columns([c for c in drop
                                   if c in g.column_names])
        b = g["_bucket"][0].as_py()
        d = os.path.join(path, f"bucket={b}")
        if not os.path.isdir(d):
            return g.drop_columns(drop)
        from plugin_debezium_ray.functions.selection import two_lane_hits

        idx = pq.read_table(d, columns=["h0", "h1"])
        i0 = idx["h0"].to_numpy(zero_copy_only=False)
        i1 = idx["h1"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i1, i0))
        hit = two_lane_hits(
            i0[order], i1[order],
            g["_h0"].to_numpy(zero_copy_only=False),
            g["_h1"].to_numpy(zero_copy_only=False),
        )
        return g.filter(pa.array(~hit)).drop_columns(drop)

    out = (
        new.map_batches(hashed, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    seed = empty_out()
    if seed is not None:
        out = out.union(ray.data.from_arrow(seed))
    return out
