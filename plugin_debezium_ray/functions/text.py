"""Text analysis for large-scale training-data pipelines.

Vectorized per-batch stages over the ``documents`` table: token counting,
quality scoring, language-ID (stopword/charset heuristic), document
fingerprinting.  All are ``map_batches`` callables; stateful setup
(compiled regexes, stopword tables) happens once per actor in
``__init__`` when used as a class.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------- counting


def token_count_batch(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count + char count, pure Arrow kernels.

    ``n_tokens`` = count of maximal non-space runs == DuckDB's
    ``length(regexp_split_to_array(trim(text), '\\s+'))`` for non-empty
    text (the oracle SQL used by the driver check).
    """
    txt = t[text_col]
    n_chars = pc.utf8_length(txt)
    # count whitespace-delimited tokens: split on \s+ then list length
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
    n_tokens = pc.list_value_length(toks)
    # empty/whitespace-only text → 0 tokens (split returns [''] → 1)
    empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(txt)), 0)
    n_tokens = pc.if_else(empty, pa.scalar(0, pa.int32()), n_tokens)
    out = t.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    return out.append_column("n_chars_computed", pc.cast(n_chars, pa.int64()))


class BpeishTokenCounter:
    """BPE-ish token estimate: regex word/number/punct pieces, the
    pretokenizer shape used by GPT-style BPE vocabularies.  Compiled once
    per actor (actor-pool stage)."""

    PATTERN = r"[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]"

    def __init__(self, text_col: str = "text"):
        self.re = re.compile(self.PATTERN)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t[self.text_col], self.PATTERN)
        return t.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


# -------------------------------------------------------------- quality


def quality_score_batch(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Length/punctuation/word-shape quality signals (C4/Gopher-style
    heuristics, vectorized).  SQL-mirrorable columns only."""
    txt = t[text_col]
    n_chars = pc.cast(pc.utf8_length(txt), pa.float64())
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(txt), r"\s+")
    n_words = pc.cast(pc.list_value_length(toks), pa.float64())
    n_words_safe = pc.max_element_wise(n_words, 1.0)
    n_chars_safe = pc.max_element_wise(n_chars, 1.0)
    n_punct = pc.cast(
        pc.count_substring_regex(txt, r"[.,;:!?]"),
        pa.float64(),
    )
    n_upper = pc.cast(
        pc.count_substring_regex(txt, r"[A-Z]"), pa.float64()
    )
    avg_word_len = pc.divide(
        pc.subtract(n_chars, pc.subtract(n_words, 1.0)), n_words_safe
    )
    out = t
    out = out.append_column("n_words", pc.cast(n_words, pa.int64()))
    out = out.append_column("avg_word_len", avg_word_len)
    out = out.append_column("punct_ratio", pc.divide(n_punct, n_chars_safe))
    out = out.append_column("upper_ratio", pc.divide(n_upper, n_chars_safe))
    return out


_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "de", "que", "los", "es", "un", "una", "por", "con"},
}


class LangId:
    """Heuristic language-ID: stopword hit-rates + CJK charset check.
    Tables built once per actor; per-batch work is pandas string ops."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        """Vectorized: one findall pass per row (pandas str op), then
        explode + per-language ``isin`` + one groupby-sum — no per-word
        Python dict probing."""
        s = pd.Series(t[self.text_col].to_pandas()).reset_index(drop=True)
        langs = np.full(len(s), None, dtype=object)
        scores = np.zeros(len(s))
        notnull = s.notna()
        cjk = notnull & s.str.contains(self.cjk_re, na=False)
        langs[cjk.to_numpy()] = "zh"
        scores[cjk.to_numpy()] = 1.0
        rest = notnull & ~cjk
        if rest.any():
            words = s[rest].str.findall(self.word_re).str[:200]
            nw = words.str.len()
            empty = nw == 0
            langs[words.index[empty].to_numpy()] = "und"
            wl = words[~empty]
            if len(wl):
                ex = wl.explode().str.lower()
                hits = pd.DataFrame(
                    {lang: ex.isin(tbl) for lang, tbl in self.tables.items()},
                    index=ex.index,
                ).groupby(level=0).sum()
                # strict-improvement tie-break of the row loop == first
                # max in insertion order == idxmax column order
                best = hits.idxmax(axis=1)
                best_hits = hits.max(axis=1)
                und = (best_hits == 0).to_numpy()
                idx = best.index.to_numpy()
                langs[idx] = np.where(und, "und", best.to_numpy())
                scores[idx] = np.where(
                    und, 0.0, best_hits.to_numpy() / nw[~empty].to_numpy()
                )
        out = t.append_column("lang_pred", pa.array(langs, type=pa.string()))
        return out.append_column("lang_score", pa.array(scores))


def repetition_stats_batch(
    t: pa.Table, *, text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition signals per document: distinct-word
    count, the most-frequent word's share (``top_word_ratio``) and the
    duplicate-word share (``dup_word_ratio`` = 1 − distinct/total).
    High values flag boilerplate / degenerate text.

    Vectorized: ONE pandas explode over the whole batch, two
    groupby-level aggregations — no per-document Python loop.  Counts
    are over lowercased whitespace tokens, mirroring the SQL oracle's
    ``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``."""
    s = pd.Series(t[text_col].to_pandas()).reset_index(drop=True)
    # [^\t\n\f\r ]+ == RE2's \S (Python's \S+ also excludes Unicode
    # spaces like NBSP — that would break parity with the SQL oracle)
    words = s.str.lower().str.findall(r"[^\t\n\f\r ]+")
    n_words = words.str.len().fillna(0).astype(np.int64)
    ex = words.explode().dropna()
    if len(ex):
        per_word = ex.groupby([ex.index, ex]).size()
        n_distinct = per_word.groupby(level=0).size()
        top = per_word.groupby(level=0).max()
    else:
        n_distinct = pd.Series([], dtype=np.int64)
        top = pd.Series([], dtype=np.int64)
    n_distinct = n_distinct.reindex(s.index, fill_value=0).astype(np.int64)
    top = top.reindex(s.index, fill_value=0).astype(np.int64)
    denom = np.maximum(n_words.to_numpy(), 1).astype(np.float64)
    dup_ratio = 1.0 - n_distinct.to_numpy() / denom
    dup_ratio[n_words.to_numpy() == 0] = 0.0
    top_ratio = top.to_numpy() / denom

    def masked(vals: np.ndarray, typ) -> pa.Array:
        # null text → null stats (mirrors the oracle's WHERE-less CASE)
        return pa.array(vals, type=typ, mask=s.isna().to_numpy())

    out = t.append_column(
        "n_distinct_words", masked(n_distinct.to_numpy(), pa.int64())
    )
    out = out.append_column("dup_word_ratio", masked(dup_ratio, pa.float64()))
    return out.append_column(
        "top_word_ratio", masked(top_ratio, pa.float64())
    )


# ------------------------------------------------------------ redaction

# applied IN ORDER: emails first (their digits must not feed the phone
# pattern), IPs before phones (dotted octets look like dotted phones)
DEFAULT_PII_PATTERNS: tuple = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d[\d.\- ]{6,14}\d\b", "<PHONE>"),
)


class PatternRedactor:
    """Vectorized PII / pattern scrubbing: each ``(name, regex,
    replacement)`` is applied in order with Arrow's RE2 kernels —
    ``pc.count_substring_regex`` emits an ``n_<name>`` count column,
    ``pc.replace_substring_regex`` rewrites the text.  Counts are taken
    on the text AS OF that stage (after earlier patterns ran), which is
    exactly what a chain of SQL ``regexp_replace(...regexp_replace...)``
    calls sees — Arrow and DuckDB both use RE2, so the rewrite is
    mirrorable 1:1 (verified).  No per-row Python anywhere."""

    def __init__(
        self,
        patterns=DEFAULT_PII_PATTERNS,
        text_col: str = "text",
        out_col: str | None = None,
    ):
        self.patterns = tuple(patterns)
        self.text_col = text_col
        self.out_col = out_col or f"{text_col}_redacted"

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col]
        out = t
        for name, pat, repl in self.patterns:
            n = pc.count_substring_regex(col, pat)
            out = out.append_column(f"n_{name}", pc.cast(n, pa.int64()))
            col = pc.replace_substring_regex(col, pat, repl)
        return out.append_column(self.out_col, col)


# --------------------------------------------------------- fingerprints


def md5_fingerprint_batch(t: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Exact content fingerprint (md5 hex) — matches DuckDB ``md5(text)``.

    This is the SQL-COMPATIBILITY path: the per-row ``hashlib`` loop is
    inherent to the md5 contract and is the slowest text stage at scale.
    Scale users should prefer the vectorized keyed hashes —
    ``RollingFingerprint`` (edit-robust winnowing) or
    ``dedup.add_content_hash`` (exact two-lane 128-bit) — which hash
    whole batches in a handful of ``pd.util.hash_array`` calls."""
    vals = t[text_col].to_pylist()
    fp = [
        None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
        for v in vals
    ]
    return t.append_column("fingerprint_md5", pa.array(fp, type=pa.string()))


class RollingFingerprint:
    """Rolling-hash (Rabin-Karp) document fingerprint: min of polynomial
    hashes over token windows — robust to local edits, winnowing-style
    (Schleimer et al., SIGMOD'03 idea, public).  Deterministic.

    Vectorized: ONE keyed-hash call over every token in the batch, then
    per-doc windowed polynomial sums in native uint64 (mod 2^64 by
    wraparound) via ``sliding_window_view`` — no Python bignum math."""

    B = np.uint64(1_000_003)

    def __init__(self, window: int = 8, text_col: str = "text"):
        self.window = window
        self.text_col = text_col
        self.word_re = re.compile(r"\S+")
        # B^(w-1-i) mod 2^64 for every window size ≤ window, built once
        pw = np.ones(window, dtype=np.uint64)
        for i in range(1, window):
            pw[i] = pw[i - 1] * self.B  # uint64 wraparound = mod 2^64
        self._pows = pw  # pw[j] = B^j

    def _weights(self, w: int) -> np.ndarray:
        return self._pows[:w][::-1].copy()  # B^(w-1) … B^0

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        words: list[str] = []
        offsets = [0]
        for text in texts:
            if text is not None:
                words.extend(self.word_re.findall(text))
            offsets.append(len(words))
        hashes = (
            pd.util.hash_array(np.array(words, dtype=object))
            if words
            else np.empty(0, dtype=np.uint64)
        )
        out: list = []
        for d, text in enumerate(texts):
            if text is None:
                out.append(None)
                continue
            h = hashes[offsets[d] : offsets[d + 1]]
            if len(h) == 0:
                out.append(0)
                continue
            w = min(self.window, len(h))
            wins = np.lib.stride_tricks.sliding_window_view(h, w)
            vals = (wins * self._weights(w)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out.append(int(vals.min()))
        return t.append_column("fingerprint_rolling", pa.array(out, type=pa.uint64()))


# --------------------------------------------------------------- tf-idf

_TFIDF_WORD_RE = re.compile(r"[^\t\n\f\r ]+")  # RE2 \s parity (no \v/NBSP)


def doc_term_counts_batch(
    t: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """One row per (doc, DISTINCT lowercased whitespace token) with its
    in-doc frequency — the term-statistics primitive.  Null/blank docs
    emit nothing.  Counting is one pandas groupby-size over the flat
    token array (C kernel), no per-doc Python loop beyond tokenize."""
    texts = t[text_col].to_pylist()
    tokens: list[str] = []
    doc_rows: list[int] = []
    counts: list[int] = []
    for i, tx in enumerate(texts):
        if tx is None:
            continue
        toks = _TFIDF_WORD_RE.findall(tx.lower())
        if not toks:
            continue
        tokens.extend(toks)
        doc_rows.append(i)
        counts.append(len(toks))
    if not doc_rows:
        return pa.table({
            id_col: t[id_col].slice(0, 0),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
        })
    doc_idx = np.repeat(np.asarray(doc_rows, dtype=np.int64), counts)
    g = (
        pd.DataFrame({"d": doc_idx, "t": np.array(tokens, dtype=object)})
        .groupby(["d", "t"], sort=False)
        .size()
        .reset_index(name="tf")
    )
    return pa.table({
        id_col: pc.take(
            t[id_col], pa.array(g["d"].to_numpy(np.int64))
        ),
        "term": pa.array(g["t"].to_numpy(object), type=pa.string()),
        "tf": pa.array(g["tf"].to_numpy(np.int64)),
    })


def top_terms_by_tfidf(
    ds: "ray.data.Dataset",
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf: str = "raw",
    vocab_max_rows: int = 5_000_000,
):
    """The ``k`` most characteristic terms of every document by tf-idf,
    composed entirely from the engine's own primitives:

      1. ``doc_term_counts_batch`` — shuffle-free (docs never span
         batches, so per-batch (doc, term) counts are exact)
      2. document frequencies: ONE ``groupby(term).count()`` (the
         term-level shuffle a global DF fundamentally needs; input is
         already distinct per (doc, term))
      3. the DF table rides back via ``broadcast_join`` (bounded by
         ``vocab_max_rows`` — raise, don't OOM)
      4. score + ``grouped_top_k`` per doc (ties → term ascending)

    ``idf="raw"`` scores ``tf · N / df`` with the multiply-then-divide
    op order mirrored by SQL ``CAST(tf AS DOUBLE) * N / df`` — bit-exact
    parity for the oracle.  ``idf="log"`` scores the classic
    ``tf · ln(N / df)`` (what a real pipeline wants; libm ``ln`` is not
    bit-mirrorable, hence not the oracle default).  Returns
    ``(id, term, tf, df)`` of the winners."""
    import ray.data  # noqa: F401  (type only)

    from plugin_debezium_ray.functions.joins import broadcast_join
    from plugin_debezium_ray.functions.ranking import grouped_top_k

    if idf not in ("raw", "log"):
        raise ValueError(f"idf must be 'raw' or 'log', got {idf!r}")
    n_docs = ds.count()

    terms = ds.map_batches(
        lambda t: doc_term_counts_batch(t, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    # `terms` feeds TWO consumers (the DF groupby and the join's big
    # side) and Ray Data does not cache unmaterialized plans — without
    # this the corpus is tokenized twice (a full extra corpus scan at
    # scale).  The materialized blocks live in the object store and
    # spill if needed; (id, term, tf) rows are far smaller than the
    # corpus text itself.
    terms = terms.materialize()
    dfreq = terms.groupby("term").count()

    def rename_df(t: pa.Table) -> pa.Table:
        return t.rename_columns(["term", "df"])

    dfreq = dfreq.map_batches(rename_df, batch_format="pyarrow")
    joined = broadcast_join(
        terms, dfreq, on="term", small_max_rows=vocab_max_rows
    )

    def score(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        if idf == "raw":
            s = tf * float(n_docs) / dfv  # multiply THEN divide (SQL order)
        else:
            s = tf * np.log(float(n_docs) / dfv)
        return t.append_column("score", pa.array(s))

    out = grouped_top_k(
        joined.map_batches(score, batch_format="pyarrow"),
        group_col=id_col, score_col="score", id_col="term", k=k,
    )
    return out.select_columns([id_col, "term", "tf", "df"])
