"""Fixed-length sequence packing — the last step of a pretraining data
pipeline: documents are concatenated in a deterministic order and split
into ``seq_len``-token training sequences (documents may span sequence
boundaries; nothing is padded away).

The hard part at scale is the ORDERED prefix sum over token counts.
Implemented as the classic three-phase distributed scan:

  1. vectorized per-doc token counts (reuses ``token_count_batch``)
  2. ONE range shuffle: sort by the id column (the packing order is
     part of the op's definition — an order-free "pack" would not be
     reproducible), blocks come out range-partitioned and ordered
  3. scan: per-block token totals are computed by parallel tasks
     (each reads its block from the object store, returns one scalar),
     the driver folds the B scalars into exclusive block bases (O(B)
     integers — thousands at 100 TB, never row-scale), and a second
     parallel pass assigns every document its global token interval.

Per document the result is exactly where its tokens land:
``first_seq = (cum - n) // L``, ``last_seq = (cum - 1) // L`` (clamped
to ``first_seq`` for empty docs) and ``seq_offset = (cum - n) % L`` —
all integers, so the whole op is mirrorable by a SQL running-sum
window (``SUM(...) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from plugin_debezium_ray.functions.text import token_count_batch


def chunk_documents(
    ds: "ray.data.Dataset",
    *,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    preserve_whitespace: bool = False,
) -> "ray.data.Dataset":
    """Split every document into overlapping token-window chunks (the
    RAG / long-context preprocessing step): windows of ``chunk_tokens``
    whitespace tokens starting every ``chunk_tokens - overlap`` tokens;
    the last window may be shorter.  Emits one row per chunk:
    ``(id, chunk_id, n_chunk_tokens, chunk_text)``.

    Embarrassingly parallel flat-map — no shuffle, no state; chunk ids
    are per-document, so the op is deterministic under any partitioning.
    Tokenization is ``trim + split on whitespace runs``; by default
    chunk text reassembles with single spaces, mirroring the SQL
    oracle's ``array_to_string(w[i·s+1 : i·s+c], ' ')``.  With
    ``preserve_whitespace=True`` each chunk is a RAW SLICE of the
    original text from its first token's start to its last token's end
    (inner whitespace kept byte-exact — what a RAG pipeline usually
    wants).  Null / empty docs emit no chunks.

    The default (joined) mode is fully VECTORIZED at the batch level:
    ONE Arrow ``split_pattern_regex`` tokenizes the whole batch, numpy
    segmented arithmetic lays out every chunk's token window, one
    ``pc.take`` gathers the (overlap-duplicated) tokens and one
    ``pc.binary_join`` renders all chunk texts — no per-document Python
    loop (measured 2.0× the loop path on sf0.1 documents, byte-equal
    output; BASELINE.md round-5 A/B line).  ``preserve_whitespace``
    needs regex match SPANS, which Arrow has no kernel for, so that
    mode keeps the per-doc loop with string slices."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    import re as _re

    # RE2's \s is exactly [\t\n\f\r ] (no \v, no Unicode spaces) —
    # Python's Unicode-aware \S+ would split on NBSP where the Arrow /
    # DuckDB kernels don't, so spell the class out for oracle parity
    _WS = "\t\n\f\r "
    word_re = _re.compile(r"[^\t\n\f\r ]+")

    def empty_out(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pa.array([], type=t[id_col].type),
            "chunk_id": pa.array([], type=pa.int64()),
            "n_chunk_tokens": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
        })

    def explode_vec(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_out(t)
        toks = pc.split_pattern_regex(
            pc.utf8_trim(t[text_col], characters=_WS),
            pattern=f"[{_WS}]+",
        )
        toks = (toks.combine_chunks()
                if isinstance(toks, pa.ChunkedArray) else toks)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offs)  # null docs → zero-width lists
        flat = toks.values
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        # a trimmed empty/whitespace-only doc splits to [''] — one
        # zero-length token ⇒ treat as zero tokens (the loop path's
        # findall simply finds nothing)
        n_eff = n_tok.copy()
        ones = np.flatnonzero(n_tok == 1)
        if len(ones):
            n_eff[ones[lens[offs[:-1][ones]] == 0]] = 0
        n_chunks = np.where(
            n_eff > 0, (np.maximum(n_eff - 1, 0) // stride) + 1, 0
        )
        total = int(n_chunks.sum())
        if total == 0:
            return empty_out(t)
        doc = np.repeat(np.arange(len(n_tok)), n_chunks)
        base = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        chunk_id = np.arange(total) - base[doc]
        s_tok = chunk_id * stride
        width = np.minimum(s_tok + chunk_tokens, n_eff[doc]) - s_tok
        # gather indices for every chunk's tokens (overlap duplicates)
        ch_off = np.concatenate([[0], np.cumsum(width)])
        idx = (np.arange(int(ch_off[-1]))
               - np.repeat(ch_off[:-1], width)
               + np.repeat(offs[:-1][doc] + s_tok, width))
        chunks = pa.LargeListArray.from_arrays(
            pa.array(ch_off, type=pa.int64()), pc.take(flat, pa.array(idx))
        )
        return pa.table({
            id_col: pc.take(t[id_col].combine_chunks(), pa.array(doc)),
            "chunk_id": pa.array(chunk_id, type=pa.int64()),
            "n_chunk_tokens": pa.array(width, type=pa.int64()),
            "chunk_text": pc.cast(pc.binary_join(chunks, " "), pa.string()),
        })

    def explode(t: pa.Table) -> pa.Table:
        ids_out: list = []
        chunk_ids: list[int] = []
        sizes: list[int] = []
        texts_out: list[str] = []
        ids = t[id_col].to_pylist()
        for did, tx in zip(ids, t[text_col].to_pylist()):
            if tx is None:
                continue
            spans = [m.span() for m in word_re.finditer(tx)]
            n = len(spans)
            if n == 0:
                continue
            starts = np.fromiter(
                (s for s, _ in spans), dtype=np.int64, count=n
            )
            ends = np.fromiter(
                (e for _, e in spans), dtype=np.int64, count=n
            )
            src = tx
            for ci, s in enumerate(range(0, n, stride)):
                e = min(s + chunk_tokens, n)
                ids_out.append(did)
                chunk_ids.append(ci)
                sizes.append(e - s)
                texts_out.append(src[starts[s] : ends[e - 1]])
        return pa.table(
            {
                id_col: pa.array(ids_out, type=t[id_col].type),
                "chunk_id": pa.array(chunk_ids, type=pa.int64()),
                "n_chunk_tokens": pa.array(sizes, type=pa.int64()),
                "chunk_text": pa.array(texts_out, type=pa.string()),
            }
        )

    return ds.map_batches(
        explode if preserve_whitespace else explode_vec,
        batch_format="pyarrow",
    )


@ray.remote
def _block_token_total(tbl: pa.Table, token_col: str) -> int:
    # Ray 2.49 sort emits schema-less EMPTY blocks — no rows, no columns
    if tbl.num_rows == 0:
        return 0
    s = pc.sum(tbl[token_col])
    return int(s.as_py() or 0)


class _AssignSequences:
    """Second scan pass: one (block index, base offset) descriptor per
    input row; fetch the block, in-block cumulative sum + global base,
    emit the per-doc sequence interval."""

    def __init__(self, refs, seq_len: int, id_col: str, token_col: str,
                 id_type: pa.DataType):
        self.refs = refs
        self.seq_len = seq_len
        self.id_col = id_col
        self.token_col = token_col
        self.id_type = id_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for i, base in zip(batch["i"].to_pylist(), batch["base"].to_pylist()):
            t = ray.get(self.refs[i])
            if t.num_rows == 0:
                continue
            n = (
                pc.fill_null(t[self.token_col], 0)  # null count packs as 0
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cum = np.cumsum(n) + np.int64(base)
            start = cum - n
            first = start // self.seq_len
            last = np.maximum((cum - 1) // self.seq_len, first)
            outs.append(pa.table(
                {
                    self.id_col: t[self.id_col],
                    "n_tokens": pa.array(n),
                    "first_seq": pa.array(first),
                    "last_seq": pa.array(last),
                    "seq_offset": pa.array(start % self.seq_len),
                }
            ))
        if not outs:
            return pa.table(
                {"doc_id": pa.array([], self.id_type),
                 "n_tokens": pa.array([], pa.int64()),
                 "first_seq": pa.array([], pa.int64()),
                 "last_seq": pa.array([], pa.int64()),
                 "seq_offset": pa.array([], pa.int64())}
            ).rename_columns(
                [self.id_col, "n_tokens", "first_seq", "last_seq",
                 "seq_offset"]
            )
        return pa.concat_tables(outs)


def pack_sequences(
    ds: "ray.data.Dataset",
    *,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Assign every document its token interval in the packed training
    stream: concatenate docs in ascending ``id_col`` order, split at
    every ``seq_len`` tokens.  Returns
    ``(id, n_tokens, first_seq, last_seq, seq_offset)``.

    Pass ``token_col`` to pack by a precomputed count (e.g. a real
    tokenizer's); otherwise whitespace counts are computed here
    (``token_count_batch`` semantics).  Null text / null counts pack as
    0 tokens on both paths.

    Scale shape: one sort (the only shuffle), two parallel passes over
    the sorted blocks, O(num_blocks) driver integers.  Deterministic:
    the same corpus always packs identically, so a resumed/sharded
    tokenization job can consume ``(first_seq, seq_offset)`` as stable
    coordinates."""
    if token_col is None:
        def count(t: pa.Table) -> pa.Table:
            c = token_count_batch(t, text_col=text_col)
            n = pc.fill_null(c["n_tokens"], 0)  # null text packs as 0
            return pa.table({id_col: t[id_col], "_n": n})

        counted = ds.map_batches(count, batch_format="pyarrow")
        token_col = "_n"
    else:
        counted = ds.select_columns([id_col, token_col])

    # id type from the INPUT dataset (metadata-only for file reads; the
    # id column passes through unchanged) — asking the sorted dataset
    # would execute the sort a second time.  Pandas-block datasets
    # report Python types here, not Arrow ones → fall back to int64.
    sch = ds.schema()
    typ = sch.types[sch.names.index(id_col)] if sch is not None else None
    id_type = typ if isinstance(typ, pa.DataType) else pa.int64()
    # materialize first: to_arrow_refs() on a lazy Dataset re-executes
    # the upstream (here: the whole SORT) for its internal schema() probe
    refs = counted.sort(id_col).materialize().to_arrow_refs()
    totals = ray.get(
        [_block_token_total.remote(r, token_col) for r in refs]
    )
    bases = np.concatenate([[0], np.cumsum(totals[:-1], dtype=np.int64)]) \
        if totals else np.zeros(0, dtype=np.int64)
    items = [
        {"i": i, "base": int(b)} for i, b in enumerate(bases)
    ]
    if not items:
        items = [{"i": 0, "base": 0}]  # empty corpus → empty result table
        refs = [ray.put(pa.table({id_col: pa.array([], id_type),
                                  token_col: pa.array([], pa.int64())}))]
    return ray.data.from_items(
        items, override_num_blocks=len(items)
    ).map_batches(
        _AssignSequences,
        fn_constructor_kwargs={
            "refs": refs, "seq_len": seq_len,
            "id_col": id_col, "token_col": token_col, "id_type": id_type,
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or max(1, min(len(refs), 16)),
    )


@ray.remote
def _block_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


class _AssignRanks:
    """Second scan pass of ``global_order_rank``: fetch block i, emit
    its rows with ``base + arange`` ranks appended."""

    def __init__(self, refs, rank_col: str, drop_cols):
        self.refs = refs
        self.rank_col = rank_col
        self.drop = list(drop_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for i, base in zip(batch["i"].to_pylist(), batch["base"].to_pylist()):
            t = ray.get(self.refs[i])
            if t.num_rows == 0:
                continue
            ranks = np.arange(t.num_rows, dtype=np.int64) + np.int64(base)
            t = t.append_column(self.rank_col, pa.array(ranks))
            if self.drop:
                t = t.drop_columns(self.drop)
            outs.append(t)
        if not outs:
            return pa.table({})  # empty marker; upstream sort was empty
        return pa.concat_tables(outs)


def global_order_rank(
    ds: "ray.data.Dataset",
    *,
    order_cols: "list[str]",
    rank_col: str = "rank",
    drop_order_cols: "list[str] | None" = None,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Assign every row its 0-based rank in the global ``order_cols``
    ordering — the deterministic-corpus-shuffle primitive: order by a
    hash of the id (computed upstream) and the rank IS the training
    position, reproducible across reruns, repartitions and cluster
    sizes.

    Same scale shape as ``pack_sequences``: ONE range sort (the only
    shuffle), a parallel per-block row-count pass, an O(blocks) driver
    fold into exclusive base offsets, and a parallel assignment pass —
    the driver never sees rows.  ``drop_order_cols`` removes helper
    sort columns from the output."""
    refs = ds.sort(order_cols).materialize().to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    bases = np.concatenate([[0], np.cumsum(counts[:-1], dtype=np.int64)]) \
        if counts else np.zeros(0, dtype=np.int64)
    items = [{"i": i, "base": int(b)} for i, b in enumerate(bases)]
    if not items:
        return ds  # empty input: nothing to rank
    return ray.data.from_items(
        items, override_num_blocks=len(items)
    ).map_batches(
        _AssignRanks,
        fn_constructor_kwargs={
            "refs": refs,
            "rank_col": rank_col,
            "drop_cols": drop_order_cols or [],
        },
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency or max(1, min(len(refs), 16)),
    )
