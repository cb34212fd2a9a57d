"""Slowly-changing-dimension (SCD type 2) materialization of a change
log — the row-versioned history complement of the LWW "latest state"
apply (``stages/apply.py``).

Reference parity note: the reference (kestra-io/plugin-debezium)
emits the raw change stream and leaves history materialization to the
consumer; SCD2 is the standard warehouse consumption of that stream
(Kimball type-2 dimension), so it belongs in the engine's query
surface next to the LWW apply.  Semantics: events for a key, ordered
by the change LSN, each open a version valid over
``[lsn, next_event_lsn)``; the NEXT event (update OR delete) closes
it; delete events close their predecessor but emit no version row;
``is_current`` marks rows whose interval is still open.

Shape (the only scale-relevant decision): ONE hash-co-partition
shuffle on the key — each partition holds MANY complete key groups —
then a single vectorized sort + grouped ``shift(-1)`` per partition
(pandas C kernels, never a per-key loop), mirroring
``asof_join_shuffle``'s measured-and-kept design
(``functions/joins.py``).  Partitioning assumption: one hash
partition must fit a task — raise ``num_partitions`` with the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .selection import group_key_hash64


def _combined_key_hash(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Block-stable uint64 hash over one or more key columns (nulls
    form their own group, as SQL ``PARTITION BY`` does).  Multi-column
    keys fold lane-wise with an odd-constant multiply so (a, b) and
    (b, a) land apart."""
    h = group_key_hash64(t[key_cols[0]]).astype(np.uint64, copy=False)
    for c in key_cols[1:]:
        h = h * np.uint64(0x9E3779B97F4A7C15) + group_key_hash64(
            t[c]
        ).astype(np.uint64, copy=False)
    return h


def scd2_history(
    ds: "ray.data.Dataset",
    *,
    key_cols: "str | list[str]",
    order_col: str,
    deleted_col: "str | None" = None,
    is_current_col: str = "is_current",
    valid_to_col: str = "valid_to",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Materialize SCD2 version rows from a change log.

    Output = input columns (minus ``deleted_col``) + ``valid_to``
    (same type as ``order_col``, null while current) + ``is_current``
    (bool).  ``order_col`` doubles as ``valid_from``.  Rows whose
    ``deleted_col`` is true close the preceding version and are
    dropped.  Ties on ``(key, order)`` are resolved by stable input
    order within a partition and are NOT deterministic across runs —
    a change log has unique LSNs per key; dedupe upstream otherwise
    (same contract as ``asof_join_shuffle``).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], pa.int32()))
        part = (
            _combined_key_hash(t, keys) % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    # one eager schema fetch (materialize() a lazy input whose upstream
    # is expensive first — a lazy schema() runs a limit-1 plan of the
    # whole upstream, same contract as asof_join_shuffle)
    sch = ds.schema()
    data_cols = [c for c in sch.names if c != deleted_col]
    out_cols = data_cols + [valid_to_col, is_current_col]

    def _arrow_type(tp):
        if isinstance(tp, pa.DataType):
            return tp
        try:  # pandas-block Datasets report numpy dtypes here
            return pa.from_numpy_dtype(tp)
        except (TypeError, NotImplementedError, pa.ArrowNotImplementedError):
            return None

    _types = {n: _arrow_type(t) for n, t in zip(sch.names, sch.types)}

    def empty_out() -> "pa.Table | None":
        if any(_types.get(c) is None for c in data_cols):
            return None
        cols = {c: pa.array([], type=_types[c]) for c in data_cols}
        cols[valid_to_col] = pa.array([], type=_types[order_col])
        cols[is_current_col] = pa.array([], type=pa.bool_())
        return pa.table(cols)

    def per_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # keep the OUTPUT schema on empty blocks (input-schema or
            # schema-less empties would otherwise leak through)
            seed = empty_out()
            if seed is not None:
                return seed
            if set(out_cols) <= set(t.column_names):
                return t.select(out_cols)
            return t
        t = t.drop_columns(["_part"])
        # sort by (key..., order) — Arrow table sort is stable and
        # EXACT (a pandas detour coerces nullable int64 to float64,
        # collapsing keys/LSNs above 2^53); null keys sort first
        order = pc.sort_indices(
            t.select(keys + [order_col]),
            sort_keys=[(c, "ascending") for c in keys]
            + [(order_col, "ascending")],
            null_placement="at_start",
        )
        t = t.take(order)
        # run boundaries: dictionary-encode each SORTED key column
        # (exact value identity — NaNs share a slot, nulls -> -1, one
        # group each) and mark where any code changes
        new_run = np.zeros(t.num_rows, dtype=bool)
        for c in keys:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.chunk(0) if col.num_chunks == 1 \
                    else col.combine_chunks()
            codes = pc.fill_null(
                pc.dictionary_encode(col).indices, -1
            ).to_numpy(zero_copy_only=False)
            new_run[1:] |= codes[1:] != codes[:-1]
        # lead(order) within runs: shift the SORTED order column up by
        # one; the last row of each run (next row starts a new run, or
        # end of partition) stays null
        ov = t[order_col].combine_chunks()
        has_next = np.zeros(t.num_rows, dtype=bool)
        has_next[:-1] = ~new_run[1:]
        lead_idx = np.arange(1, t.num_rows + 1, dtype=np.int64)
        lead_idx[-1] = 0  # masked anyway
        idx = pa.array(
            np.where(has_next, lead_idx, 0), type=pa.int64(),
            mask=~has_next,
        )
        valid_to = pc.take(ov, idx)
        current = pc.is_null(valid_to)
        t = t.append_column(valid_to_col, valid_to)
        t = t.append_column(is_current_col, current)
        if deleted_col is not None:
            keep = pc.fill_null(
                pc.cast(t[deleted_col], pa.bool_()), False
            )
            t = t.filter(pc.invert(keep))
        return t.select(out_cols)

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    seed = empty_out()
    if seed is not None:
        # schema seed: an EMPTY grouped result has zero blocks (the
        # map_groups UDF never runs), which would surface as a
        # zero-column Dataset — union one typed empty block so the
        # output contract holds on an empty changelog
        out = out.union(ray.data.from_arrow(seed))
    return out
