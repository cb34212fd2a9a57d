"""Adapter: derive an envelope stream from an existing keyed Parquet table.

Plays the role of a connector over a concrete database table (S2-S7 in
SURVEY.md §2.1): each input row becomes one change event, with the op code
derived deterministically from a column value.  Used by the driver-facing
queries so the resulting pipelines have an exact DuckDB-SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from plugin_debezium_ray.envelope import OP_DELETE, envelope_schema


def envelopes_from_table(
    ds: "ray.data.Dataset",
    *,
    key_cols: tuple[str, ...],
    lsn_col: str,
    payload_cols: list[str],
    op_col: str | None = None,
    op_map: dict[str, str] | None = None,
    default_op: str = "u",
    db: str = "testdb",
    table: str = "events",
    table_col: str | None = None,
    seq_col: str | None = None,
) -> "ray.data.Dataset":
    """One envelope per row: op from ``op_map[row[op_col]]`` (else
    ``default_op``), lsn from ``lsn_col``, full after image (before =
    null; delete events get before=image, after=null — full before-row as
    with tombstones disabled, `AbstractDebeziumTask.java:561-562`)."""

    def to_env(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if op_col is not None and op_map is not None:
            raw = batch[op_col].to_numpy(zero_copy_only=False).astype(object)
            ops = np.array([op_map.get(v, default_op) for v in raw], dtype=object)
        else:
            ops = np.full(n, default_op, dtype=object)
        is_del = pa.array(ops == OP_DELETE)

        pfields = [pa.field(c, batch.schema.field(c).type) for c in payload_cols]
        img_cols = [batch[c].combine_chunks() for c in payload_cols]
        after = pa.StructArray.from_arrays(img_cols, fields=pfields, mask=is_del)
        before = pa.StructArray.from_arrays(
            img_cols, fields=pfields, mask=pc.invert(is_del)
        )
        key = pa.StructArray.from_arrays(
            [batch[c].combine_chunks() for c in key_cols], names=list(key_cols)
        )
        lsn = pc.cast(batch[lsn_col], pa.int64()).combine_chunks()
        seq = (
            pc.cast(batch[seq_col], pa.int64()).combine_chunks()
            if seq_col
            else pa.array(np.zeros(n, dtype=np.int64))
        )
        ts = lsn
        table_arr = (
            pc.cast(batch[table_col], pa.string()).combine_chunks()
            if table_col
            else pa.array([table] * n)
        )
        src = pa.StructArray.from_arrays(
            [
                pa.array(["0.1.0"] * n),
                pa.array(["table"] * n),
                pa.array(["kestra_sim"] * n),
                ts,
                pa.array(["false"] * n),
                pa.array([db] * n),
                table_arr,
                pa.nulls(n, pa.int64()),
            ],
            names=["version", "connector", "name", "ts_ms", "snapshot", "db", "table", "row"],
        )
        sch = envelope_schema(pfields, key_cols)
        return pa.Table.from_arrays(
            [
                lsn,
                seq,
                pa.array(ops, type=pa.string()),
                ts,
                before,
                after,
                src,
                key,
                pa.nulls(n, sch.field("transaction").type),
                pa.nulls(n, pa.string()),
            ],
            schema=sch,
        )

    return ds.map_batches(to_env, batch_format="pyarrow")
