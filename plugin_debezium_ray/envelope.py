"""Change-event envelope model — the Arrow shape of one CDC event.

Mirrors the reference envelope
(`/root/reference/plugin-debezium/src/main/java/io/kestra/plugin/debezium/models/Envelope.java:19-57`)
and the source descriptor (`models/Message.java:19-67`), flattened into a
columnar Arrow schema suitable for zero-copy ``map_batches``:

    lsn:int64, seq:int64, op:string, ts_ms:int64,
    before:struct<payload>?, after:struct<payload>?,
    source:struct<version,connector,name,ts_ms,snapshot,db,table,row>,
    key:struct<key cols>, transaction:struct<id,total_order>?,
    ddl:string?   (schema-change payload; op='ddl' rows only)

Operation codes come from io.debezium.data.Envelope.Operation
(round-tripped by `Envelope.java:39-46`): c=create, u=update, d=delete,
r=read (snapshot), t=truncate, m=message.  We add 'ddl' as the op code of
schema-change events (the reference carries these as non-envelope messages,
filtered by `ignoreDdl` at `ChangeConsumer.java:196-199`).

Total event order is ``(lsn, seq)``; ordering is only *required* per
primary key (the shardability insight, SURVEY.md §2.6).
"""

from __future__ import annotations

import pyarrow as pa

OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_READ = "r"  # snapshot row
OP_TRUNCATE = "t"
OP_MESSAGE = "m"
OP_DDL = "ddl"  # schema-change event (non-envelope message in the reference)

#: ops that populate ``after`` (Envelope semantics, SURVEY.md §1.1)
AFTER_OPS = (OP_CREATE, OP_UPDATE, OP_READ)
#: ops that populate ``before`` — deletes carry a FULL before-row because
#: tombstones are disabled at the source (AbstractDebeziumTask.java:561-562)
BEFORE_OPS = (OP_UPDATE, OP_DELETE)
#: ops that mark the row deleted (ChangeConsumer.java:262-274)
DELETED_OPS = (OP_DELETE, OP_TRUNCATE)


def source_struct() -> pa.StructType:
    """`Message.Source` — Message.java:40-67 (Mongo `collection` is aliased
    onto `table` at :63-66; we only ever carry `table`)."""
    return pa.struct(
        [
            pa.field("version", pa.string()),
            pa.field("connector", pa.string()),
            pa.field("name", pa.string()),
            pa.field("ts_ms", pa.int64()),
            pa.field("snapshot", pa.string()),  # "true"/"false"/"last"
            pa.field("db", pa.string()),
            pa.field("table", pa.string()),
            pa.field("row", pa.int64()),
        ]
    )


def transaction_struct() -> pa.StructType:
    """`Envelope.transaction` — Envelope.java:36-37."""
    return pa.struct(
        [pa.field("id", pa.string()), pa.field("total_order", pa.int64())]
    )


def envelope_schema(
    payload_fields: list[pa.Field] | pa.Schema,
    key_cols: tuple[str, ...],
) -> pa.Schema:
    """Build the envelope Arrow schema for a given payload row shape."""
    if isinstance(payload_fields, pa.Schema):
        payload_fields = list(payload_fields)
    payload = pa.struct(payload_fields)
    by_name = {f.name: f for f in payload_fields}
    key = pa.struct([pa.field(k, by_name[k].type) for k in key_cols])
    return pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("seq", pa.int64()),
            pa.field("op", pa.string()),
            pa.field("ts_ms", pa.int64()),
            pa.field("before", payload),
            pa.field("after", payload),
            pa.field("source", source_struct()),
            pa.field("key", key),
            pa.field("transaction", transaction_struct()),
            pa.field("ddl", pa.string()),
        ]
    )


def payload_fields_of(envelope: pa.Schema) -> list[pa.Field]:
    """Extract the payload row fields from an envelope schema."""
    t = envelope.field("after").type
    return [t.field(i) for i in range(t.num_fields)]
