"""Format/enrichment matrix — RAW/INLINE/WRAP × deleted/key/metadata modes,
stream routing, include/exclude filters, DDL filter, tombstone subtlety.
Mirrors the reference behaviors in `ChangeConsumer.java:147-308`."""

import pyarrow as pa
import pytest

from plugin_debezium_ray.config import (
    CaptureConfig,
    DeletedHandling,
    Format,
    KeyHandling,
    MetadataHandling,
    SplitTable,
)
from plugin_debezium_ray.envelope import envelope_schema
from plugin_debezium_ray.stages.decode import EnvelopeDecoder

PAYLOAD = [
    pa.field("repo", pa.string()),
    pa.field("path", pa.string()),
    pa.field("content", pa.string()),
]
KEYS = ("repo", "path")


def mk_envelopes(rows):
    """rows: list of dicts with op/lsn/seq/before/after/db/table/ddl."""
    sch = envelope_schema(PAYLOAD, KEYS)
    out = {f.name: [] for f in sch}
    for r in rows:
        out["lsn"].append(r.get("lsn", 1))
        out["seq"].append(r.get("seq", 0))
        out["op"].append(r.get("op"))
        out["ts_ms"].append(r.get("ts_ms", 1000))
        out["before"].append(r.get("before"))
        out["after"].append(r.get("after"))
        img = r.get("after") or r.get("before") or {}
        out["source"].append(
            {
                "version": "t",
                "connector": "t",
                "name": "t",
                "ts_ms": 1,
                "snapshot": "false",
                "db": r.get("db", "db1"),
                "table": r.get("table", "files"),
                "row": 0,
            }
        )
        out["key"].append(
            r.get("key")
            or {"repo": img.get("repo"), "path": img.get("path")}
        )
        out["transaction"].append(r.get("transaction"))
        out["ddl"].append(r.get("ddl"))
    return pa.Table.from_pydict(out, schema=sch)


ROW_A = {"repo": "r1", "path": "a.py", "content": "aaa"}
ROW_B = {"repo": "r2", "path": "b.py", "content": "bbb"}

BASIC = [
    {"op": "c", "lsn": 1, "after": ROW_A},
    {"op": "u", "lsn": 2, "before": ROW_A, "after": {**ROW_A, "content": "aa2"}},
    {"op": "d", "lsn": 3, "before": ROW_B, "key": {"repo": "r2", "path": "b.py"}},
]


def test_inline_image_choice():
    """INLINE picks before-image for deletes, after otherwise
    (`ChangeConsumer.java:250-260`)."""
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes(BASIC))
    assert out.column_names[:3] == ["repo", "path", "content"]
    assert out["content"].to_pylist() == ["aaa", "aa2", "bbb"]
    assert out["deleted"].to_pylist() == [False, False, True]


def test_truncate_sets_deleted():
    rows = [{"op": "t", "before": ROW_A, "key": {"repo": "r1", "path": "a.py"}}]
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes(rows))
    assert out["deleted"].to_pylist() == [True]


def test_deleted_modes():
    cfg_null = CaptureConfig(deleted=DeletedHandling.NULL)
    out = EnvelopeDecoder(cfg_null)(mk_envelopes(BASIC))
    assert out["deleted"].null_count == 3
    cfg_drop = CaptureConfig(deleted=DeletedHandling.DROP)
    out = EnvelopeDecoder(cfg_drop)(mk_envelopes(BASIC))
    # DROP drops only tombstones; delete ENVELOPES still flow
    # (tombstones disabled at source, AbstractDebeziumTask.java:561-562)
    assert len(out) == 3
    assert "deleted" not in out.column_names


def test_tombstone_drop_vs_keep():
    rows = BASIC + [{"op": None, "key": {"repo": "r9", "path": "x"}}]
    # tombstone (null op, no images): dropped under DROP...
    out = EnvelopeDecoder(CaptureConfig(deleted=DeletedHandling.DROP))(
        mk_envelopes(rows)
    )
    assert len(out) == 3
    # ...and under any non-RAW format regardless (non-envelope message)
    out2 = EnvelopeDecoder(CaptureConfig())(mk_envelopes(rows))
    assert len(out2) == 3


def test_deleted_field_rename():
    cfg = CaptureConfig(deleted_field_name="is_gone")
    out = EnvelopeDecoder(cfg)(mk_envelopes(BASIC))
    assert out["is_gone"].to_pylist() == [False, False, True]


def test_key_modes():
    out = EnvelopeDecoder(CaptureConfig(key=KeyHandling.DROP))(mk_envelopes(BASIC))
    assert "repo" not in out.column_names and "path" not in out.column_names
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes(BASIC))
    # delete row: key fields coalesced from the key message (addKey merge,
    # ChangeConsumer.java:276-280)
    assert out["repo"].to_pylist()[2] == "r2"


def test_metadata_modes():
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes(BASIC))
    md = out["metadata"].to_pylist()
    assert md[0]["op"] == "c" and md[2]["op"] == "d"
    assert md[1]["lsn"] == 2 and md[0]["db"] == "db1"
    out = EnvelopeDecoder(CaptureConfig(metadata=MetadataHandling.NULL))(
        mk_envelopes(BASIC)
    )
    assert out["metadata"].null_count == 3
    out = EnvelopeDecoder(CaptureConfig(metadata=MetadataHandling.DROP))(
        mk_envelopes(BASIC)
    )
    assert "metadata" not in out.column_names
    out = EnvelopeDecoder(CaptureConfig(metadata_field_name="meta2"))(
        mk_envelopes(BASIC)
    )
    assert "meta2" in out.column_names


def test_stream_routing():
    rows = [
        {"op": "c", "after": ROW_A, "db": "db1", "table": "t1"},
        {"op": "c", "after": ROW_B, "db": "db2", "table": "t2"},
    ]
    t = mk_envelopes(rows)
    out = EnvelopeDecoder(CaptureConfig(split_table=SplitTable.TABLE))(t)
    assert out["_stream"].to_pylist() == ["db1.t1", "db2.t2"]
    out = EnvelopeDecoder(CaptureConfig(split_table=SplitTable.DATABASE))(t)
    assert out["_stream"].to_pylist() == ["db1", "db2"]
    out = EnvelopeDecoder(CaptureConfig(split_table=SplitTable.OFF))(t)
    assert out["_stream"].to_pylist() == ["data", "data"]


def test_table_include_exclude():
    rows = [
        {"op": "c", "after": ROW_A, "db": "db1", "table": "keep_me"},
        {"op": "c", "after": ROW_B, "db": "db1", "table": "drop_me"},
    ]
    t = mk_envelopes(rows)
    out = EnvelopeDecoder(CaptureConfig(included_tables=[r"keep"]))(t)
    assert len(out) == 1 and out["repo"][0].as_py() == "r1"
    out = EnvelopeDecoder(CaptureConfig(excluded_tables=[r"drop"]))(t)
    assert len(out) == 1 and out["repo"][0].as_py() == "r1"


def test_column_include_exclude():
    t = mk_envelopes(BASIC)
    out = EnvelopeDecoder(CaptureConfig(excluded_columns=[r"^content$"]))(t)
    assert "content" not in out.column_names
    out = EnvelopeDecoder(
        CaptureConfig(included_columns=[r"repo|path"], key=KeyHandling.ADD_FIELD)
    )(t)
    assert "content" not in out.column_names and "repo" in out.column_names


def test_ddl_filter():
    rows = BASIC + [{"op": "ddl", "ddl": '{"action":"add_column","name":"x"}'}]
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes(rows))
    assert len(out) == 3  # ignoreDdl default (AbstractDebeziumTask.java:96-97)
    # RAW + ignore_ddl=False keeps the DDL message
    cfg = CaptureConfig(format=Format.RAW, ignore_ddl=False)
    out = EnvelopeDecoder(cfg)(mk_envelopes(rows))
    assert len(out) == 4
    # non-RAW formats drop non-envelope messages even with ignore_ddl=False
    cfg = CaptureConfig(format=Format.INLINE, ignore_ddl=False)
    out = EnvelopeDecoder(cfg)(mk_envelopes(rows))
    assert len(out) == 3


def test_raw_format():
    out = EnvelopeDecoder(CaptureConfig(format=Format.RAW))(mk_envelopes(BASIC))
    assert set(out.column_names) == {"key", "value", "deleted", "metadata", "_stream"}
    v = out["value"].to_pylist()
    assert v[0]["op"] == "c" and v[0]["after"]["content"] == "aaa"
    assert v[2]["before"]["content"] == "bbb" and v[2]["after"] is None
    assert out["key"].to_pylist()[0] == {"repo": "r1", "path": "a.py"}


def test_wrap_format():
    out = EnvelopeDecoder(CaptureConfig(format=Format.WRAP))(mk_envelopes(BASIC))
    assert "record" in out.column_names and "deleted" in out.column_names
    rec = out["record"].to_pylist()
    assert rec[0]["content"] == "aaa"
    assert out["deleted"].to_pylist() == [False, False, True]


def test_max_lsn_bound():
    out = EnvelopeDecoder(CaptureConfig(max_lsn=2))(mk_envelopes(BASIC))
    assert len(out) == 2


def test_empty_batch():
    out = EnvelopeDecoder(CaptureConfig())(mk_envelopes([]))
    assert len(out) == 0
    assert "repo" in out.column_names
