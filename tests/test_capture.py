"""Capture-to-files sink (K1/K3): per-stream Parquet output + Output
contract, mirroring the reference's per-stream file writer semantics."""

import os

import pyarrow.parquet as pq

import ray.data

from plugin_debezium_ray.config import CaptureConfig, SplitTable
from plugin_debezium_ray.pipelines.capture import capture_to_files
from plugin_debezium_ray.sources.from_table import envelopes_from_table


def _env_ds():
    import pandas as pd

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "kind": ["a", "a", "b", "b"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    return envelopes_from_table(
        ray.data.from_pandas(df),
        key_cols=("id",),
        lsn_col="id",
        payload_cols=["id", "kind", "v"],
        op_col="kind",
        op_map={},
        db="db1",
        table_col="kind",
    )


def test_split_by_table(tmp_path):
    out = capture_to_files(_env_ds(), CaptureConfig(key_cols=("id",)), str(tmp_path))
    assert out.size == 4
    assert set(out.counts) == {"db1.a", "db1.b"}
    assert out.counts["db1.a"] == 2 and out.counts["db1.b"] == 2
    t = pq.read_table(out.uris["db1.a"])
    assert set(t["id"].to_pylist()) == {1, 2}
    assert "deleted" in t.column_names and "metadata" in t.column_names


def test_split_off_single_stream(tmp_path):
    cfg = CaptureConfig(key_cols=("id",), split_table=SplitTable.OFF)
    out = capture_to_files(_env_ds(), cfg, str(tmp_path))
    assert list(out.counts) == ["data"] and out.size == 4


def test_jsonl_format_round_trip(tmp_path):
    """The reference's actual file contract is row-JSON
    (`ChangeConsumer.java:192`): format knob writes one JSON-lines dir
    per stream, values round-trip through a JSON read."""
    import glob
    import json

    out = capture_to_files(
        _env_ds(),
        CaptureConfig(key_cols=("id",)),
        str(tmp_path),
        file_format="jsonl",
    )
    assert out.size == 4
    assert set(out.counts) == {"db1.a", "db1.b"}
    rows = []
    for f in glob.glob(str(tmp_path / "db1.a" / "*.json")):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["id"] for r in rows) == [1, 2]
    assert all("deleted" in r for r in rows)
    # values match the parquet sink for the same stream
    pq_out = capture_to_files(
        _env_ds(), CaptureConfig(key_cols=("id",)), str(tmp_path / "pq")
    )
    t = pq.read_table(pq_out.uris["db1.a"])
    assert sorted(t["id"].to_pylist()) == sorted(r["id"] for r in rows)


def test_jsonl_unknown_format_rejected(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown file_format"):
        capture_to_files(
            _env_ds(), CaptureConfig(key_cols=("id",)), str(tmp_path),
            file_format="avro",  # ion/jsonl/parquet are the known trio
        )


def test_ion_serializer_scalars():
    """Ion TEXT mapping (public spec): typed scalars the reference's
    FileSerde preserves and JSON cannot — unquoted timestamps, blobs,
    exact decimals, e-notation floats, identifier/quoted field names."""
    import datetime as dt
    from decimal import Decimal

    from plugin_debezium_ray.serde import ion_dumps

    assert ion_dumps(None) == "null"
    assert ion_dumps(True) == "true" and ion_dumps(False) == "false"
    assert ion_dumps(42) == "42"
    assert ion_dumps(1.5) == "1.5e0"  # float always carries an exponent
    assert ion_dumps(float("nan")) == "nan"
    assert ion_dumps(float("inf")) == "+inf"
    assert ion_dumps(Decimal("1.50")) == "1.50"  # exact, not 1.5
    assert ion_dumps(Decimal("3")) == "3."  # decimal, not int
    # Ion decimals have no NaN/Inf — specials degrade to float notation
    # (never invalid text like "NaN."); Postgres numeric can hold NaN
    assert ion_dumps(Decimal("NaN")) == "nan"
    assert ion_dumps(Decimal("Infinity")) == "+inf"
    assert ion_dumps(Decimal("-Infinity")) == "-inf"
    assert ion_dumps('a"b\n') == '"a\\"b\\n"'
    naive = dt.datetime(2026, 8, 17, 10, 30, 0, 250000)
    assert ion_dumps(naive) == "2026-08-17T10:30:00.25-00:00"
    utc = dt.datetime(2026, 8, 17, 10, 30, tzinfo=dt.timezone.utc)
    assert ion_dumps(utc) == "2026-08-17T10:30:00Z"
    assert ion_dumps(dt.date(2026, 8, 17)) == "2026-08-17"
    assert ion_dumps(b"\x01\x02") == "{{AQI=}}"
    assert ion_dumps({"ok_name": 1, "needs quote": 2}) == (
        '{ok_name:1,"needs quote":2}'
    )
    assert ion_dumps([1, None, "x"]) == '[1,null,"x"]'
    # keyword field names must be quoted
    assert ion_dumps({"null": 1}) == '{"null":1}'


def test_ion_format_sink(tmp_path):
    """`file_format="ion"` writes one Ion-text dir per stream with the
    same rows as the parquet sink."""
    import glob
    import re

    out = capture_to_files(
        _env_ds(),
        CaptureConfig(key_cols=("id",)),
        str(tmp_path),
        file_format="ion",
    )
    assert out.size == 4
    assert set(out.counts) == {"db1.a", "db1.b"}
    text = ""
    for f in glob.glob(str(tmp_path / "db1.a" / "*.ion")):
        text += open(f).read()
    ids = sorted(int(m) for m in re.findall(r"\bid:(\d+)", text))
    assert ids == [1, 2]
    assert "deleted:" in text


def test_ion_sink_round_trips_logical_type_matrix(tmp_path):
    """The full 14-logical-type decode matrix through the REAL Ion
    datasink and back (the FileSerde row contract,
    `ChangeConsumer.java:192`): date/timestamp/decimal/blob round-trip
    as native Ion typed scalars; time/duration/interval — which Ion has
    no native type for — map to ISO-8601 strings (the Jackson-Ion
    java.time convention)."""
    import datetime as dt
    import glob
    from decimal import Decimal

    import pyarrow as pa

    from plugin_debezium_ray.pipelines.capture import _make_ion_datasink
    from plugin_debezium_ray.serde import ion_loads
    from plugin_debezium_ray.stages.types import DECODERS

    raw = {
        "date": (pa.int32(), 19000),
        "time": (pa.int32(), 3_600_000),
        "micro_time": (pa.int64(), 3_600_000_000),
        "nano_time": (pa.int64(), 3_600_000_000_000),
        "timestamp": (pa.int64(), 86_400_000),
        "micro_timestamp": (pa.int64(), 86_400_000_000),
        "nano_timestamp": (pa.int64(), 86_400_000_000_000),
        "micro_duration": (pa.int64(), 5_000_000),
        "nano_duration": (pa.int64(), 5_000_000_000),
        "year": (pa.int32(), 2022),
        "zoned_timestamp": (pa.string(), "2022-01-08T01:02:03.000004+02:00"),
        "zoned_time": (pa.string(), "03:02:03+02:00"),
        "decimal": (pa.string(), "123.456"),
        "interval": (pa.string(), "P1Y2M3DT4H5M6S"),
    }
    cols: dict = {"id": pa.array([1, 2], pa.int64())}
    for name, (typ, v) in raw.items():
        cols[name] = DECODERS[name](pa.array([v, None], type=typ))
    cols["blob"] = pa.array([b"\x01\x02", None], pa.binary())
    ray.data.from_arrow(pa.table(cols)).write_datasink(
        _make_ion_datasink(str(tmp_path))
    )

    rows = []
    for f in sorted(glob.glob(str(tmp_path / "*.ion"))):
        with open(f) as fh:
            rows.extend(ion_loads(line) for line in fh.read().splitlines())
    rows.sort(key=lambda r: r["id"])
    assert len(rows) == 2
    full, nulls = rows
    assert full["date"] == dt.date(2022, 1, 8)
    assert full["year"] == dt.date(2022, 1, 1)
    assert full["timestamp"] == dt.datetime(1970, 1, 2)  # naive, -00:00
    assert full["micro_timestamp"] == dt.datetime(1970, 1, 2)
    assert full["nano_timestamp"] == dt.datetime(1970, 1, 2)
    assert full["zoned_timestamp"] == dt.datetime(
        2022, 1, 7, 23, 2, 3, 4, tzinfo=dt.timezone.utc
    )
    assert full["decimal"] == Decimal("123.456000000")
    assert full["blob"] == b"\x01\x02"
    # Ion-typeless logicals land as ISO-8601 strings
    assert full["time"] == "01:00:00"
    assert full["micro_time"] == "01:00:00"
    assert full["nano_time"] == "01:00:00"
    assert full["zoned_time"] == "01:02:03"  # normalized to UTC on decode
    assert full["micro_duration"] == "PT5S"
    assert full["nano_duration"] == "PT5S"
    assert full["interval"] == "P14M3DT14706.000000000S"
    # null passthrough on every column
    assert all(nulls[k] is None for k in raw)
    assert nulls["blob"] is None


def test_ion_round_trip_property():
    """Property: ion_loads(ion_dumps(v)) == v over random nested values
    (hypothesis; the reader exists precisely so the sink isn't
    write-only-tested)."""
    import datetime as dt
    import math
    from decimal import Decimal

    from hypothesis import given, settings, strategies as st

    from plugin_debezium_ray.serde import ion_dumps, ion_loads

    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False),  # NaN breaks == comparison, not parse
        st.text(max_size=40),
        st.binary(max_size=24),
        st.decimals(allow_nan=False, allow_infinity=False, places=6),
        st.datetimes(
            min_value=dt.datetime(1, 1, 2),  # year-0 strftime quirk
            timezones=st.just(dt.timezone.utc) | st.none(),
        ),
    )
    values = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.text(max_size=12), inner, max_size=4),
        ),
        max_leaves=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(values)
    def check(v):
        out = ion_loads(ion_dumps(v))
        assert _eq(out, v), (v, ion_dumps(v), out)

    def _eq(a, b):
        if isinstance(a, float) and isinstance(b, float):
            return (a == b) or (math.isnan(a) and math.isnan(b))
        if isinstance(a, Decimal) and isinstance(b, Decimal):
            return a == b and a.as_tuple().exponent == b.as_tuple().exponent
        if isinstance(a, list) and isinstance(b, (list, tuple)):
            return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
        if isinstance(a, dict) and isinstance(b, dict):
            return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
        return a == b and type(a) is type(b)

    check()


def test_ion_sink_round_trip(tmp_path):
    """The .ion files written by the sink parse back to the same rows."""
    import glob

    from plugin_debezium_ray.serde import ion_loads_lines

    out = capture_to_files(
        _env_ds(),
        CaptureConfig(key_cols=("id",)),
        str(tmp_path),
        file_format="ion",
    )
    rows = []
    for f in glob.glob(str(tmp_path / "db1.a" / "*.ion")):
        rows += ion_loads_lines(open(f).read())
    assert out.counts["db1.a"] == len(rows)
    assert sorted(r["id"] for r in rows) == [1, 2]
    assert all(isinstance(r["deleted"], bool) for r in rows)


def test_capture_to_ion_e2e_full_logical_matrix(tmp_path):
    """END-TO-END K1 with the full 14-logical-type matrix: raw
    envelopes (source-typed ints/strings) → capture_to_files(
    file_format="ion", type_hints=...) → read the per-stream .ion files
    back and assert Ion-typed scalars — `MapConverterTest.java:27-86`
    driven through the whole capture path, not just the datasink.  The
    logical conversion runs INSIDE the pipeline (type_hints), mirroring
    the reference where the embedded engine converts before the
    consumer serializes (`MapConverter.java:56-96`)."""
    import datetime as dt
    import glob
    from decimal import Decimal

    import pandas as pd
    import pyarrow as pa

    from plugin_debezium_ray.serde import ion_loads

    raw = {
        "date": (pa.int32(), 19000),
        "time": (pa.int32(), 3_600_000),
        "micro_time": (pa.int64(), 3_600_000_000),
        "nano_time": (pa.int64(), 3_600_000_000_000),
        "ts": (pa.int64(), 86_400_000),
        "micro_ts": (pa.int64(), 86_400_000_000),
        "nano_ts": (pa.int64(), 86_400_000_000_000),
        "micro_dur": (pa.int64(), 5_000_000),
        "nano_dur": (pa.int64(), 5_000_000_000),
        "year": (pa.int32(), 2022),
        "zoned_ts": (pa.string(), "2022-01-08T01:02:03.000004+02:00"),
        "zoned_time": (pa.string(), "03:02:03+02:00"),
        "dec": (pa.string(), "123.456"),
        "interval": (pa.string(), "P1Y2M3DT4H5M6S"),
    }
    hints = {
        "date": "date", "time": "time", "micro_time": "micro_time",
        "nano_time": "nano_time", "ts": "timestamp",
        "micro_ts": "micro_timestamp", "nano_ts": "nano_timestamp",
        "micro_dur": "micro_duration", "nano_dur": "nano_duration",
        "year": "year", "zoned_ts": "zoned_timestamp",
        "zoned_time": "zoned_time", "dec": "decimal",
        "interval": "interval",
    }
    cols: dict = {"id": pa.array([1, 2], pa.int64())}
    for name, (typ, v) in raw.items():
        cols[name] = pa.array([v, None], type=typ)
    cols["blob"] = pa.array([b"\x01\x02", None], pa.binary())
    env = envelopes_from_table(
        ray.data.from_arrow(pa.table(cols)),
        key_cols=("id",),
        lsn_col="id",
        payload_cols=["id"] + list(raw) + ["blob"],
        default_op="c",
        db="db1",
        table="typed",
    )
    out = capture_to_files(
        env, CaptureConfig(key_cols=("id",)), str(tmp_path),
        file_format="ion", type_hints=hints,
    )
    assert out.size == 2
    rows = []
    for d in out.uris.values():
        for f in sorted(glob.glob(os.path.join(d, "*.ion"))):
            with open(f) as fh:
                rows.extend(ion_loads(ln) for ln in fh.read().splitlines())
    rows.sort(key=lambda r: r["id"])
    assert len(rows) == 2
    full, nulls = rows
    assert full["date"] == dt.date(2022, 1, 8)
    assert full["year"] == dt.date(2022, 1, 1)
    assert full["ts"] == dt.datetime(1970, 1, 2)
    assert full["micro_ts"] == dt.datetime(1970, 1, 2)
    assert full["nano_ts"] == dt.datetime(1970, 1, 2)
    assert full["zoned_ts"] == dt.datetime(
        2022, 1, 7, 23, 2, 3, 4, tzinfo=dt.timezone.utc)
    assert full["dec"] == Decimal("123.456000000")
    assert full["blob"] == b"\x01\x02"
    assert full["time"] == "01:00:00"
    assert full["micro_time"] == "01:00:00"
    assert full["nano_time"] == "01:00:00"
    assert full["zoned_time"] == "01:02:03"
    assert full["micro_dur"] == "PT5S"
    assert full["nano_dur"] == "PT5S"
    assert full["interval"] == "P14M3DT14706.000000000S"
    assert all(nulls[k] is None for k in list(raw) + ["blob"])
