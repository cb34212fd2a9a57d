"""Logical-type decode matrix — port of the reference's parameterized
MapConverterTest (`MapConverterTest.java:27-86`) to the Arrow stage."""

import datetime as dt
from decimal import Decimal

import pyarrow as pa
import pytest

from plugin_debezium_ray.stages.types import DECODERS, logical_decoder


@pytest.mark.parametrize(
    "logical,raw_type,raw,expected",
    [
        ("date", pa.int32(), 19000, dt.date(2022, 1, 8)),
        ("date", pa.int32(), 0, dt.date(1970, 1, 1)),
        ("time", pa.int32(), 3_600_000, dt.time(1, 0, 0)),
        ("micro_time", pa.int64(), 3_600_000_000, dt.time(1, 0, 0)),
        ("nano_time", pa.int64(), 3_600_000_000_000, dt.time(1, 0, 0)),
        ("timestamp", pa.int64(), 86_400_000, dt.datetime(1970, 1, 2)),
        ("micro_timestamp", pa.int64(), 86_400_000_000, dt.datetime(1970, 1, 2)),
        ("nano_timestamp", pa.int64(), 86_400_000_000_000, dt.datetime(1970, 1, 2)),
        ("micro_duration", pa.int64(), 5_000_000, dt.timedelta(seconds=5)),
        ("nano_duration", pa.int64(), 5_000_000_000, dt.timedelta(seconds=5)),
        ("year", pa.int32(), 2022, dt.date(2022, 1, 1)),
        (
            "zoned_timestamp",
            pa.string(),
            "2022-01-08T01:02:03.000004+02:00",
            dt.datetime(2022, 1, 7, 23, 2, 3, 4, tzinfo=dt.timezone.utc),
        ),
        ("zoned_time", pa.string(), "01:02:03+00:00", dt.time(1, 2, 3)),
        ("zoned_time", pa.string(), "03:02:03+02:00", dt.time(1, 2, 3)),
        ("decimal", pa.string(), "123.456", Decimal("123.456000000")),
    ],
)
def test_decode_matrix(logical, raw_type, raw, expected):
    col = pa.array([raw, None], type=raw_type)
    out = DECODERS[logical](col)
    assert out[0].as_py() == expected
    # null passthrough (MapConverter.java:49-51)
    assert out[1].as_py() is None


def test_interval_period():
    col = pa.array(["P1Y2M3DT4H5M6S", "P2W", None])
    out = DECODERS["interval"](col)
    v = out[0].as_py()
    assert (v.months, v.days) == (14, 3)
    assert v.nanoseconds == 4 * 3600_000_000_000 + 5 * 60_000_000_000 + 6_000_000_000
    assert out[1].as_py().days == 14
    assert out[2].as_py() is None


def test_default_substitution():
    """null + schema default → default (MapConverter.java:45-47,
    MapConverterTest.java:76)."""
    fn = logical_decoder({"d": "date"}, defaults={"d": 19000, "x": 7})
    t = pa.table({"d": pa.array([None, 0], type=pa.int32()),
                  "x": pa.array([None, 1], type=pa.int32())})
    out = fn(t)
    assert out["d"][0].as_py() == dt.date(2022, 1, 8)
    assert out["x"][0].as_py() == 7


def test_primitive_passthrough_and_nested():
    """Primitives, bytes, arrays, maps, structs stay native Arrow —
    the MAP-with-int-keys 'array encoding' hack (`MapConverter.java:191-226`)
    is unnecessary: Arrow maps support non-string keys natively."""
    t = pa.table(
        {
            "i8": pa.array([1], pa.int8()),
            "b": pa.array([b"\x01"], pa.binary()),
            "arr": pa.array([[1, 2]], pa.list_(pa.int32())),
            "m": pa.array([[(1, 2)]], pa.map_(pa.int32(), pa.int32())),
            "s": pa.array([{"a": "x", "b": 1}],
                          pa.struct([("a", pa.string()), ("b", pa.int32())])),
        }
    )
    out = logical_decoder({})(t)
    assert out.equals(t)
