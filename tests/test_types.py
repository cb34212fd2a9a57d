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


# ----------------------------------------------------- nested recursion
# Port of the complex/default rows of MapConverterTest.java:27-86 plus
# the recursive ARRAY/MAP/STRUCT contract of MapConverter.java:181-244.

from plugin_debezium_ray.stages.nested import (  # noqa: E402
    ConnectSchema as S,
    convert_value,
    decode_column,
    nested_decoder,
)


class TestConvertValueMatrix:
    @pytest.mark.parametrize(
        "schema,value,expected",
        [
            # primitives (MapConverterTest "primitive" rows)
            (S.primitive("int8"), 8, 8),
            (S.primitive("int16"), 16, 16),
            (S.primitive("int32"), 32, 32),
            (S.primitive("int64"), 64, 64),
            (S.primitive("float32"), 32.0, 32.0),
            (S.primitive("float64"), 64.0, 64.0),
            (S.primitive("boolean"), True, True),
            (S.primitive("string"), "test", "test"),
            (S.primitive("bytes"), b"test", b"test"),
            (S.primitive("bytes"), bytearray(b"test"), b"test"),  # ByteBuffer row
            # complex (MapConverterTest "complex" rows)
            (S.array(S.primitive("int32")), [1, 2, 3], [1, 2, 3]),
            (
                S.map_(S.primitive("string"), S.primitive("int32")),
                {"a": 1, "b": 2, "c": 3},
                {"a": 1, "b": 2, "c": 3},
            ),
            (
                S.struct([("a", S.primitive("string")), ("b", S.primitive("int32"))]),
                {"a": "test", "b": 32},
                {"a": "test", "b": 32},
            ),
            # non-string-key map → array encoding (MapConverter.java:191-226)
            (
                S.map_(S.primitive("int32"), S.primitive("string")),
                {1: "x", 2: "y"},
                [[1, "x"], [2, "y"]],
            ),
            # logical types at depth
            (
                S.array(S.logical("date", "int32")),
                [0, 1],
                [dt.date(1970, 1, 1), dt.date(1970, 1, 2)],
            ),
            (
                S.struct([("d", S.logical("micro_timestamp", "int64"))]),
                {"d": 86_400_000_000},
                {"d": dt.datetime(1970, 1, 2, tzinfo=dt.timezone.utc)},
            ),
            # default substitution (MapConverterTest "default" row)
            (S.primitive("int32", default=32), None, 32),
            # logical scalar rows (schema-name dispatch before base type)
            (S.logical("date", "int32"), 18175, dt.date(2019, 10, 6)),
            (S.logical("year", "int32"), 2020, dt.date(2020, 1, 1)),
            (S.logical("micro_duration", "int64"), 5_000_000,
             dt.timedelta(seconds=5)),
            (S.logical("zoned_time", "string"), "18:27:49+00:00",
             dt.time(18, 27, 49, tzinfo=dt.timezone.utc)),
            (S.logical("decimal", "int32"), 12, Decimal("12")),
        ],
    )
    def test_matrix(self, schema, value, expected):
        assert convert_value(schema, value) == expected

    def test_null_semantics(self):
        # MapConverter.java:39-54: null+no-schema → null; null+optional →
        # null; null+default → converted default; null+required → error
        assert convert_value(None, None) is None
        assert convert_value(S.primitive("int32"), None) is None
        assert convert_value(
            S.logical("date", "int32", default=1), None
        ) == dt.date(1970, 1, 2)
        with pytest.raises(ValueError, match="required"):
            convert_value(S.primitive("int32", optional=False), None)

    def test_strict_mismatches(self):
        with pytest.raises(ValueError, match="Invalid type"):
            convert_value(S.logical("date", "int32"), "not-an-int")
        with pytest.raises(ValueError, match="Invalid type"):
            convert_value(S.primitive("string"), 5)
        with pytest.raises(ValueError, match="Mismatching schema"):
            convert_value(
                S.struct([("a", S.primitive("int32"))]), {"a": 1, "zz": 2}
            )

    def test_schemaless_inference(self):
        # schema == null → infer from the value (ConnectSchema.schemaType)
        assert convert_value(None, {"a": [1, 2]}) == {"a": [1, 2]}
        with pytest.raises(ValueError, match="does not have corresponding"):
            convert_value(None, object())


class TestDecodeColumnRecursive:
    """Vectorized column recursion == row recursion, at every depth."""

    CASES = [
        (
            pa.array([[1, 2], [0], None], type=pa.list_(pa.int32())),
            S.array(S.logical("date", "int32")),
        ),
        (
            pa.array(
                [{"x": 5, "d": 10}, {"x": None, "d": 20}, None],
                type=pa.struct([("x", pa.int64()), ("d", pa.int32())]),
            ),
            S.struct([("x", S.primitive("int64")),
                      ("d", S.logical("date", "int32"))]),
        ),
        (
            pa.array(
                [[{"d": 1}], []],
                type=pa.list_(pa.struct([("d", pa.int32())])),
            ),
            S.array(S.struct([("d", S.logical("date", "int32"))])),
        ),
    ]

    @pytest.mark.parametrize("arr,schema", CASES)
    def test_column_matches_row_api(self, arr, schema):
        got = decode_column(arr, schema).to_pylist()
        want = [convert_value(schema, v) for v in arr.to_pylist()]

        def norm(v):
            # row API gives tz-aware datetimes; arrow timestamps naive-UTC
            if isinstance(v, dt.datetime):
                return v.replace(tzinfo=None)
            if isinstance(v, list):
                return [norm(x) for x in v]
            if isinstance(v, dict):
                return {k: norm(x) for k, x in v.items()}
            return v

        assert got == [norm(w) for w in want]

    def test_null_map_stays_null(self):
        # MapArray.from_arrays drops validity (pyarrow 16 has no mask=);
        # a null (optional) map must NOT silently become an empty map {}.
        # Mirrors the reference MapConverter's null passthrough.
        m = pa.array(
            [[("a", 1)], None, []], type=pa.map_(pa.string(), pa.int64())
        )
        out = decode_column(
            m, S.map_(S.primitive("string"), S.primitive("int64"))
        )
        assert out.null_count == 1
        assert out.to_pylist() == [[("a", 1)], None, []]
        # nested: map inside a struct keeps both validity layers
        sarr = pa.array(
            [{"m": [("k", 1)]}, {"m": None}, None],
            type=pa.struct([("m", pa.map_(pa.string(), pa.int64()))]),
        )
        sout = decode_column(
            sarr,
            S.struct([("m", S.map_(S.primitive("string"),
                                   S.primitive("int64")))]),
        )
        assert sout.null_count == 1
        assert sout.to_pylist() == [{"m": [("k", 1)]}, {"m": None}, None]

    def test_arrow_map_non_string_keys_native(self):
        # Arrow maps carry non-string keys natively — no array-encoding
        # hack needed in the columnar path (SURVEY.md §1.4)
        m = pa.array(
            [[(1, "a"), (2, "b")], []], type=pa.map_(pa.int32(), pa.string())
        )
        out = decode_column(m, S.map_(S.primitive("int32"), S.primitive("string")))
        assert out.to_pylist() == [[(1, "a"), (2, "b")], []]

    def test_missing_struct_field_default_and_required(self):
        arr = pa.array([{"x": 1}], type=pa.struct([("x", pa.int64())]))
        out = decode_column(
            arr,
            S.struct([("x", S.primitive("int64")),
                      ("y", S.primitive("int32", default=9))]),
        )
        assert out.to_pylist() == [{"x": 1, "y": 9}]
        with pytest.raises(ValueError, match="required"):
            decode_column(
                arr,
                S.struct([("x", S.primitive("int64")),
                          ("y", S.primitive("int32", optional=False))]),
            )

    def test_strict_struct_extra_field(self):
        arr = pa.array([{"x": 1}], type=pa.struct([("x", pa.int64())]))
        with pytest.raises(ValueError, match="Mismatching schema"):
            decode_column(arr, S.struct([("z", S.primitive("int64"))]))


class TestPgsqlTypesShapedFixture:
    """A `pgsql_types`-shaped payload (reference fixture
    `/root/reference/data/postgres.sql:28-52`): int arrays, nested text
    arrays, a composite (struct) column, interval/tz types, bytea —
    decoded through the vectorized recursion in one map_batches-shaped
    call."""

    def test_round_trip(self):
        n = 3
        tbl = pa.table(
            {
                "concert_id": pa.array([1, 2, 3], pa.int32()),
                "available": pa.array([True, False, True]),
                "numeric_test": pa.array(["12.5", "0.25", "9"], pa.string()),
                "date_type": pa.array([19000, 0, 1], pa.int32()),
                "timez_type": pa.array(
                    ["03:02:03+02:00", "01:00:00+00:00", "23:59:59+00:00"]
                ),
                "timestampz_type": pa.array(
                    ["2019-10-06T18:27:49Z"] * n
                ),
                "interval_type": pa.array(["P1Y2M3D", "PT5S", "P2Y"]),
                "pay_by_quarter": pa.array(
                    [[100, 200], [300], []], pa.list_(pa.int32())
                ),
                "schedule": pa.array(
                    [[["a", "b"], ["c"]], [], [["d"]]],
                    pa.list_(pa.list_(pa.string())),
                ),
                "item": pa.array(
                    [{"name": "w", "supplier_id": 1, "price": 4.5}] * n,
                    pa.struct([("name", pa.string()),
                               ("supplier_id", pa.int32()),
                               ("price", pa.float64())]),
                ),
                "blob_type": pa.array([b"\x01\x02", b"", b"\xff"]),
            }
        )
        hints = {
            "numeric_test": S.logical("decimal", "string"),
            "date_type": S.logical("date", "int32"),
            "timez_type": S.logical("zoned_time", "string"),
            "timestampz_type": S.logical("zoned_timestamp", "string"),
            "interval_type": S.logical("interval", "string"),
            "pay_by_quarter": S.array(S.primitive("int32")),
            "schedule": S.array(S.array(S.primitive("string"))),
            "item": S.struct([("name", S.primitive("string")),
                              ("supplier_id", S.primitive("int32")),
                              ("price", S.primitive("float64"))]),
            "blob_type": S.primitive("bytes"),
        }
        out = nested_decoder(hints)(tbl)
        assert out["date_type"].to_pylist()[0] == dt.date(2022, 1, 8)
        assert str(out["timez_type"].type) == "time64[us]"
        assert out["timez_type"].to_pylist()[0] == dt.time(1, 2, 3)
        assert str(out["timestampz_type"].type).startswith("timestamp[us")
        assert out["pay_by_quarter"].to_pylist() == [[100, 200], [300], []]
        assert out["schedule"].to_pylist()[0] == [["a", "b"], ["c"]]
        assert out["item"].to_pylist()[0]["price"] == 4.5
        assert out["numeric_test"].to_pylist()[0] == Decimal("12.500000000")
        mdn = out["interval_type"].to_pylist()[0]
        assert (mdn.months, mdn.days) == (14, 3)
