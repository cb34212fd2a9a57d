"""Recursive nested-type decode — the full MapConverter recursion (M1).

The reference's `MapConverter.convert` (`/root/reference/plugin-debezium/
src/main/java/io/kestra/plugin/debezium/MapConverter.java:38-252`) is a
schema-driven recursive decoder: primitives + 14 logical types at any
depth, ARRAY (recursive on the element schema, `:181-190`), MAP — JSON
object for string keys, list-of-[key,value] "array encoding" for
non-string keys (`:191-226`) — STRUCT by schema field order with strict
schema-equality checks (`:227-244`), and null/default/optional handling
before any dispatch (`:39-54`).

Two surfaces here:

- ``convert_value(schema, value)`` — the faithful per-value recursion
  (the reference's exact null/default/mismatch contract), used for the
  type-matrix tests and as the row-level oracle.
- ``decode_column(col, schema)`` / ``nested_decoder(hints)`` — the
  Ray-Data hot path: the SAME recursion expressed over Arrow arrays
  (cast/DECODERS on leaves, offset-preserving rebuilds for
  list/map/struct), zero-copy where Arrow allows.  Arrow maps support
  arbitrary key types natively, so the non-string-key "array encoding"
  hack is needed only in the row API (SURVEY.md §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date, datetime, time as dtime, timedelta, timezone
from decimal import Decimal

import pyarrow as pa
import pyarrow.compute as pc

from plugin_debezium_ray.stages.types import DECODERS

_PRIMITIVES = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "boolean": pa.bool_(),
    "string": pa.string(),
    "bytes": pa.binary(),
}

# logical name → the raw encoded type it must arrive as
# (MapConverter.java:58-143 type guards)
_LOGICAL_RAW = {
    "date": int,
    "time": int,
    "micro_time": int,
    "nano_time": int,
    "timestamp": int,
    "micro_timestamp": int,
    "nano_timestamp": int,
    "micro_duration": int,
    "nano_duration": int,
    "year": int,
    "zoned_time": str,
    "zoned_timestamp": str,
    "interval": str,
    "decimal": (Decimal, int, float, str),
}


@dataclass
class ConnectSchema:
    """A Kafka-Connect-like schema node (the recursive shape the
    reference dispatches on).  ``name`` carries the logical type."""

    type: str  # primitive key of _PRIMITIVES, or "array" | "map" | "struct"
    name: str | None = None
    optional: bool = True
    default: object = None
    fields: list[tuple[str, "ConnectSchema"]] = field(default_factory=list)
    key_schema: "ConnectSchema | None" = None
    value_schema: "ConnectSchema | None" = None

    # ---- concise constructors -------------------------------------
    @classmethod
    def primitive(cls, t: str, **kw) -> "ConnectSchema":
        return cls(type=t, **kw)

    @classmethod
    def logical(cls, name: str, raw: str, **kw) -> "ConnectSchema":
        return cls(type=raw, name=name, **kw)

    @classmethod
    def array(cls, value_schema: "ConnectSchema", **kw) -> "ConnectSchema":
        return cls(type="array", value_schema=value_schema, **kw)

    @classmethod
    def map_(cls, key_schema: "ConnectSchema", value_schema: "ConnectSchema",
             **kw) -> "ConnectSchema":
        return cls(type="map", key_schema=key_schema,
                   value_schema=value_schema, **kw)

    @classmethod
    def struct(cls, fields: list[tuple[str, "ConnectSchema"]],
               **kw) -> "ConnectSchema":
        return cls(type="struct", fields=fields, **kw)


# ------------------------------------------------------- row recursion


def _decode_logical_value(name: str, value):
    raw = _LOGICAL_RAW[name]
    if not isinstance(value, raw) or isinstance(value, bool):
        raise ValueError(
            f"Invalid type for {name}, expected {raw} but was "
            f"{type(value).__name__} for '{value}'"
        )
    if name == "date":
        return date(1970, 1, 1) + timedelta(days=value)
    if name == "time":  # ms of day
        return (datetime(1970, 1, 1) + timedelta(milliseconds=value)).time()
    if name == "micro_time":
        return (datetime(1970, 1, 1) + timedelta(microseconds=value)).time()
    if name == "nano_time":
        return (datetime(1970, 1, 1) + timedelta(microseconds=value // 1000)).time()
    if name == "timestamp":
        return datetime.fromtimestamp(value / 1e3, tz=timezone.utc)
    if name == "micro_timestamp":
        return datetime.fromtimestamp(0, tz=timezone.utc) + timedelta(
            microseconds=value
        )
    if name == "nano_timestamp":
        return datetime.fromtimestamp(0, tz=timezone.utc) + timedelta(
            microseconds=value // 1000
        )
    if name == "micro_duration":
        return timedelta(microseconds=value)
    if name == "nano_duration":
        return timedelta(microseconds=value // 1000)
    if name == "year":
        return date(value, 1, 1)
    if name == "zoned_time":
        return dtime.fromisoformat(value)
    if name == "zoned_timestamp":
        return datetime.fromisoformat(value)
    if name == "interval":
        from plugin_debezium_ray.stages.types import decode_interval

        return decode_interval(pa.array([value]))[0].as_py()
    if name == "decimal":
        return Decimal(str(value))
    raise KeyError(name)


def convert_value(schema: ConnectSchema | None, value):
    """The reference recursion, value-at-a-time
    (`MapConverter.java:38-252`): null/default/optional first, then
    logical name, then base type with strict mismatch errors."""
    if value is None:
        if schema is None:
            return None
        if schema.default is not None:
            return convert_value(schema, schema.default)
        if schema.optional:
            return None
        raise ValueError(
            "Conversion error: null value for field that is required and "
            "has no default value"
        )

    if schema is not None and schema.name is not None:
        return _decode_logical_value(schema.name, value)

    stype = schema.type if schema is not None else _infer_type(value)

    if stype in _PRIMITIVES:
        _check_primitive(stype, value)
        return bytes(value) if stype == "bytes" else value

    if stype == "array":
        if not isinstance(value, (list, tuple)):
            raise ValueError(
                f"Invalid type for ARRAY: {type(value).__name__}, value:{value}"
            )
        vs = schema.value_schema if schema else None
        return [convert_value(vs, v) for v in value]

    if stype == "map":
        if not isinstance(value, dict):
            raise ValueError(
                f"Invalid type for MAP: {type(value).__name__}, value:{value}"
            )
        ks = schema.key_schema if schema else None
        vs = schema.value_schema if schema else None
        # object mode for string keys; "array encoding" (list of [k, v])
        # for non-string keys — MapConverter.java:191-226
        if ks is None:
            object_mode = all(isinstance(k, str) for k in value)
        else:
            object_mode = ks.type == "string"
        if object_mode:
            return {
                convert_value(ks, k): convert_value(vs, v)
                for k, v in value.items()
            }
        return [[convert_value(ks, k), convert_value(vs, v)]
                for k, v in value.items()]

    if stype == "struct":
        if not isinstance(value, dict):
            raise ValueError(
                f"Invalid type for STRUCT: {type(value).__name__}, value:{value}"
            )
        declared = {n for n, _ in schema.fields}
        extra = set(value) - declared
        if extra:
            raise ValueError("Mismatching schema.")  # MapConverter.java:229-231
        out = {}
        for fname, fschema in schema.fields:
            out[fname] = convert_value(fschema, value.get(fname))
        return out

    raise ValueError(f"Couldn't convert {value!r} (schema type {stype}).")


def _infer_type(value) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int64"
    if isinstance(value, float):
        return "float64"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (bytes, bytearray)):
        return "bytes"
    if isinstance(value, (list, tuple)):
        return "array"
    if isinstance(value, dict):
        return "map"
    raise ValueError(
        f"Java class {type(value).__name__} does not have corresponding "
        "schema type."
    )


def _check_primitive(stype: str, value) -> None:
    ok = {
        "int8": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "int16": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "int32": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "int64": lambda v: isinstance(v, int) and not isinstance(v, bool),
        "float32": lambda v: isinstance(v, (float, int)) and not isinstance(v, bool),
        "float64": lambda v: isinstance(v, (float, int)) and not isinstance(v, bool),
        "boolean": lambda v: isinstance(v, bool),
        "string": lambda v: isinstance(v, str),
        "bytes": lambda v: isinstance(v, (bytes, bytearray, memoryview)),
    }[stype]
    if not ok(value):
        raise ValueError(
            f"Invalid type for {stype.upper()}: {type(value).__name__}, "
            f"value:{value}"
        )


# ---------------------------------------------------- column recursion


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def decode_column(col, schema: ConnectSchema | None) -> pa.Array:
    """Vectorized recursive decode of one Arrow column per the schema —
    the same dispatch order as ``convert_value`` expressed as Arrow
    kernels; list/map/struct rebuild preserves offsets and validity
    (no per-row Python in the recursion)."""
    arr = _as_array(col)
    if schema is None:
        return arr

    if schema.default is not None and arr.null_count:
        if schema.type in _PRIMITIVES and schema.name is None:
            if pa.types.is_null(arr.type):  # all-null (e.g. absent field)
                arr = pc.cast(arr, _PRIMITIVES[schema.type])
            arr = pc.fill_null(arr, schema.default)
        else:
            # nested/logical defaults substitute through the row API
            # (rare: Connect defaults are almost always scalars)
            filled = [
                convert_value(schema, v) for v in arr.to_pylist()
            ]
            return pa.array(filled)
    if not schema.optional and schema.default is None and arr.null_count:
        raise ValueError(
            "Conversion error: null value for field that is required and "
            "has no default value"
        )

    if schema.name is not None:
        return DECODERS[schema.name](arr)

    if schema.type in _PRIMITIVES:
        try:
            return pc.cast(arr, _PRIMITIVES[schema.type])
        except pa.ArrowInvalid as e:
            raise ValueError(
                f"Invalid type for {schema.type.upper()}: {arr.type}"
            ) from e

    if schema.type == "array":
        if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
            raise ValueError(f"Invalid type for ARRAY: {arr.type}")
        values = decode_column(arr.values, schema.value_schema)
        return pa.ListArray.from_arrays(
            arr.offsets, values, mask=pc.is_null(arr)
        )

    if schema.type == "map":
        if not pa.types.is_map(arr.type):
            raise ValueError(f"Invalid type for MAP: {arr.type}")
        keys = decode_column(arr.keys, schema.key_schema)
        items = decode_column(arr.items, schema.value_schema)
        rebuilt = pa.MapArray.from_arrays(arr.offsets, keys, items)
        if arr.null_count:
            # MapArray.from_arrays has no mask= (pyarrow 16) and drops the
            # validity bitmap — a null map would silently become {}. Rebuild
            # the validity via a masked ListArray over the same offsets and
            # graft its (validity, offsets) buffers onto the map type.
            lst = pa.ListArray.from_arrays(
                arr.offsets, rebuilt.values, mask=pc.is_null(arr)
            )
            rebuilt = pa.Array.from_buffers(
                rebuilt.type,
                len(lst),
                lst.buffers()[:2],
                null_count=lst.null_count,
                children=[lst.values],
            )
        return rebuilt

    if schema.type == "struct":
        if not pa.types.is_struct(arr.type):
            raise ValueError(f"Invalid type for STRUCT: {arr.type}")
        declared = {n for n, _ in schema.fields}
        present = {arr.type.field(i).name for i in range(arr.type.num_fields)}
        extra = present - declared
        if extra:
            raise ValueError("Mismatching schema.")
        children, names = [], []
        n = len(arr)
        for fname, fschema in schema.fields:
            if fname in present:
                child = decode_column(arr.field(fname), fschema)
            else:
                child = decode_column(pa.nulls(n), fschema)
            children.append(child)
            names.append(fname)
        return pa.StructArray.from_arrays(
            children, names, mask=pc.is_null(arr)
        )

    raise ValueError(f"Unknown schema type {schema.type!r}")


def nested_decoder(hints: dict[str, ConnectSchema]):
    """Build a ``map_batches`` fn decoding the hinted columns recursively
    (columns without a hint pass through untouched)."""

    def fn(t: pa.Table) -> pa.Table:
        for col, schema in hints.items():
            if col not in t.column_names:
                continue
            i = t.column_names.index(col)
            t = t.set_column(i, col, decode_column(t[col], schema))
        return t

    return fn
