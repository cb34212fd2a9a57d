"""JSON-string image fallback (M11).

The reference re-parses before/after images that arrive as serialized
JSON strings back into maps (`CustomParameterDeserializer.java:11-21`,
wired at `Envelope.java:28-34`).  Equivalent: a batch transform that
parses string-typed before/after columns into the payload struct type.
A compatibility shim for heterogenous WAL segments, not a hot-path
stage — row-wise ``json.loads`` is acceptable here and runs inside
distributed map_batches workers.
"""

from __future__ import annotations

import json

import pyarrow as pa


def parse_json_images(payload_type: pa.StructType):
    """Build a map_batches fn converting string-typed ``before``/``after``
    columns into ``payload_type`` structs (non-string columns untouched)."""

    names = [payload_type.field(i).name for i in range(payload_type.num_fields)]

    def parse_col(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        vals = col.to_pylist()
        rows = []
        for v in vals:
            if v is None:
                rows.append(None)
                continue
            d = json.loads(v) if isinstance(v, str) else v
            rows.append({n: d.get(n) for n in names})
        return pa.array(rows, type=payload_type)

    def fn(t: pa.Table) -> pa.Table:
        for col_name in ("before", "after"):
            if col_name not in t.column_names:
                continue
            i = t.column_names.index(col_name)
            if pa.types.is_string(t.schema.field(col_name).type) or pa.types.is_large_string(
                t.schema.field(col_name).type
            ):
                t = t.set_column(i, col_name, parse_col(t[col_name]))
        return t

    return fn
