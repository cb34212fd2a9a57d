"""Amazon Ion (text) row serialization — the reference's file serde.

The reference writes each captured record through Kestra's
``FileSerde.write`` (Amazon Ion text rows, `ChangeConsumer.java:192`,
`AbstractDebeziumTask.java:250-268`).  JSON-lines loses Ion's richer
scalars — timestamps, blobs and exact decimals degrade to strings or
floats — so this module emits Ion TEXT per the public spec
(https://amazon-ion.github.io/ion-docs/docs/spec.html):

- timestamps are unquoted ``2026-08-17T10:00:00.000Z`` values (naive
  datetimes carry Ion's unknown-offset ``-00:00``);
- ``bytes`` become blobs ``{{ base64 }}``;
- ``Decimal`` keeps exact decimal notation (``1.50``); floats are
  always distinguishable from decimals (an ``e`` exponent is forced:
  ``1.5e0``), with ``nan`` / ``+inf`` / ``-inf`` specials;
- structs/lists/strings/ints/bools/nulls follow the obvious mapping;
  struct field names are bare identifiers when legal, quoted otherwise.

Pure Python, no dependency: the serializer is a per-record
compatibility path (like the md5 fingerprint) — the lake-scale sink
remains partitioned Parquet.
"""

from __future__ import annotations

import base64
import datetime as dt
import math
from decimal import Decimal

_IDENT_OK = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_$"
)
_IDENT_START = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_$")

# Ion keywords can't be bare field names / symbols
_KEYWORDS = frozenset({"null", "true", "false", "nan"})

_ESCAPES = {
    "\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t",
    "\0": "\\0", "\b": "\\b", "\f": "\\f", "\v": "\\v", "\x07": "\\a",
}


def _escape(s: str) -> str:
    out = []
    for ch in s:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    return "".join(out)


def _field_name(name: str) -> str:
    if (
        name
        and name not in _KEYWORDS
        and name[0] in _IDENT_START
        and all(c in _IDENT_OK for c in name)
    ):
        return name
    return f'"{_escape(name)}"'


def _float_repr(v: float) -> str:
    if math.isnan(v):
        return "nan"
    if math.isinf(v):
        return "+inf" if v > 0 else "-inf"
    s = repr(v)
    # Ion floats REQUIRE an exponent (else the text reads as a decimal)
    if "e" in s or "E" in s:
        return s
    return s + "e0"


def _timestamp_repr(v: dt.datetime) -> str:
    base = v.strftime("%Y-%m-%dT%H:%M:%S")
    if v.microsecond:
        base += f".{v.microsecond:06d}".rstrip("0")
    if v.tzinfo is None:
        return base + "-00:00"  # Ion's unknown local offset
    off = v.utcoffset()
    if off is None or off == dt.timedelta(0):
        return base + "Z"
    total = int(off.total_seconds()) // 60
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return base + f"{sign}{total // 60:02d}:{total % 60:02d}"


def ion_dumps(value) -> str:
    """One value → Ion text (recursive; rows are structs)."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, float):
        return _float_repr(value)
    if isinstance(value, Decimal):
        if not value.is_finite():
            # Ion decimals have no NaN/Inf (only floats do) — degrade the
            # special values to float notation rather than emit invalid
            # text like "NaN." (Postgres numeric can legitimately be NaN)
            return _float_repr(float(value))
        s = str(value)
        # a decimal without point/exponent would read as an int
        if "." not in s and "e" not in s and "E" not in s:
            s += "."
        return s.replace("e", "d").replace("E", "d")
    if isinstance(value, str):
        return f'"{_escape(value)}"'
    if isinstance(value, dt.datetime):
        return _timestamp_repr(value)
    if isinstance(value, dt.date):
        return value.strftime("%Y-%m-%d")
    if isinstance(value, (bytes, bytearray, memoryview)):
        return "{{" + base64.b64encode(bytes(value)).decode() + "}}"
    if isinstance(value, dict):
        inner = ",".join(
            f"{_field_name(str(k))}:{ion_dumps(v)}" for k, v in value.items()
        )
        return "{" + inner + "}"
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(ion_dumps(v) for v in value) + "]"
    raise TypeError(f"no Ion mapping for {type(value).__name__}")


def ion_lines(rows: list[dict]) -> str:
    """Rows → newline-delimited Ion text values (the FileSerde layout:
    one top-level value per record)."""
    return "".join(ion_dumps(r) + "\n" for r in rows)
