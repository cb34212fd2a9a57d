"""Logical-type decode — the MapConverter type matrix (M1, SURVEY.md §1.2).

The reference's `MapConverter.java:58-143` decodes Kafka-Connect *encoded*
values (ints for dates/times, strings for zoned types, bytes for decimals)
into typed values, dispatched on the Connect schema *name*.  Our engine's
equivalent: a vectorized Arrow stage mapping raw encoded columns to native
Arrow types per a ``{column: logical_name}`` hint map — zero-copy where
Arrow allows (integer reinterpretation casts).

Logical names (mirroring `MapConverterTest.java:27-78` coverage):

  date            int32 epoch-day            → date32
  time            int32/64 ms-of-day         → time32(ms)
  micro_time      int64 µs-of-day            → time64(us)
  nano_time       int64 ns-of-day            → time64(ns)
  timestamp       int64 ms epoch             → timestamp(ms)
  micro_timestamp int64 µs epoch             → timestamp(us)
  nano_timestamp  int64 ns epoch             → timestamp(ns)
  micro_duration  int64 µs                   → duration(us)
  nano_duration   int64 ns                   → duration(ns)
  year            int32 year                 → date32 (Jan 1 of year)
  zoned_time      string "HH:MM:SS(.f)±hh:mm"→ time64(us) (UTC-normalized)
  zoned_timestamp string ISO offset datetime → timestamp(us, UTC)
  decimal         string/decimal             → decimal128(38, s)
  interval        string ISO-8601 period     → month_day_nano_interval

Null/default semantics (`MapConverter.java:39-54`): nulls pass through; a
``defaults`` map substitutes a default for nulls (null + required +
no-default is the caller's schema error, surfaced by Arrow casts).
"""

from __future__ import annotations

import re
from datetime import datetime, time as dtime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def decode_date(col) -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int32()), pa.date32())


def decode_time(col) -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int32()), pa.time32("ms"))


def decode_micro_time(col) -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int64()), pa.time64("us"))


def decode_nano_time(col) -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int64()), pa.time64("ns"))


def decode_timestamp(col, unit: str = "ms") -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int64()), pa.timestamp(unit))


def decode_duration(col, unit: str = "us") -> pa.Array:
    return pc.cast(pc.cast(_as_array(col), pa.int64()), pa.duration(unit))


def decode_year(col) -> pa.Array:
    """int year → LocalDate Jan 1 (`MapConverter.java:120-124`)."""
    years = _as_array(col).to_numpy(zero_copy_only=False)
    days = np.array(
        [
            None if y is None or (isinstance(y, float) and np.isnan(y))
            else (np.datetime64(f"{int(y):04d}-01-01") - np.datetime64("1970-01-01"))
            .astype("timedelta64[D]")
            .astype(np.int32)
            for y in years
        ],
        dtype=object,
    )
    return pa.array(days, type=pa.int32()).cast(pa.date32())


_ZONED_TS_RE = re.compile(r"(.+?)(Z|[+-]\d{2}:?\d{2})$")


def decode_zoned_timestamp(col) -> pa.Array:
    """ISO offset datetime string → timestamp(us, UTC)
    (`MapConverter.java:132-136`)."""
    arr = _as_array(col)
    # Arrow's string→timestamp cast understands ISO offsets natively
    return pc.cast(arr, pa.timestamp("us", tz="UTC"))


def decode_zoned_time(col) -> pa.Array:
    """Offset time string → time64(us), normalized to UTC
    (`MapConverter.java:126-130` keeps the offset; Arrow has no
    offset-time type, so we normalize)."""
    vals = _as_array(col).to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        t = dtime.fromisoformat(v)
        if t.tzinfo is not None:
            base = datetime(
                2000, 1, 1, t.hour, t.minute, t.second, t.microsecond, tzinfo=t.tzinfo
            ).astimezone(timezone.utc)
            micros = (
                (base.hour * 3600 + base.minute * 60 + base.second) * 1_000_000
                + base.microsecond
            )
        else:
            micros = (
                (t.hour * 3600 + t.minute * 60 + t.second) * 1_000_000
                + t.microsecond
            )
        out.append(micros)
    return pa.array(out, type=pa.int64()).cast(pa.time64("us"))


def decode_decimal(col, precision: int = 38, scale: int = 9) -> pa.Array:
    return pc.cast(_as_array(col), pa.decimal128(precision, scale))


_PERIOD_RE = re.compile(
    r"^P(?:(?P<y>-?\d+)Y)?(?:(?P<mo>-?\d+)M)?(?:(?P<w>-?\d+)W)?(?:(?P<d>-?\d+)D)?"
    r"(?:T(?:(?P<h>-?\d+)H)?(?:(?P<mi>-?\d+)M)?(?:(?P<s>-?\d+(?:\.\d+)?)S)?)?$"
)


def decode_interval(col) -> pa.Array:
    """ISO-8601 period string → month_day_nano_interval
    (`MapConverter.java:66-70`: ISO string → Period)."""
    vals = _as_array(col).to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        m = _PERIOD_RE.match(v)
        if not m:
            raise ValueError(f"invalid ISO period: {v!r}")
        g = {k: m.group(k) for k in ("y", "mo", "w", "d", "h", "mi", "s")}
        months = int(g["y"] or 0) * 12 + int(g["mo"] or 0)
        days = int(g["w"] or 0) * 7 + int(g["d"] or 0)
        nanos = (
            int(g["h"] or 0) * 3_600_000_000_000
            + int(g["mi"] or 0) * 60_000_000_000
            + int(round(float(g["s"] or 0) * 1_000_000_000))
        )
        out.append(pa.MonthDayNano([months, days, nanos]))
    return pa.array(out, type=pa.month_day_nano_interval())


DECODERS = {
    "date": decode_date,
    "time": decode_time,
    "micro_time": decode_micro_time,
    "nano_time": decode_nano_time,
    "timestamp": lambda c: decode_timestamp(c, "ms"),
    "micro_timestamp": lambda c: decode_timestamp(c, "us"),
    "nano_timestamp": lambda c: decode_timestamp(c, "ns"),
    "micro_duration": lambda c: decode_duration(c, "us"),
    "nano_duration": lambda c: decode_duration(c, "ns"),
    "year": decode_year,
    "zoned_time": decode_zoned_time,
    "zoned_timestamp": decode_zoned_timestamp,
    "decimal": decode_decimal,
    "interval": decode_interval,
}


def logical_decoder(
    type_hints: dict[str, str],
    defaults: dict[str, object] | None = None,
):
    """Build a ``map_batches`` fn applying the logical-type matrix.

    ``type_hints``: {column: logical name}; ``defaults``: {column: value}
    substituted for nulls *before* decode (`MapConverter.java:45-47`)."""
    defaults = defaults or {}

    def fn(t: pa.Table) -> pa.Table:
        for col, value in defaults.items():
            if col in t.column_names:
                i = t.column_names.index(col)
                filled = pc.fill_null(_as_array(t[col]), value)
                t = t.set_column(i, col, filled)
        for col, logical in type_hints.items():
            if col not in t.column_names:
                continue
            i = t.column_names.index(col)
            t = t.set_column(i, col, DECODERS[logical](t[col]))
        return t

    return fn
