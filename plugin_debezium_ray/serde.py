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
    # manual formatting: strftime's %Y does NOT zero-pad years < 1000 on
    # glibc, producing invalid Ion like "2-01-01T..."
    base = (
        f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
        f"T{v.hour:02d}:{v.minute:02d}:{v.second:02d}"
    )
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


def _duration_repr(v: dt.timedelta) -> str:
    """ISO-8601 duration string in java.time canonical TIME-component
    form: days carry into hours (``timedelta(days=1)`` → ``PT24H``, not
    ``P1DT0S``) and fraction digits strip trailing zeros (``PT0.5S``,
    not ``PT0.500000S``) — so consumers comparing against
    ``java.time.Duration.toString()`` output match.  ONE deliberate
    deviation, documented here: negative durations are whole-string
    sign-prefixed (``-PT1S``, valid ISO-8601) rather than java's
    per-component signs (``PT-1S``) — simpler to parse, same value.
    (The reference's own MicroDuration render is buggy —
    ``Duration.ofMillis(us*1000)`` inflates by 1000× — so reference
    bit-parity is deliberately NOT the target here.)"""
    us = (v.days * 86_400 + v.seconds) * 1_000_000 + v.microseconds
    sign = "-" if us < 0 else ""
    us = abs(us)
    h, rem = divmod(us, 3_600_000_000)
    m, rem = divmod(rem, 60_000_000)
    s, frac = divmod(rem, 1_000_000)
    out = f"{sign}PT"
    if h:
        out += f"{h}H"
    if m:
        out += f"{m}M"
    if frac:
        out += f"{s}." + f"{frac:06d}".rstrip("0") + "S"
    elif s or out.endswith("T"):
        out += f"{s}S"
    return out


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
        return f"{value.year:04d}-{value.month:02d}-{value.day:02d}"
    if isinstance(value, dt.time):
        # Ion has no time-only type — ISO string (the Jackson-Ion
        # java.time convention the reference's FileSerde inherits)
        return f'"{value.isoformat()}"'
    if isinstance(value, dt.timedelta):
        return f'"{_duration_repr(value)}"'
    if hasattr(value, "months") and hasattr(value, "nanoseconds"):
        # pyarrow MonthDayNano interval (the Debezium interval logical
        # type) — ISO-8601 period string, no native Ion equivalent.
        # sign/abs BEFORE divmod: floor division on a negative ns count
        # would render -1 ns as "-1.999999999S"
        ns = value.nanoseconds
        sign = "-" if ns < 0 else ""
        ns = abs(ns)
        return (
            f'"P{value.months}M{value.days}D'
            f'T{sign}{ns // 1_000_000_000}.{ns % 1_000_000_000:09d}S"'
        )
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


# ------------------------------------------------------------- reader
#
# Minimal Ion TEXT reader for the subset ion_dumps emits (one top-level
# value per line).  Exists so the sink is testable as a round-trip, not
# write-only; NOT a general Ion parser (no annotations, symbols, sexps,
# long strings, or comments).


class IonParseError(ValueError):
    pass


_TS_RE = None
_NUM_RE = None


def _lazy_res():
    global _TS_RE, _NUM_RE
    if _TS_RE is None:
        import re

        _TS_RE = re.compile(
            r"\d{4}-\d{2}-\d{2}"
            r"(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2}))?"
        )
        _NUM_RE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[edED][+-]?\d+)?")
    return _TS_RE, _NUM_RE


class _Reader:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r,":
            self.i += 1

    def _lit(self, tok: str) -> bool:
        if self.s.startswith(tok, self.i):
            self.i += len(tok)
            return True
        return False

    def value(self):
        import base64
        import datetime as dt
        from decimal import Decimal

        self._ws()
        ts_re, num_re = _lazy_res()
        s, i = self.s, self.i
        if i >= len(s):
            raise IonParseError("unexpected end of input")
        c = s[i]
        if self._lit("null"):
            return None
        if self._lit("true"):
            return True
        if self._lit("false"):
            return False
        if self._lit("nan"):
            return float("nan")
        if self._lit("+inf"):
            return float("inf")
        if self._lit("-inf"):
            return float("-inf")
        if c == '"':
            return self._string()
        if c == "{":
            if s.startswith("{{", i):
                j = s.index("}}", i)
                blob = s[i + 2 : j].strip()
                self.i = j + 2
                return base64.b64decode(blob)
            return self._struct()
        if c == "[":
            return self._list()
        m = ts_re.match(s, i)
        if m and (len(m.group()) > 10 or "-" in m.group()[1:]):
            # timestamps win over numbers when the date shape matches
            self.i = m.end()
            g = m.group()
            if "T" not in g:
                return dt.date.fromisoformat(g)
            if g.endswith("Z"):
                return dt.datetime.fromisoformat(g[:-1]).replace(
                    tzinfo=dt.timezone.utc
                )
            if g.endswith("-00:00"):  # unknown offset → naive
                return dt.datetime.fromisoformat(g[:-6])
            return dt.datetime.fromisoformat(g)
        m = num_re.match(s, i)
        if m:
            g = m.group()
            self.i = m.end()
            if "e" in g or "E" in g:
                return float(g)
            if "d" in g or "D" in g:
                return Decimal(g.replace("d", "e").replace("D", "e"))
            if "." in g:
                return Decimal(g)
            return int(g)
        raise IonParseError(f"cannot parse value at {i}: {s[i:i+20]!r}")

    def _string(self) -> str:
        s = self.s
        i = self.i + 1
        out = []
        while True:
            c = s[i]
            if c == '"':
                self.i = i + 1
                return "".join(out)
            if c == "\\":
                nxt = s[i + 1]
                mapping = {"n": "\n", "r": "\r", "t": "\t", "0": "\0",
                           "b": "\b", "f": "\f", "v": "\v", "a": "\x07",
                           "\\": "\\", '"': '"'}
                if nxt == "x":
                    out.append(chr(int(s[i + 2 : i + 4], 16)))
                    i += 4
                    continue
                out.append(mapping[nxt])
                i += 2
                continue
            out.append(c)
            i += 1

    def _struct(self) -> dict:
        self.i += 1  # {
        out: dict = {}
        while True:
            self._ws()
            if self.s[self.i] == "}":
                self.i += 1
                return out
            if self.s[self.i] == '"':
                name = self._string()
            else:
                j = self.i
                while self.s[j] in _IDENT_OK:
                    j += 1
                name = self.s[self.i : j]
                self.i = j
            self._ws()
            if self.s[self.i] != ":":
                raise IonParseError(f"expected ':' at {self.i}")
            self.i += 1
            out[name] = self.value()

    def _list(self) -> list:
        self.i += 1  # [
        out = []
        while True:
            self._ws()
            if self.s[self.i] == "]":
                self.i += 1
                return out
            out.append(self.value())


def ion_loads(text: str):
    """One Ion text value → Python (the inverse of ``ion_dumps`` on the
    emitted subset; naive timestamps come back naive, blobs as bytes)."""
    r = _Reader(text)
    v = r.value()
    r._ws()
    if r.i != len(r.s):
        raise IonParseError(f"trailing data at {r.i}")
    return v


def ion_loads_lines(text: str) -> list:
    """Newline-delimited Ion values → list (reads back ``ion_lines``)."""
    return [ion_loads(ln) for ln in text.splitlines() if ln.strip()]
