"""Stable connector/job identity (ST5 of SURVEY.md §2.3).

The reference derives ``kestra_<8-hex-murmur3>`` from (namespace, flow,
task, iteration) so concurrent connectors never collide
(`AbstractDebeziumTask.java:298-343`).  Same contract, our own derivation
(md5 — we are not porting, only the format/determinism matters).
"""

from __future__ import annotations

import hashlib

PREFIX = "kestra_"


def connector_id(
    namespace: str,
    flow: str,
    task: str,
    iteration: str | int | None = None,
) -> str:
    """Deterministic ``kestra_<8-hex>`` id; distinct per (namespace, flow,
    task, iteration) — mirrors ConnectorIdTest.java:8-79 semantics."""
    parts = [namespace, flow, task]
    if iteration is not None:
        parts.append(str(iteration))
    digest = hashlib.md5("\x00".join(parts).encode("utf-8")).hexdigest()
    return PREFIX + digest[:8]


def is_current_format(cid: str) -> bool:
    return (
        cid.startswith(PREFIX)
        and len(cid) == len(PREFIX) + 8
        and all(c in "0123456789abcdef" for c in cid[len(PREFIX):])
    )
