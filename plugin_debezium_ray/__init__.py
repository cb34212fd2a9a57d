"""plugin_debezium_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation (NOT a port) of the capture semantics of
kestra-io/plugin-debezium: Debezium-style change-event envelopes (op c/u/d/r,
before/after images, source offsets) are tailed from a simulated binlog/WAL
and applied as exactly-once, last-write-wins upserts/deletes into a
partitioned Parquet lake table keyed on a primary key, with schema evolution,
an idempotent per-partition offset ledger, and atomic manifest commits.

Execution is idiomatic Ray Data: streaming ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow, one hash shuffle by primary-key bucket,
and stateless-where-possible stages. See SURVEY.md for the structural map of
the reference (file:line citations appear in module docstrings).

Never calls ``ray.init()`` — the embedding application owns the Ray session.
"""

from plugin_debezium_ray.config import (
    CaptureConfig,
    DeletedHandling,
    Format,
    KeyHandling,
    MetadataHandling,
    SnapshotMode,
    SplitTable,
)
from plugin_debezium_ray.envelope import (
    OP_CREATE,
    OP_DDL,
    OP_DELETE,
    OP_MESSAGE,
    OP_READ,
    OP_TRUNCATE,
    OP_UPDATE,
    envelope_schema,
)

__version__ = "0.1.0"

__all__ = [
    "CaptureConfig",
    "Format",
    "DeletedHandling",
    "KeyHandling",
    "MetadataHandling",
    "SplitTable",
    "SnapshotMode",
    "envelope_schema",
    "OP_CREATE",
    "OP_UPDATE",
    "OP_DELETE",
    "OP_READ",
    "OP_TRUNCATE",
    "OP_MESSAGE",
    "OP_DDL",
]
