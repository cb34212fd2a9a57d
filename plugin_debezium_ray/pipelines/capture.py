"""Capture-to-files — the reference's primary sink surface (K1/K3).

The reference writes one Ion/JSON file per stream (lazily opened,
appended per record, uploaded at end — `ChangeConsumer.java:179-193`,
`AbstractDebeziumTask.java:250-268`) and returns
``Output{size, uris, stateOffsetKey}`` (`AbstractDebeziumTask.java:766-795`).

Ray-native equivalent: decode/format via ``map_batches`` and
``write_parquet(partition_cols=["_stream"])`` — one Parquet directory per
stream (hive-partitioned), streaming with backpressure, never
materializing.  Per-stream record counts (ST6 metrics) come from the
written files' parquet metadata — no second pass over the data.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow.parquet as pq

import ray.data

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.stages.decode import STREAM_COL, EnvelopeDecoder


@dataclass
class CaptureOutput:
    """The reference Output contract (K3): total size, per-stream URIs,
    per-stream counts (the Counter metrics of ST6)."""

    size: int
    uris: dict[str, str] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)


def capture_to_files(
    envelopes: "ray.data.Dataset",
    config: CaptureConfig,
    out_dir: str,
    *,
    min_rows_per_file: int | None = None,
    file_format: str = "parquet",
    type_hints: "dict[str, str] | None" = None,
    type_defaults: "dict[str, object] | None" = None,
) -> CaptureOutput:
    """Decode + format the envelope stream and write one directory per
    output stream.

    Stream routing follows ``config.split_table`` (M9): OFF → single
    ``data`` stream, DATABASE → per-db, TABLE → per-db.table.

    ``file_format``: ``"parquet"`` (the lake default), ``"jsonl"`` —
    one JSON object per record — or ``"ion"`` — Amazon Ion TEXT rows,
    the reference's actual file contract (``FileSerde.write``,
    `ChangeConsumer.java:192`) with Ion's typed scalars (unquoted
    timestamps, ``{{base64}}`` blobs, exact decimals; see ``serde.py``).
    Both row formats write stream-per-stream, still never materializing
    a stream on the driver.

    ``type_hints`` ({column: logical type name}) applies the 14-entry
    logical-type decode matrix (``stages/types.py``) after the envelope
    decode — in the reference this conversion happens inside the
    embedded engine before the consumer serializes
    (`MapConverter.java:56-96`), so the file sink always sees
    date/timestamp/decimal/... as typed values, never raw ints.
    ``type_defaults`` substitutes per-column defaults for nulls before
    decode (`MapConverter.java:45-47`)."""
    decoder = EnvelopeDecoder(config)
    decoded = envelopes.map_batches(
        decoder, batch_format="pyarrow", batch_size=config.batch_size
    )
    if type_hints or type_defaults:
        from plugin_debezium_ray.stages.types import logical_decoder

        decoded = decoded.map_batches(
            logical_decoder(type_hints or {}, type_defaults),
            batch_format="pyarrow",
        )
    if file_format == "jsonl":
        return _capture_jsonl(decoded, out_dir)
    if file_format == "ion":
        return _capture_ion(decoded, out_dir)
    if file_format != "parquet":
        raise ValueError(f"unknown file_format {file_format!r}")
    kw = {}
    if min_rows_per_file is not None:
        kw["min_rows_per_file"] = min_rows_per_file
    decoded.write_parquet(out_dir, partition_cols=[STREAM_COL], **kw)

    counts: dict[str, int] = {}
    uris: dict[str, str] = {}
    for part_dir in sorted(glob.glob(os.path.join(out_dir, f"{STREAM_COL}=*"))):
        stream = os.path.basename(part_dir).split("=", 1)[1]
        n = sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(part_dir, "*.parquet"))
        )
        counts[stream] = n
        uris[stream] = part_dir
    return CaptureOutput(size=sum(counts.values()), uris=uris, counts=counts)


def _capture_rows(
    decoded: "ray.data.Dataset", out_dir: str, write_stream
) -> CaptureOutput:
    """Shared per-stream row-file capture: the decoded stream is
    materialized ONCE (so the per-stream filtered writes don't re-run
    the decode), per-stream counts come from ONE aggregate pass, then
    each stream filter-writes its own directory via ``write_stream(sub,
    path)`` — block-streaming, driver sees only stream names/counts."""
    import pyarrow.compute as pc

    decoded = decoded.materialize()
    from plugin_debezium_ray.smallfetch import fetch_small_rows

    counts = {
        r[STREAM_COL]: r["count()"]
        for r in fetch_small_rows(decoded.groupby(STREAM_COL).count())
        if r[STREAM_COL] is not None
    }
    uris: dict[str, str] = {}
    for stream in sorted(counts):
        sub = decoded.map_batches(
            lambda t, s=stream: t.filter(
                pc.equal(t[STREAM_COL], s)
            ).drop_columns([STREAM_COL]),
            batch_format="pyarrow",
        )
        path = os.path.join(out_dir, stream)
        write_stream(sub, path)
        uris[stream] = path
    return CaptureOutput(size=sum(counts.values()), uris=uris, counts=counts)


def _capture_jsonl(
    decoded: "ray.data.Dataset", out_dir: str
) -> CaptureOutput:
    """One JSON-lines directory per stream (K1 row-JSON contract)."""
    return _capture_rows(
        decoded, out_dir, lambda sub, path: sub.write_json(path)
    )


def _make_ion_datasink(path: str):
    """Amazon-Ion-text file datasink on Ray's block-based file machinery
    (same filename/uniqueness/retry handling as ``write_json``; a
    content-addressed scheme would collapse two byte-identical blocks
    into ONE file while counts reported both)."""
    from ray.data.datasource import BlockBasedFileDatasink

    from plugin_debezium_ray.serde import ion_lines

    class IonDatasink(BlockBasedFileDatasink):
        def __init__(self):
            super().__init__(path, file_format="ion")

        def write_block_to_file(self, block, file) -> None:
            file.write(ion_lines(block.to_arrow().to_pylist()).encode())

    return IonDatasink()


def _capture_ion(
    decoded: "ray.data.Dataset", out_dir: str
) -> CaptureOutput:
    """One Amazon-Ion-text directory per stream (the reference's
    FileSerde row contract with typed scalars)."""
    return _capture_rows(
        decoded,
        out_dir,
        lambda sub, path: sub.write_datasink(_make_ion_datasink(path)),
    )
