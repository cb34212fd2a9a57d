"""Envelope sources: deterministic synthetic binlog/WAL + table adapters.

The reference's sources are Debezium connectors (S1-S7, SURVEY.md §2.1);
ours are (a) a deterministic simulated binlog over the mandated
source-code-repo table shape and (b) adapters deriving envelope streams
from existing Parquet tables.
"""
