"""End-to-end training-data corpus preparation.

The composition a 100-TB pretraining-data job actually runs, expressed
as ONE lazy Ray Data pipeline over the library's own stages:

    per-doc metrics (token count + quality signals, pure Arrow kernels)
      → quality gate (vectorized filter inside the same map_batches —
        rejected rows never leave the task)
      → normalized exact dedup (``functions.dedup.exact_dedup``:
        two-lane 128-bit content hash, ONE coarse-partition shuffle)
      → per-language corpus stats (per-batch partial pre-agg, then a
        groupby over ≤ |languages| rows).

Every stage streams: the corpus is never materialized, the only
driver-visible result is the per-language stats table.  Two shuffles
total — the dedup hash partition and the (tiny) stats groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum

from plugin_debezium_ray.functions.dedup import exact_dedup
from plugin_debezium_ray.functions.text import (
    quality_score_batch,
    token_count_batch,
)


def corpus_prep(
    ds: "ray.data.Dataset",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Quality-gate, dedup and summarize a document corpus; returns the
    per-language stats Dataset with columns
    ``(lang, n_docs, total_tokens)``.

    Gate semantics (mirrored 1:1 by the SQL oracle): text is non-null,
    whitespace token count ≥ ``min_tokens``, and
    ``[.,;:!?]``-punctuation-per-char ≤ ``max_punct_ratio``.  Survivors
    are deduplicated on lowercased whitespace-collapsed content keeping
    the min ``id_col`` representative.
    """

    def metrics_and_gate(t: pa.Table) -> pa.Table:
        t = token_count_batch(t, text_col=text_col)
        t = quality_score_batch(t, text_col=text_col)
        keep = pc.and_kleene(
            pc.greater_equal(t["n_tokens"], pa.scalar(min_tokens, pa.int64())),
            pc.less_equal(t["punct_ratio"], max_punct_ratio),
        )
        # null text yields null metrics → and_kleene null → dropped by
        # filter, matching the oracle's WHERE text IS NOT NULL
        return t.filter(pc.fill_null(keep, False)).select(
            [id_col, text_col, lang_col, "n_tokens"]
        )

    gated = ds.map_batches(metrics_and_gate, batch_format="pyarrow")
    kept = exact_dedup(
        gated,
        id_col=id_col,
        text_col=text_col,
        normalize=True,
        num_partitions=num_partitions,
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                lang_col: t[lang_col].to_pandas(),
                "n_tokens": t["n_tokens"].to_pandas(),
            }
        )
        agg = (
            df.groupby(lang_col, sort=False, dropna=False)
            .agg(n_docs=("n_tokens", "size"), total_tokens=("n_tokens", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                lang_col: pa.array(agg[lang_col], type=t[lang_col].type),
                "n_docs": pa.array(agg["n_docs"].to_numpy(np.int64)),
                "total_tokens": pa.array(agg["total_tokens"].to_numpy(np.int64)),
            }
        )

    stats = (
        kept.map_batches(partial, batch_format="pyarrow")
        .groupby(lang_col)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )
    return stats
