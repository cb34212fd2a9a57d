"""Property-based substring dedup: random tiny corpora vs a
pure-Python reference that counts gram strings directly (no hashing)
and merges covered intervals literally — the generalization of the
DuckDB parity fixtures in test_substring.py to arbitrary corpus
shapes: empty docs, None docs, docs shorter than k, all-duplicate
docs, within-doc repetition, and k up to beyond every doc length."""

from collections import Counter, defaultdict

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyarrow as pa
import ray.data

from plugin_debezium_ray.functions.substring import find_duplicate_spans

# tiny vocab forces heavy gram collisions (real duplication, not hash
# collisions — those are 2^-128); short docs exercise the < k guard
doc_st = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "Dd"]), min_size=0, max_size=12
    ).map(" ".join),
)


def _reference(texts, k, min_count):
    """Sequential string-exact oracle: gram -> total occurrence count,
    mark positions of grams with count >= min_count, merge intervals
    [p, p+k-1] literally (no equal-length shortcut), report per doc."""
    grams: Counter = Counter()
    per_doc: dict[int, list[tuple[int, tuple]]] = defaultdict(list)
    for d, tx in enumerate(texts):
        if tx is None:
            continue
        toks = tx.lower().split()
        for i in range(len(toks) - k + 1):
            g = tuple(toks[i:i + k])
            grams[g] += 1
            per_doc[d].append((i, g))
    rows = []
    for d, lst in sorted(per_doc.items()):
        marked = [i for i, g in lst if grams[g] >= min_count]
        if not marked:
            continue
        covered = set()
        for p in marked:
            covered.update(range(p, p + k))
        spans = 0
        prev = None
        for c in sorted(covered):
            if prev is None or c != prev + 1:
                spans += 1
            prev = c
        rows.append({
            "doc_id": d,
            "n_dup_positions": len(marked),
            "n_spans": spans,
            "n_tokens_dup": len(covered),
        })
    return pd.DataFrame(
        rows, columns=["doc_id", "n_dup_positions", "n_spans",
                       "n_tokens_dup"],
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(doc_st, min_size=1, max_size=14),
    k=st.integers(1, 5),
    min_count=st.integers(2, 3),
)
def test_spans_match_string_exact_reference(ray_session, texts, k,
                                            min_count):
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = find_duplicate_spans(
        ray.data.from_arrow(docs).repartition(3),
        k=k, min_count=min_count,
    ).to_pandas()
    exp = _reference(texts, k, min_count)
    if len(exp) == 0:
        assert len(out) == 0
        return
    out = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[exp.columns.tolist()], exp.astype(out.dtypes)
    )
