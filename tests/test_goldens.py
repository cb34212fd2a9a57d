"""Golden row-set pins for the rows-only driver queries (VERDICT r1 #2):
langid / minhash / simhash / embedding dedup have no SQL oracle, so their
exact sf0.001 outputs are committed as goldens — any drift (intentional
or not) shows up here.  Regenerate via ``python tools/gen_goldens.py``.
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.json")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (tools/gen_goldens.py)")
    with open(path) as f:
        return json.load(f)


def _queries():
    import __ray_entry__ as E

    return E.queries()


def test_langid_golden():
    want = _golden("text_langid")
    out = _queries()["text_langid"](SF_DIR).to_pandas()
    got = sorted(map(list, zip(out["doc_id"].tolist(),
                               out["lang_pred"].tolist())))
    assert got == want


def test_minhash_survivors_golden():
    want = _golden("dedup_minhash")
    out = _queries()["dedup_minhash"](SF_DIR).to_pandas()
    assert sorted(out["doc_id"].tolist()) == want


def test_simhash_pairs_golden():
    want = [list(map(int, p)) for p in _golden("dedup_simhash")]
    out = _queries()["dedup_simhash"](SF_DIR)
    got = sorted(map(list, out.itertuples(index=False)))
    assert got == want


def test_ann_ivf_nprobe_curve_golden():
    """The recall-vs-nprobe curve, pinned: per-(nprobe, query) recall@10
    at nprobe ∈ {1,2,4,8} of 8 clusters, plus the structural invariants
    (mean recall monotone in nprobe; exact at nprobe = n_clusters)."""
    want = [[int(a), int(b), float(c)] for a, b, c in
            _golden("ann_ivf_approx")]
    out = _queries()["ann_ivf_approx"](SF_DIR)
    got = sorted(map(list, out.itertuples(index=False)))
    assert got == want
    curve = out.groupby("nprobe")["recall_at_10"].mean().sort_index()
    assert (curve.diff().dropna() >= -1e-12).all(), curve.to_dict()
    assert curve.loc[8] == 1.0


def test_semantic_dedup_golden():
    """SemDeDup survivors at sf0.001, pinned exactly."""
    want = _golden("dedup_semantic")
    out = _queries()["dedup_semantic"](SF_DIR).to_pandas()
    assert sorted(out["vec_id"].tolist()) == want


def test_cdc_six_ops_golden():
    """Final lake state of the all-six-ops WAL (c/u/d/r/t/m), pinned:
    truncate deletes, messages mutate nothing — any drift in the op
    semantics through the FULL streaming apply shows here."""
    want = [list(r) for r in _golden("cdc_six_ops")]
    out = _queries()["cdc_six_ops"](SF_DIR)
    assert [list(r) for r in out.itertuples(index=False)] == want


def test_multimodal_golden():
    """Real-codec multimodal pipeline output (PPM decode → resize →
    features), pinned: any drift in the codec/resize/feature math shows
    here."""
    want = _golden("multimodal_pipeline")
    out = _queries()["multimodal_pipeline"](SF_DIR).to_pandas()
    got = sorted(map(list, out.itertuples(index=False)))
    assert got == want


def test_multimodal_audio_golden():
    want = _golden("multimodal_audio")
    out = _queries()["multimodal_audio"](SF_DIR).to_pandas()
    assert sorted(map(list, out.itertuples(index=False))) == want


def test_multimodal_video_golden():
    want = _golden("multimodal_video")
    out = _queries()["multimodal_video"](SF_DIR).to_pandas()
    assert sorted(map(list, out.itertuples(index=False))) == want


def test_embedding_pairs_golden():
    want = [list(map(int, p)) for p in _golden("dedup_embedding")]
    out = _queries()["dedup_embedding"](SF_DIR)
    got = sorted(map(list, out.itertuples(index=False)))
    assert got == want


def test_minhash_quality_survivors_golden():
    """Quality-aware representative selection (keep the highest
    n_tokens copy per cluster) — pinned so drift in the winner rule
    or the CC labels shows here."""
    want = _golden("dedup_minhash_quality")
    out = _queries()["dedup_minhash_quality"](SF_DIR).to_pandas()
    assert sorted(out["doc_id"].tolist()) == want


def test_approx_distinct_golden():
    """HLL estimate is a pure function of the data + hash — pinned."""
    want = _golden("agg_approx_distinct")
    out = _queries()["agg_approx_distinct"](SF_DIR)
    assert [int(out["n_distinct_estimate"].iloc[0])] == want
