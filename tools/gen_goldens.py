#!/usr/bin/env python
"""Generate golden row-set files for the rows-only driver queries
(langid / minhash / simhash / embedding dedup — heuristic or
non-SQL-expressible, so the driver's oracle can't value-check them).
The goldens pin exact expected outputs at sf0.001; committed under
tests/golden/ and asserted by tests/test_goldens.py.

Rerun after an INTENTIONAL algorithm change:
    python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
OUT = os.path.join(REPO, "tests", "golden")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    os.makedirs(OUT, exist_ok=True)
    qs = E.queries()

    langid = qs["text_langid"](SF_DIR).to_pandas()
    goldens = {
        "text_langid": sorted(
            map(list, zip(langid["doc_id"].tolist(),
                          langid["lang_pred"].tolist()))
        ),
        "dedup_minhash": sorted(
            qs["dedup_minhash"](SF_DIR).to_pandas()["doc_id"].tolist()
        ),
        "agg_approx_distinct": [
            int(qs["agg_approx_distinct"](SF_DIR)
                ["n_distinct_estimate"].iloc[0])
        ],
        "dedup_minhash_quality": sorted(
            qs["dedup_minhash_quality"](SF_DIR).to_pandas()["doc_id"].tolist()
        ),
        "dedup_simhash": sorted(
            map(list, qs["dedup_simhash"](SF_DIR).itertuples(index=False))
        ),
        "dedup_embedding": sorted(
            map(list, qs["dedup_embedding"](SF_DIR).itertuples(index=False))
        ),
        "cdc_six_ops": [
            list(r) for r in
            qs["cdc_six_ops"](SF_DIR).itertuples(index=False)
        ],
        "multimodal_pipeline": sorted(
            map(list, qs["multimodal_pipeline"](SF_DIR)
                .to_pandas().itertuples(index=False))
        ),
        "multimodal_audio": sorted(
            map(list, qs["multimodal_audio"](SF_DIR)
                .to_pandas().itertuples(index=False))
        ),
        "multimodal_video": sorted(
            map(list, qs["multimodal_video"](SF_DIR)
                .to_pandas().itertuples(index=False))
        ),
        "ann_ivf_approx": sorted(
            map(list, qs["ann_ivf_approx"](SF_DIR).itertuples(index=False))
        ),
        "dedup_semantic": sorted(
            qs["dedup_semantic"](SF_DIR).to_pandas()["vec_id"].tolist()
        ),
    }
    for name, data in goldens.items():
        path = os.path.join(OUT, f"{name}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=0, default=int)
        print(f"wrote {path} ({len(data)} entries)")
    ray.shutdown()


if __name__ == "__main__":
    main()
