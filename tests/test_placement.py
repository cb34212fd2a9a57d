"""Multi-node shard placement (VERDICT r2 #5): with the SPREAD
scheduling strategy, one streaming pool's MergeShard actors land across
cluster nodes, and parity holds on a multi-node topology.

The session fixture owns a single-node Ray; a real multi-node check
needs its own cluster, so this test drives a fake 3-node cluster
(`ray.cluster_utils.Cluster`, Ray's public local-multi-node harness) in
a SUBPROCESS and reads its verdict from stdout.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import hashlib
import json
import sys

import ray
from ray.cluster_utils import Cluster

cluster = Cluster(initialize_head=True, head_node_args={"num_cpus": 2})
cluster.add_node(num_cpus=2)
cluster.add_node(num_cpus=2)
ray.init(address=cluster.address, include_dashboard=False,
         logging_level="ERROR")

from plugin_debezium_ray.config import CaptureConfig
from plugin_debezium_ray.pipelines.replay import ReplayJob
from plugin_debezium_ray.sources.binlog import binlog, oracle_apply

job = ReplayJob(CaptureConfig(num_buckets=12), sys.argv[1])
res = job.run_streaming(binlog(3000, 250, seed=7), num_shards=6)
state = {
    (r.repo, r.path): hashlib.sha256(r.content.encode()).hexdigest()
    for r in job.read_table().to_pandas().itertuples()
}
oracle = oracle_apply(3000, 250, seed=7, include_snapshot=False)
want = {
    k: hashlib.sha256(v["content"].encode()).hexdigest()
    for k, v in oracle.items()
}
print(json.dumps({
    "cluster_nodes": len([n for n in ray.nodes() if n["Alive"]]),
    "shard_nodes": res.metrics.get("shard_nodes"),
    "num_shards": res.metrics.get("num_shards"),
    "parity": state == want,
    "rows": len(state),
}))
ray.shutdown()
cluster.shutdown()
"""


@pytest.mark.timeout(300)
def test_spread_places_shards_across_nodes(tmp_path):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the subprocess builds its own cluster
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path / "lake")],
        capture_output=True, text=True, timeout=280, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    verdict = json.loads(out.stdout.strip().splitlines()[-1])
    assert verdict["cluster_nodes"] == 3
    assert verdict["num_shards"] == 6
    # SPREAD: the pool is not colocated on one node
    assert verdict["shard_nodes"] >= 2
    assert verdict["parity"] is True and verdict["rows"] > 0
