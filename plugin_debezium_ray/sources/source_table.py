"""Deterministic source-code-repo table generator (FIXTURES.md F1).

The mandated input shape (BASELINE.json input_hint):
``(repo:string, path:string, commit:string, lang:string, content:string)``,
primary key ``(repo, path)``, Zipf-skewed repo distribution, log-normal-ish
content sizes.  Generation is a pure function of ``(seed, key_index,
version)`` so the binlog generator and the pure-Python oracle can both
reproduce any row image independently (no shared state, no driver loop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from plugin_debezium_ray.sources.rand import mix, uniform01, zipf_rank

LANGS = ["py", "java", "rs", "go", "ts", "c", "cpp", "rb"]
_EXT = {l: l for l in LANGS}
_DIRS = ["src", "lib", "core", "util", "api", "internal", "test", "cmd"]

# code-ish token vocabulary for content generation
_VOCAB = (
    "def fn let var return if else for while match import from class struct "
    "impl trait pub static const mut async await yield lambda map filter "
    "reduce self this new delete try except catch finally raise throw "
    "int str bool float vec list dict set tuple option result err ok none "
    "null true false print log assert test mock batch stream actor task"
).split()


def payload_fields() -> list[pa.Field]:
    return [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]


def key_of_index(seed: int, key_idx: np.ndarray, n_repos: int) -> tuple[np.ndarray, np.ndarray]:
    """(repo, path) strings for key indices — Zipf-skewed repo choice."""
    repo_rank = zipf_rank(seed, key_idx, n_repos, stream=1)
    dir_ix = mix(seed, key_idx, stream=2) % np.uint64(len(_DIRS))
    lang_ix = mix(seed, key_idx, stream=3) % np.uint64(len(LANGS))
    repos = np.array([f"repo-{r:05d}" for r in repo_rank], dtype=object)
    paths = np.array(
        [
            f"{_DIRS[int(d)]}/f{int(k)}.{LANGS[int(l)]}"
            for d, k, l in zip(dir_ix, key_idx, lang_ix)
        ],
        dtype=object,
    )
    return repos, paths


def row_image(seed: int, key_idx: np.ndarray, version: np.ndarray, n_repos: int) -> pa.StructArray:
    """Full payload struct for (key_index, version).

    ``version`` is the monotone edit counter of the key: the snapshot is
    version 0; the binlog's j-th event on a key writes version = lsn of
    that event.  content embeds (key, version) so content sha256 equality
    is a complete-state check (the per-row invariant from BASELINE.json).
    """
    repos, paths = key_of_index(seed, key_idx, n_repos)
    lang_ix = mix(seed, key_idx, stream=3) % np.uint64(len(LANGS))
    langs = np.array([LANGS[int(l)] for l in lang_ix], dtype=object)
    ch = mix(seed, key_idx * np.uint64(2654435761) + version.astype(np.uint64), stream=4)
    commits = np.array([f"{int(c):016x}{int(c) ^ 0xabcdef:016x}00000000" for c in ch], dtype=object)
    # content length: log-normal-ish via exp of uniform, 50..~4000 chars
    u = uniform01(seed, key_idx + version.astype(np.int64) * 1_000_003, stream=5)
    n_tok = (8.0 * np.exp(3.5 * u)).astype(np.int64)
    tok_seed = mix(seed, key_idx, stream=6)
    nv = len(_VOCAB)
    contents = np.empty(len(key_idx), dtype=object)
    for i in range(len(key_idx)):
        # deterministic token stream per (key, version): cheap LCG over vocab
        s = int(tok_seed[i]) ^ (int(version[i]) * 0x9E3779B9)
        toks = []
        for t in range(int(n_tok[i])):
            s = (s * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            toks.append(_VOCAB[(s >> 33) % nv])
        contents[i] = f"// {repos[i]}/{paths[i]} v{int(version[i])}\n" + " ".join(toks)
    return pa.StructArray.from_arrays(
        [
            pa.array(repos, type=pa.string()),
            pa.array(paths, type=pa.string()),
            pa.array(commits, type=pa.string()),
            pa.array(langs, type=pa.string()),
            pa.array(contents, type=pa.large_string()),
        ],
        fields=payload_fields(),
    )


def source_table(
    n_keys: int,
    *,
    seed: int = 42,
    n_repos: int | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """The lake table at version 0 — also the snapshot (op=r) source.

    Distributed generation: ``ray.data.range`` provides the key indices,
    generation happens in ``map_batches`` workers (never on the driver).
    """
    n_repos = n_repos or max(1, n_keys // 50)

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch["id"].to_numpy()
        img = row_image(seed, idx, np.zeros(len(idx), dtype=np.int64), n_repos)
        return pa.Table.from_arrays(img.flatten(), schema=pa.schema(payload_fields()))

    ds = ray.data.range(n_keys, override_num_blocks=override_num_blocks)
    return ds.map_batches(gen, batch_format="pyarrow")
