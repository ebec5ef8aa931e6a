"""Deterministic synthetic inputs (seed=42 everywhere; no external data).

- ``corpus_from_edges``: source-code corpus table per BASELINE.json
  ``input_hint`` whose import statements encode a target edge list exactly
  (FIXTURES.md §B): extractor(corpus) == target graph, so every fixture
  golden applies end-to-end.
- ``triple_edges``: prepleti-style graph scale-up — behavioral re-expression
  of the reference generator (ref: prepleti.cpp:59-74): original edges,
  then (max_id+dst+1) → src, then (max_id+src+1) → (max_id+dst). Copies
  overlap on purpose so the scaled graph stays connected.
- ``scaled_edges``: k-fold application of the tripler for bench inputs.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

LANG_TEMPLATES = {
    "python": "import {dep}",
    "javascript": 'const {dep_us} = require("{dep}");',
    "go": 'import "{dep}"',
    "rust": "use {dep_us};",
}

_FILLER = [
    "def main():",
    "    pass",
    "# generated file",
    "x = 1",
    "print(x)",
]


def repo_name(v: int) -> str:
    return f"repo{v:06d}"


def corpus_from_edges(
    edges: list[tuple[int, int]],
    seed: int = 42,
    multi_file_every: int = 4,
    lang_mix: bool = True,
) -> pa.Table:
    """Corpus (repo, path, commit, lang, content): one repo per vertex; one
    ``import repoXXXXXX`` line per out-edge. Deterministic for (edges, seed).

    Duplicate edges in the input produce duplicate import lines; the
    extractor dedups (N3 policy — the corpus path is a simple graph,
    SURVEY.md §7.6 multigraph note).
    """
    rng = random.Random(seed)
    out_adj: dict[int, list[int]] = {}
    verts = sorted({v for e in edges for v in e})
    for s, d in edges:
        out_adj.setdefault(s, []).append(d)
    langs = list(LANG_TEMPLATES) if lang_mix else ["python"]
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i, v in enumerate(verts):
        lang = langs[i % len(langs)]
        deps = out_adj.get(v, [])
        # split deps across 1..2 files for multi-file coverage
        nfiles = 2 if (i % multi_file_every == 0 and len(deps) > 1) else 1
        chunks = [deps[f::nfiles] for f in range(nfiles)]
        for f, chunk in enumerate(chunks):
            tpl = LANG_TEMPLATES[lang]
            imports = [
                tpl.format(dep=repo_name(u), dep_us=repo_name(u)) for u in chunk
            ]
            filler = rng.sample(_FILLER, k=rng.randint(1, len(_FILLER)))
            content = "\n".join(imports + filler) + "\n"
            rows["repo"].append(repo_name(v))
            rows["path"].append(f"src/file{f}.{lang[:2]}")
            rows["commit"].append(
                hashlib.sha1(f"{seed}:{v}:{f}".encode()).hexdigest()
            )
            rows["lang"].append(lang)
            rows["content"].append(content)
    return pa.table(rows)


def triple_edges(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One prepleti round: 3E edges over ≤3V vertices (ref: prepleti.cpp:59-74)."""
    m = int(max(src.max(), dst.max()))
    s2, d2 = m + dst + 1, src
    s3, d3 = m + src + 1, m + dst
    return (
        np.concatenate([src, s2, s3]).astype(np.uint64),
        np.concatenate([dst, d2, d3]).astype(np.uint64),
    )


def scaled_edges(
    base: list[tuple[int, int]] | tuple[np.ndarray, np.ndarray], rounds: int
) -> pa.Table:
    """k prepleti rounds over a base edge list → edges table (src, dst)."""
    if isinstance(base, tuple):
        src, dst = base
    else:
        src = np.array([a for a, _ in base], dtype=np.uint64)
        dst = np.array([b for _, b in base], dtype=np.uint64)
    for _ in range(rounds):
        src, dst = triple_edges(src, dst)
    return pa.table(
        {
            "src": pa.array(src, type=pa.uint64()),
            "dst": pa.array(dst, type=pa.uint64()),
        }
    )
