"""Repo→repo dependency-edge extraction from corpus ``content`` (north-star
N3): stateless-per-batch but regex-stateful → a ``map_batches`` ACTOR POOL
(patterns compiled once per actor in ``__init__``, work per ``__call__``).

Pipeline: corpus → per-lang reference scan → (src_repo, dst_repo) string
edges → semi-join against the corpus repo set (broadcast ``ray.put`` set,
no shuffle) to drop external references → distributed dedup (groupby) →
dictionary-encode to dense vids (``engine.graph``).

The corpus-derived graph is a SIMPLE graph (dedup) unlike the reference's
multigraph SNAP path — both policies kept explicit (SURVEY.md §7.6).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

# One pattern per language, each capturing the referenced repo identifier.
# Covers the generator's templates plus common idioms.
LANG_PATTERNS: dict[str, list[str]] = {
    "python": [
        r"^\s*import\s+([A-Za-z_][\w\.]*)",
        r"^\s*from\s+([A-Za-z_][\w\.]*)\s+import\b",
    ],
    "javascript": [
        r"""require\(\s*["']([^"']+)["']\s*\)""",
        r"""^\s*import\b[^"']*["']([^"']+)["']""",
    ],
    "go": [r"""^\s*import\s+"([^"]+)" """.rstrip()],
    "rust": [r"^\s*use\s+([A-Za-z_][\w]*)"],
}


class ExtractEdges:
    """Actor-pool callable: corpus batch → (src_repo, dst_repo) string edges.

    ``repo_set_ref``: broadcast SORTED array of known repo names (semi-join
    filter, one vectorized ``searchsorted`` membership pass per batch);
    pass None to keep all extracted references.
    """

    def __init__(self, repo_set_ref=None):
        self.patterns = {
            lang: [re.compile(p, re.M) for p in pats]
            for lang, pats in LANG_PATTERNS.items()
        }
        self.repo_set = ray.get(repo_set_ref) if repo_set_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()
        src_out: list[str] = []
        dst_out: list[str] = []
        for repo, lang, content in zip(repos, langs, contents):
            pats = self.patterns.get(lang)
            if not pats or content is None:
                continue
            seen = set()
            for p in pats:
                for m in p.finditer(content):
                    dep = m.group(1).split(".")[0].split("/")[0]
                    if dep == repo or dep in seen:
                        continue
                    seen.add(dep)
                    src_out.append(repo)
                    dst_out.append(dep)
        if self.repo_set is not None and dst_out:
            known = self.repo_set
            if len(known) == 0:
                src_out, dst_out = [], []
            else:
                deps = np.asarray(dst_out, dtype=object)
                pos = np.minimum(
                    np.searchsorted(known, deps), len(known) - 1
                )
                ok = known[pos] == deps
                src_out = [s for s, k in zip(src_out, ok) if k]
                dst_out = [d for d, k in zip(dst_out, ok) if k]
        return pa.table(
            {
                "src_repo": pa.array(src_out, type=pa.string()),
                "dst_repo": pa.array(dst_out, type=pa.string()),
            }
        )


def repo_set(corpus: ray.data.Dataset):
    """Distinct repo names of the corpus as a broadcast SORTED numpy array
    (``ray.put`` once; membership is ``searchsorted`` inside the extract
    actors). Routed through the sort-based distributed distinct
    (``graph._sorted_distinct_refs``) — Ray 2.49's ``Dataset.unique`` is
    the ~100×-slower hash-aggregate path at ≥10M rows, and a driver
    frozenset would be O(#repos) Python objects."""
    from . import graph as G

    names = corpus.select_columns(["repo"]).map_batches(
        lambda t: pa.table(
            {"repo": pc.unique(t.column("repo").combine_chunks())}
        ),
        batch_format="pyarrow",
    )
    refs, _counts = G._sorted_distinct_refs(names, "repo")
    if not refs:
        return ray.put(np.empty(0, dtype=object))
    blocks = [
        t.column("repo").to_numpy(zero_copy_only=False) for t in ray.get(refs)
    ]
    return ray.put(np.concatenate(blocks))  # range-ordered and deduped


def extract_edges(
    corpus: ray.data.Dataset,
    repo_set_ref=None,
    concurrency: int | tuple | None = None,
    dedup: bool = True,
) -> ray.data.Dataset:
    """Corpus → deduped string edge Dataset (src_repo, dst_repo)."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    edges = corpus.map_batches(
        ExtractEdges,
        fn_constructor_args=(repo_set_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if dedup:
        agg = edges.groupby(["src_repo", "dst_repo"]).aggregate(
            Count(alias_name="_c")
        )
        edges = agg.select_columns(["src_repo", "dst_repo"])
    return edges


def encoded_corpus_graph(corpus: ray.data.Dataset, concurrency: int | tuple | None = None):
    """Full N3 build: (edges dense Dataset, ids: sorted np array of repo
    names). Downstream engines consume the dense (src, dst) edges."""
    from . import graph as G

    rref = repo_set(corpus)
    sedges = extract_edges(corpus, repo_set_ref=rref, concurrency=concurrency)
    renamed = sedges.map_batches(
        lambda t: pa.table({"src": t.column("src_repo"), "dst": t.column("dst_repo")}),
        batch_format="pyarrow",
    )
    ids = G.vertex_ids(renamed)
    return G.encode_edges(renamed, ids), ids
