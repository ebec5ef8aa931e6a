"""End-to-end corpus path: generate → sha256 invariant → extract → rank.

FIXTURES.md §B: corpus whose imports encode the `mini` fixture graph; the
extractor must recover the graph exactly, and the §A goldens then apply
end-to-end.
"""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from engine import gen, oracle
from engine.extract import encoded_corpus_graph, extract_edges, repo_set
from engine.ingest import read_snap_edges_local, with_sha256
from engine.pagerank import pagerank

from .conftest import FIXTURES


@pytest.fixture(scope="module")
def mini_edges():
    return read_snap_edges_local(FIXTURES["mini"])


@pytest.fixture(scope="module")
def corpus_tbl(mini_edges):
    return gen.corpus_from_edges(mini_edges, seed=42)


def test_corpus_schema(corpus_tbl):
    assert corpus_tbl.schema.names == ["repo", "path", "commit", "lang", "content"]
    assert all(str(f.type) == "string" for f in corpus_tbl.schema)


def test_sha256_per_row_invariant(corpus_tbl):
    """input_hint: per-row content sha256 equality, computed independently."""
    ds = with_sha256(ray.data.from_arrow(corpus_tbl))
    got = ds.to_pandas()
    assert "content_sha256" in got.columns
    for _, row in got.iterrows():
        want = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        assert row["content_sha256"] == want


def test_extraction_recovers_graph(corpus_tbl, mini_edges):
    corpus = ray.data.from_arrow(corpus_tbl)
    rref = repo_set(corpus)
    edges = extract_edges(corpus, repo_set_ref=rref).to_pandas()
    got = {
        (int(s[4:]), int(d[4:]))
        for s, d in zip(edges["src_repo"], edges["dst_repo"])
    }
    assert got == set(mini_edges)  # mini has no duplicate edges


def test_corpus_pagerank_end_to_end(corpus_tbl, mini_edges):
    """corpus → extract → encode → PageRank matches the mini goldens
    (mini is a simple graph, so dedup doesn't change semantics)."""
    ref, iters = oracle.pagerank_ref(mini_edges)
    enc, ids = encoded_corpus_graph(ray.data.from_arrow(corpus_tbl))
    res = pagerank(enc, iterations=iters)
    got = {int(ids[i][4:]): r for i, r in enumerate(res.ranks)}
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-6


def test_external_refs_dropped():
    tbl = pa.table(
        {
            "repo": ["repo000001"],
            "path": ["src/a.py"],
            "commit": ["c"],
            "lang": ["python"],
            "content": ["import repo000002\nimport numpy\nimport os\n"],
        }
    )
    corpus = ray.data.from_arrow(
        pa.concat_tables(
            [
                tbl,
                pa.table(
                    {
                        "repo": ["repo000002"],
                        "path": ["src/a.py"],
                        "commit": ["c"],
                        "lang": ["python"],
                        "content": ["x = 1\n"],
                    }
                ),
            ]
        )
    )
    rref = repo_set(corpus)
    edges = extract_edges(corpus, repo_set_ref=rref).to_pandas()
    assert len(edges) == 1
    assert edges.iloc[0]["dst_repo"] == "repo000002"


def test_triple_edges_matches_reference_rule():
    """ref: prepleti.cpp:59-74 emission order and id arithmetic."""
    import numpy as np

    src = np.array([0, 3], dtype=np.uint64)
    dst = np.array([3, 1], dtype=np.uint64)
    s, d = gen.triple_edges(src, dst)
    assert list(zip(s.tolist(), d.tolist())) == [
        (0, 3), (3, 1),          # originals
        (7, 0), (5, 3),          # (max+dst+1) -> src   with max_id=3
        (4, 6), (7, 4),          # (max+src+1) -> (max+dst)
    ]


def test_dedup_keep_best_brute_force():
    """Keep-best canonical dedup == brute-force pandas: longest original
    survives, ties broken by smallest id, dup_count exact."""
    import hashlib
    import re

    import pandas as pd
    import ray.data as rd

    from engine.dedup import dedup_keep_best

    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(8), dtype="int64"),
            "text": [
                "Hello  World",   # canonical 'hello world', 12 chars
                "hello world",    # 11 chars
                "HELLO   WORLD ", # 14 chars -> the keeper
                "unique one",
                "Another Doc",
                "another  doc",   # 12 chars, ties nothing
                "another doc",
                "ANOTHER DOC",    # 11 chars ties doc 6 -> keep id 6
            ],
        }
    )
    docs["n_chars"] = docs["text"].str.len().astype("int64")
    got = (
        dedup_keep_best(rd.from_pandas(docs).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def canon(s):
        return hashlib.sha256(
            re.sub(r"\s+", " ", s.lower()).strip().encode()
        ).hexdigest()

    docs["h"] = docs["text"].map(canon)
    want = (
        docs.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        .groupby("h", as_index=False)
        .agg(doc_id=("doc_id", "first"), n_chars=("n_chars", "first"),
             dup_count=("doc_id", "size"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
    assert got["dup_count"].tolist() == want["dup_count"].tolist()
