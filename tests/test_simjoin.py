"""Exact prefix-filtered Jaccard self-join (engine/simjoin.py)."""

import itertools
import re

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from engine.simjoin import jaccard_join

WORD = re.compile(r"\w+")


def _brute(texts: dict, t: float) -> dict:
    sets = {i: set(WORD.findall((x or "").lower())) for i, x in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        A, B = sets[a], sets[b]
        if not A or not B:
            continue
        j = len(A & B) / len(A | B)
        if j >= t:
            out[(a, b)] = round(j, 9)
    return out


def _random_corpus(rng, n_docs, vocab, lo, hi):
    words = [f"w{i}" for i in range(vocab)]
    texts = {}
    for d in range(n_docs):
        k = int(rng.integers(lo, hi))
        texts[d] = " ".join(rng.choice(words, size=k, replace=True))
    # plant a few heavy overlaps so thresholds actually fire
    texts[n_docs] = texts[0]
    texts[n_docs + 1] = texts[1] + " extraword"
    return texts


@pytest.mark.parametrize("t", [0.5, 0.8, 1.0])
def test_jaccard_join_matches_bruteforce(t):
    rng = np.random.default_rng(31)
    texts = _random_corpus(rng, 40, vocab=30, lo=5, hi=25)
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    want = _brute(texts, t)
    out = jaccard_join(
        rd.from_pandas(df).repartition(7), threshold=t
    ).to_pandas()
    got = {
        (int(r.a), int(r.b)): round(float(r.jaccard), 9)
        for r in out.itertuples()
    }
    assert got == want  # completeness AND exactness of the prefix filter


def test_jaccard_join_edge_cases():
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["same same", "same", "", None]}
    )
    out = jaccard_join(rd.from_pandas(df), threshold=0.9).to_pandas()
    # {same} vs {same}: J = 1.0; empty/null docs pair with nothing
    assert {(int(r.a), int(r.b)) for r in out.itertuples()} == {(1, 2)}
    with pytest.raises(ValueError):
        jaccard_join(rd.from_pandas(df), threshold=0.0)
    with pytest.raises(ValueError):
        jaccard_join(rd.from_pandas(df), threshold=1.5)
