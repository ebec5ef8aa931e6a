"""Winnowing fingerprints (engine/winnow.py) — hand example, the
SIGMOD-03 shared-substring guarantee, and edge cases."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.winnow import Winnower, winnow_fingerprints

K, W = 4, 4


def _md5_32(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little") & 0xFFFFFFFF


def _ref(text: str):
    """Naive reference: rightmost minimum per window, distinct."""
    n = len(text) - K + 1
    if n < W:
        return set()
    hs = [_md5_32(text[p : p + K]) for p in range(n)]
    sel = set()
    for end in range(W - 1, n):
        window = list(range(end - W + 1, end + 1))
        m = min(hs[p] for p in window)
        p = max(p for p in window if hs[p] == m)  # rightmost tie
        sel.add((p, hs[p]))
    return sel


def test_winnower_matches_reference():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaa",  # constant hashes: rightmost-tie rule exercised
        "abcabcabcabcabc",  # periodic
        "short",  # 2 grams < w → no fingerprints
        "",  # empty
        None,  # null text
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = Winnower(k=K, w=W)(batch).to_pandas()
    for did, text in enumerate(texts):
        got = set(
            zip(
                out[out.doc_id == did]["pos"].tolist(),
                out[out.doc_id == did]["hash"].tolist(),
            )
        )
        assert got == _ref(text or ""), f"doc {did}"


def test_winnow_shared_substring_guarantee():
    """Two documents sharing a substring of length >= w + k - 1 share at
    least one fingerprint (the paper's core guarantee)."""
    shared = "GUARANTEED" * 2  # len 20 >= w + k - 1 = 7
    a = "xxxyyzz" + shared + "qqrrsst"
    b = "mmnnoop" + shared + "uuvvwwz"
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": [a, b]}))
    out = winnow_fingerprints(ds, k=K, w=W).to_pandas()
    ha = set(out[out.doc_id == 1]["hash"])
    hb = set(out[out.doc_id == 2]["hash"])
    assert ha & hb


def test_winnow_density():
    """Expected fingerprint density ~ 2/(w+1) of gram positions (paper
    §3); sanity-band it on random text."""
    rng = np.random.default_rng(9)
    text = "".join(rng.choice(list("abcdefghijklmnop"), 5000))
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]}))
    out = winnow_fingerprints(ds, k=K, w=W).to_pandas()
    density = len(out) / (len(text) - K + 1)
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4

def test_winnower_validation():
    with pytest.raises(ValueError):
        Winnower(k=0, w=4)
    with pytest.raises(ValueError):
        Winnower(k=4, w=0)
