"""MOSS-style winnowing document fingerprints (Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003): hash every character k-gram, slide a window of ``w``
consecutive gram positions, and record the RIGHTMOST MINIMAL hash per
window; the distinct (position, hash) pairs are the document's
fingerprints. Guarantee: any two documents sharing a substring of at
least ``w + k - 1`` characters share at least one fingerprint — the
classic local plagiarism/near-dup sketch, complementary to MinHash
(set-level) and SimHash (vector-level) in ``engine/dedup.py``.

Gram hash = DuckDB's ``md5_number_lower`` (md5 digest bytes 8..16,
little-endian — the repo's standard SQL-reproducible hash) mod 2^32, so
the whole operator is exactly checkable against a windowed-arg-max SQL
oracle. The per-gram md5 loop is the SQL-exactness price; a production
path swaps in a vectorized polynomial rolling hash (same selection
logic, one numpy pass) at the cost of the oracle.

Scale shape: stateless ``map_batches`` over the corpus — no shuffle, no
cross-document state; output volume ≈ 2·len(text)/(w+1) rows per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("pos", pa.int64()), ("hash", pa.int64())]
)


class Winnower:
    """Actor-pool batch stage: fingerprint each document. Documents with
    fewer than ``w + k - 1`` characters yield no full window and thus no
    fingerprints (the SIGMOD-03 semantics; the oracle's window-end set
    is empty for them too)."""

    def __init__(self, k: int = 4, w: int = 4,
                 text_col: str = "text", id_col: str = "doc_id"):
        if k < 1 or w < 1:
            raise ValueError("k and w must be >= 1")
        self.k, self.w = k, w
        self.text_col, self.id_col = text_col, id_col

    def _gram_hashes(self, s: str) -> np.ndarray:
        k = self.k
        n = len(s) - k + 1
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(s[p : p + k].encode()).digest()[8:], "little"
                )
                & 0xFFFFFFFF
                for p in range(n)
            ),
            dtype=np.int64,
            count=n,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, w = self.k, self.w
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_pos, out_hash = [], [], []
        for did, s in zip(ids, texts):
            s = s or ""
            n = len(s) - k + 1  # gram positions
            if n < w:
                continue
            hs = self._gram_hashes(s)
            win = np.lib.stride_tricks.sliding_window_view(hs, w)
            # rightmost minimum per window: argmin over the REVERSED
            # window returns the first (= rightmost in original order)
            sel = (
                np.arange(n - w + 1, dtype=np.int64)
                + (w - 1)
                - np.argmin(win[:, ::-1], axis=1)
            )
            sel = np.unique(sel)
            out_id.append(np.full(len(sel), did, dtype=np.int64))
            out_pos.append(sel)
            out_hash.append(hs[sel])
        if not out_id:
            return _SCHEMA.empty_table()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "pos": pa.array(np.concatenate(out_pos)),
                "hash": pa.array(np.concatenate(out_hash)),
            }
        )


def winnow_fingerprints(
    docs: ray.data.Dataset, k: int = 4, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Distinct winnowing fingerprints (doc_id, pos, hash) per document."""
    return docs.map_batches(
        Winnower(k=k, w=w, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
