"""Exact set-similarity self-join with prefix filtering — the
AllPairs/PPJoin family (Bayardo, Ma & Srikant, WWW'07; Xiao et al.,
WWW'08): every document pair whose token-set Jaccard similarity meets a
threshold, computed EXACTLY. The exact counterpart of MinHash-LSH
(probabilistic recall) in ``engine/dedup.py`` — use LSH for recall at
scale, this for an exact answer or to measure LSH recall.

Stages (all distributed):

1. document frequencies: per-batch distinct-token ``np.unique``
   combiner → tiny groupby Sum → a (df, token)-ascending global rank,
   broadcast once via ``ray.put`` (O(vocab) — guarded like the TF-IDF
   vocab broadcast; the rank order only affects SPEED, rarest-first
   minimizes candidates, so any cap/fallback ordering stays correct).
2. prefix emission (stateless ``map_batches``): a doc with n tokens
   emits only its first ``n - ceil(t*n) + 1`` rarest tokens — the
   PREFIX-FILTER theorem: two sets with Jaccard ≥ t must share a token
   inside both prefixes under any common total order.
3. per-bucket verify (``map_groups``): binary doc×token matrix, ONE
   integer matmul yields all pairwise intersection sizes,
   J = i / (na + nb − i), keep ≥ t — no per-pair Python loop.
4. distributed DISTINCT on (a, b) — a pair can share several prefix
   tokens — via ``dedup.distinct_pairs`` (sort-based, O(blocks)
   boundary metadata).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from .dedup import distinct_pairs

_WORD = re.compile(r"\w+")
MAX_BROADCAST_VOCAB = 5_000_000  # same tier as the TF-IDF vocab guard


def _doc_tokens(text: str | None) -> np.ndarray:
    return np.unique(_WORD.findall((text or "").lower()))


def jaccard_join(
    docs: ray.data.Dataset,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """All (a, b, jaccard) pairs, a < b, with token-set Jaccard ≥
    ``threshold``. Zero-token documents pair with nothing."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    def df_partial(t: pa.Table) -> pa.Table:
        toks = [
            _doc_tokens(x) for x in t.column(text_col).to_pylist()
        ]
        allt = (
            np.concatenate([x for x in toks if len(x)])
            if any(len(x) for x in toks)
            else np.empty(0, dtype="U1")
        )
        u, c = np.unique(allt, return_counts=True)
        return pa.table(
            {"token": pa.array(u), "df": pa.array(c.astype(np.int64))}
        )

    df = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    if len(df) > MAX_BROADCAST_VOCAB:
        raise ValueError(
            f"vocabulary {len(df)} exceeds the broadcast tier "
            f"({MAX_BROADCAST_VOCAB}); shard the corpus or pre-hash tokens"
        )
    order = df.sort_values(["df", "token"], kind="mergesort")
    rank = {t: i for i, t in enumerate(order["token"])}
    rank_ref = ray.put(rank)

    def emit_prefix(t: pa.Table, *, _r=rank_ref) -> pa.Table:
        r = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        texts = t.column(text_col).to_pylist()
        out_tok, out_id, out_txt = [], [], []
        for did, text in zip(ids, texts):
            toks = _doc_tokens(text)
            n = len(toks)
            if n == 0:
                continue
            p = n - math.ceil(threshold * n) + 1
            ranked = sorted(toks, key=r.__getitem__)[:p]
            out_tok.extend(ranked)
            out_id.extend([int(did)] * len(ranked))
            out_txt.extend([text] * len(ranked))
        return pa.table(
            {
                "btok": pa.array(out_tok, pa.string()),
                id_col: pa.array(out_id, pa.int64()),
                text_col: pa.array(out_txt, pa.string()),
            }
        )

    prefixed = docs.map_batches(emit_prefix, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        m = len(g)
        empty = pd.DataFrame(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "jaccard": np.empty(0, np.float64),
            }
        )
        if m < 2:
            return empty
        toks = [_doc_tokens(x) for x in g[text_col]]
        local = np.unique(np.concatenate(toks))
        M = np.zeros((m, len(local)), dtype=np.int32)
        for i, tk in enumerate(toks):
            M[i, np.searchsorted(local, tk)] = 1
        inter = M @ M.T
        sizes = M.sum(axis=1).astype(np.int64)
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / union  # int64 / int64 → float64, the oracle's op
        ai, bi = np.triu_indices(m, k=1)
        keep = jac[ai, bi] >= threshold
        if not keep.any():
            return empty
        ids = g[id_col].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "a": ids[ai[keep]],
                "b": ids[bi[keep]],
                "jaccard": np.round(jac[ai, bi][keep], 9),
            }
        )

    pairs = prefixed.groupby("btok").map_groups(verify, batch_format="pandas")
    return distinct_pairs(pairs, "jaccard", pa.float64())
