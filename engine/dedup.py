"""Deduplication suite for training-data pipelines (first-class per the
build brief): exact, MinHash+LSH, SimHash, n-gram Jaccard verification,
embedding-cosine near-dup.

All signature stages are ``map_batches`` ACTOR POOLS (permutation tables /
regexes built once per actor); all hashing is process-stable (crc32 /
blake2 — never Python ``hash``, which is salted per process). Candidate
generation is a ``groupby`` on band/chunk keys (the LSH shuffle); exact
verification touches only candidate pairs.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle crc32 hashes (stable, C-speed)."""
    words = re.findall(r"\w+", text.lower())
    if len(words) < k:
        joined = [" ".join(words)] if words else [""]
    else:
        joined = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.fromiter(
            (zlib.crc32(s.encode()) for s in joined), dtype=np.int64, count=len(joined)
        )
    )


class MinHasher:
    """Actor-pool stage: doc batch → (doc_id, band, band_hash) LSH rows.

    K permutations h_i(x) = (a_i·x + b_i) mod p (Mersenne p = 2^61-1),
    deterministic from ``seed``; B bands × R rows, K = B·R.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42,
                 shingle_k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k).astype(object)  # object → exact bigint mod
        if len(sh) == 0:
            return np.zeros(len(self.a), dtype=np.int64)
        m = (sh[:, None] * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return m.min(axis=0).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.signature(t or "")
            for bnd in range(self.bands):
                chunk = sig[bnd * self.rows : (bnd + 1) * self.rows]
                h = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "little"
                ) >> 1
                out_id.append(i)
                out_band.append(bnd)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.int64()),
            }
        )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    return inter / (len(sa) + len(sb) - inter)


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple | None = None,
    max_bucket: int = 64,
) -> dict:
    """Full near-dup pipeline. Returns
    ``{"pairs": [(a, b, jaccard)...], "clusters": {doc_id: root_id}}``
    (root = smallest doc_id in the near-dup cluster).

    Stages: minhash actor pool → LSH bucket groupby → candidate pairs →
    exact Jaccard verify on the candidates only (second read pruned by a
    broadcast candidate-id set) → union-find over surviving pairs (the
    candidate graph is tiny relative to the corpus; a distributed min-label
    pass — engine.components — is the fallback if it ever isn't).
    Buckets larger than ``max_bucket`` are skipped as degenerate (identical
    boilerplate); exact dedup should collapse those first.
    """
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, text_col=text_col, id_col=id_col
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    buckets = sig.groupby(["band", "band_hash"]).aggregate(
        Count(alias_name="sz"), Min("doc_id", alias_name="first_id")
    )
    # candidate buckets = size in [2, max_bucket]
    cand = buckets.map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.greater(t.column("sz"), 1),
                pa.compute.less_equal(t.column("sz"), max_bucket),
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    if cand.count() == 0:
        return {"pairs": [], "clusters": {}}
    # join signatures back to candidate buckets to enumerate pairs
    cand_keys = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        for bnd, h in zip(b.column("band").to_pylist(), b.column("band_hash").to_pylist()):
            cand_keys.add((bnd, h))
    keys_ref = ray.put(cand_keys)

    def in_cand(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        bnd = batch.column("band").to_pylist()
        h = batch.column("band_hash").to_pylist()
        mask = pa.array([(x, y) in keys for x, y in zip(bnd, h)])
        return batch.filter(mask)

    members = sig.map_batches(in_cand, batch_format="pyarrow")
    pairs: set[tuple[int, int]] = set()
    from collections import defaultdict

    bucket_members = defaultdict(list)
    for b in members.iter_batches(batch_format="pyarrow"):
        for i, bnd, h in zip(
            b.column("doc_id").to_pylist(),
            b.column("band").to_pylist(),
            b.column("band_hash").to_pylist(),
        ):
            bucket_members[(bnd, h)].append(i)
    for mem in bucket_members.values():
        mem = sorted(set(mem))
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                pairs.add((mem[x], mem[y]))
    if not pairs:
        return {"pairs": [], "clusters": {}}

    # exact verify: fetch candidate texts only (pruned read)
    cand_ids = sorted({i for p in pairs for i in p})
    ids_ref = ray.put(np.asarray(cand_ids, dtype=np.int64))

    def keep_cand(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        idv = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cids, idv)
        pos[pos >= len(cids)] = len(cids) - 1
        return batch.filter(pa.array(cids[pos] == idv))

    texts = {}
    for b in ds.map_batches(keep_cand, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for i, t in zip(b.column(id_col).to_pylist(), b.column(text_col).to_pylist()):
            texts[i] = t
    verified = []
    for a_, b_ in sorted(pairs):
        j = jaccard(texts[a_] or "", texts[b_] or "")
        if j >= threshold:
            verified.append((a_, b_, j))

    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a_, b_, _ in verified:
        parent.setdefault(a_, a_)
        parent.setdefault(b_, b_)
        ra, rb = find(a_), find(b_)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    clusters = {x: find(x) for x in parent}
    return {"pairs": verified, "clusters": clusters}


class SimHasher:
    """Actor-pool stage: doc batch → (doc_id, simhash uint64, chunk keys).

    64-bit SimHash over word unigrams (crc32-stable token hashes); the 4
    16-bit chunks are emitted as LSH keys — two docs within Hamming
    distance 3 share at least one chunk (pigeonhole)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.word = re.compile(r"\w+")
        self.text_col = text_col
        self.id_col = id_col

    def fingerprint(self, text: str) -> int:
        toks = self.word.findall((text or "").lower())
        if not toks:
            return 0
        hs = np.fromiter(
            (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
        )
        # widen to 64 bits deterministically
        hs = hs * np.uint64(0x9E3779B97F4A7C15)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(
            np.bitwise_or.reduce(
                (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
            )
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        fps = [self.fingerprint(t) for t in texts]
        out_id, out_chunk, out_key, out_fp = [], [], [], []
        for i, fp in zip(ids, fps):
            for c in range(4):
                out_id.append(i)
                out_chunk.append(c)
                out_key.append((fp >> (16 * c)) & 0xFFFF)
                out_fp.append(fp)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "chunk": pa.array(out_chunk, type=pa.int32()),
                "chunk_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(np.array(out_fp, dtype=np.uint64), type=pa.uint64()),
            }
        )


def simhash_near_dups(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple | None = None,
    max_bucket: int = 64,
) -> list[tuple[int, int, int]]:
    """Near-dup pairs (a, b, hamming) with distance ≤ max_hamming, via
    16-bit-chunk LSH buckets + exact Hamming verify in the bucket."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    sig = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).materialize()
    from collections import defaultdict

    buckets = defaultdict(list)
    for b in sig.iter_batches(batch_format="pyarrow"):
        for i, c, k, fp in zip(
            b.column("doc_id").to_pylist(),
            b.column("chunk").to_pylist(),
            b.column("chunk_key").to_pylist(),
            b.column("simhash").to_pylist(),
        ):
            buckets[(c, k)].append((i, fp))
    out = set()
    for mem in buckets.values():
        if len(mem) < 2 or len(mem) > max_bucket:
            continue
        mem = sorted(set(mem))
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                (ia, fa), (ib, fb) = mem[x], mem[y]
                if ia == ib:
                    continue
                d = int(bin(fa ^ fb).count("1"))
                if d <= max_hamming:
                    out.add((min(ia, ib), max(ia, ib), d))
    return sorted(out)


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> list[tuple[int, int, float]]:
    """Cosine near-dup pairs via blocked matmul of each batch against the
    broadcast full matrix (O(n²/B) per batch, distributed across batches).
    Scale path: IVF/LSH-bucket first (engine.annsearch.ivf_build), then run
    this within buckets."""
    from .annsearch import _batch_matrix

    rows = []
    ids = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        rows.append(_batch_matrix(b, col))
        ids.append(b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
    m = np.concatenate(rows)
    all_ids = np.concatenate(ids)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    m_ref = ray.put((m, all_ids))

    def pairs_batch(batch: pa.Table) -> pa.Table:
        mm, aid = ray.get(m_ref)
        bm = _batch_matrix(batch, col)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        bid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sims = bm @ mm.T
        ai, bj = np.nonzero(sims >= threshold)
        a_ids, b_ids = bid[ai], aid[bj]
        keep = a_ids < b_ids  # each unordered pair once, no self-pairs
        return pa.table(
            {
                "a": pa.array(a_ids[keep]),
                "b": pa.array(b_ids[keep]),
                "cos_sim": pa.array(sims[ai, bj][keep]),
            }
        )

    out = []
    res = ds.map_batches(pairs_batch, batch_format="pyarrow")
    for b in res.iter_batches(batch_format="pyarrow"):
        out.extend(
            zip(
                b.column("a").to_pylist(),
                b.column("b").to_pylist(),
                b.column("cos_sim").to_pylist(),
            )
        )
    return sorted(out)
