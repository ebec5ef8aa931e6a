"""Deduplication suite for training-data pipelines (first-class per the
build brief): exact, MinHash+LSH, SimHash, n-gram Jaccard verification,
embedding-cosine near-dup.

All signature stages are ``map_batches`` ACTOR POOLS (permutation tables /
regexes built once per actor); all hashing is process-stable (crc32 /
blake2 — never Python ``hash``, which is salted per process). Candidate
generation is a ``groupby`` on band/chunk keys (the LSH shuffle); pair
enumeration and exact verification run INSIDE ``groupby.map_groups`` on
those keys — the driver never holds bucket membership, signatures,
candidate texts, or even the verified pairs: pair outputs are RETURNED AS
DATASETS, deduped distributed with the house sort-based-distinct pattern
(a high-dup-rate 100-TB corpus has a pair set proportional to the corpus;
collecting it driver-side would be an O(output) materialization). Cluster
assignment runs as a distributed min-label connected-components pass over
the pair graph, not a driver union-find.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from .util import nonempty_block_refs

_MERSENNE = (1 << 61) - 1
_M61 = np.uint64(_MERSENNE)


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


def _mod_m61(x: np.ndarray) -> np.ndarray:
    """Exact ``x mod (2^61-1)`` for uint64 ``x`` (any value < 2^64)."""
    x = (x & _M61) + (x >> np.uint64(61))
    return np.where(x >= _M61, x - _M61, x)


class MinHasher:
    """Actor-pool stage: doc batch → (doc_id, band, band_hash) LSH rows.

    K permutations h_i(x) = (a_i·x + b_i) mod p (Mersenne p = 2^61-1),
    deterministic from ``seed``; B bands × R rows, K = B·R.

    The mod-p multiply runs in pure uint64 numpy (no object-dtype bignums):
    shingle hashes are crc32 (< 2^32), so with a split a = a_hi·2^32 + a_lo
    every intermediate product fits 64 bits exactly, and ·2^32 mod p is a
    61-bit rotate (2^61 ≡ 1 mod p). Bit-identical to exact big-int math.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, seed: int = 42,
                 shingle_k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
        # uint64 split forms for the exact Mersenne mulmod
        au = self.a.astype(np.uint64)
        self._a_lo = (au & np.uint64(0xFFFFFFFF))[None, :]
        self._a_hi = (au >> np.uint64(32))[None, :]
        self._b_u = self.b.astype(np.uint64)[None, :]
        self.bands = bands
        self.rows = num_perm // bands
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if len(sh) == 0:
            return np.zeros(len(self.a), dtype=np.int64)
        x = sh.astype(np.uint64)[:, None]  # crc32 < 2^32
        lo = _mod_m61(x * self._a_lo)      # < 2^32·2^32 = 2^64: exact
        hi = _mod_m61(x * self._a_hi)      # < 2^32·2^29 = 2^61: exact
        # hi·2^32 mod p: rotate left 32 within 61 bits (2^61 ≡ 1 mod p)
        hi = _mod_m61(
            ((hi & np.uint64((1 << 29) - 1)) << np.uint64(32))
            + (hi >> np.uint64(29))
        )
        m = _mod_m61(_mod_m61(lo + hi) + self._b_u)
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


def _empty_pairs(value_col: str, value_type: pa.DataType) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), (value_col, value_type)]
        ).empty_table()
    )


def distinct_pairs(
    pair_rows: ray.data.Dataset, value_col: str, value_type: pa.DataType
) -> ray.data.Dataset:
    """Distributed DISTINCT on (a, b) pair rows (the value column is a
    deterministic function of the pair, so duplicate rows are identical).

    One global sort by (a, b) → per-block dedup of adjacent duplicates →
    cross-boundary duplicate runs dropped by comparing against the
    previous block's last pair — O(blocks) boundary metadata on the
    driver, never pair rows (the same sort-based-distinct pattern as
    ``graph._sorted_distinct_refs``; Ray 2.49's hash aggregate is ~100×
    slower than its sort at size)."""
    arrow = pair_rows.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(["a", "b"]).materialize()
    refs = nonempty_block_refs(s)
    if not refs:
        return _empty_pairs(value_col, value_type)

    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), (value_col, value_type)]
    )

    @ray.remote(num_returns=2)
    def dedup_block(tbl):
        if not isinstance(tbl, pa.Table):
            # Ray's sort can surface the original block unchanged on
            # degenerate plans, so a pandas-blocked source may reach us
            # despite the arrow normalization stage
            tbl = pa.Table.from_pandas(tbl, preserve_index=False)
        a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        # rows arrive sorted by (a, b): a new pair starts wherever either
        # key differs from the previous row
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        kept = tbl.filter(pa.array(keep)).select(out_schema.names).cast(out_schema)
        last = (int(a[-1]), int(b[-1]))
        return kept, last

    pairs = [dedup_block.remote(r) for r in refs]
    lasts = ray.get([m for _, m in pairs])

    @ray.remote
    def drop_leading(tbl: pa.Table, prev_last) -> pa.Table:
        pa_, pb_ = prev_last
        a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        # blocks are range-partitioned, so the nearest previous block's
        # last pair bounds every earlier pair — one prefix scan drops the
        # whole cross-boundary duplicate run however many blocks it spans
        gt = (a > pa_) | ((a == pa_) & (b > pb_))
        k = int(np.argmax(gt)) if gt.any() else len(a)
        return tbl.slice(k)

    final_refs = [pairs[0][0]]
    for i in range(1, len(pairs)):
        final_refs.append(drop_leading.remote(pairs[i][0], lasts[i - 1]))
    return ray.data.from_arrow_refs(final_refs)


# Above this many pair rows the cluster pass routes to the BSP shard-actor
# CC engine (no O(V) driver arrays, no per-round hash aggregate); below it
# the broadcast min-label engine is cheaper (the pair graph's label vector
# is a few MB and a BSPGraph build would dominate). At 100-TB dup rates the
# pair graph is corpus-proportional and the BSP tier is the one that runs.
BSP_PAIR_THRESHOLD = 2_000_000


def cluster_pairs(
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
    num_shards: int | None = None,
) -> ray.data.Dataset:
    """Near-dup cluster assignment from a verified-pair Dataset: a
    min-label connected-components pass over the pair graph, root =
    smallest doc_id in the cluster — the same fixpoint a union-find
    reaches, without collecting the pair list on the driver. Only docs
    that appear in a pair get a row.

    Tier routing: pair graphs under :data:`BSP_PAIR_THRESHOLD` rows run
    the broadcast min-label engine (``engine.components`` — O(V) label
    vector on the driver, fine at a few MB); larger ones run the fully
    partitioned BSP shard-actor CC (``engine.bsp`` — no O(V) driver
    state), since at a high dup rate the pair set is corpus-proportional.
    """
    edges = pairs.map_batches(
        lambda t: pa.table(
            {"src": t.column("a").cast(pa.int64()),
             "dst": t.column("b").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    empty = pa.schema(
        [(id_col, pa.int64()), (cluster_col, pa.int64())]
    ).empty_table()
    n_pairs = edges.count()
    if n_pairs == 0:
        return ray.data.from_arrow(empty)
    if n_pairs >= BSP_PAIR_THRESHOLD:
        from .bsp import bsp_connected_components_dataset
        from .util import default_concurrency

        labeled, _rounds = bsp_connected_components_dataset(
            edges, num_shards=num_shards or default_concurrency()
        )
        lbl_col = "label_id"
    else:
        from .components import connected_components_dataset

        labeled, _rounds = connected_components_dataset(edges)
        lbl_col = "label"
    return labeled.map_batches(
        lambda t: pa.table(
            {id_col: t.column("id").cast(pa.int64()),
             cluster_col: t.column(lbl_col).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


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
    ``{"pairs": Dataset (a, b, j), "clusters": Dataset (doc_id, cluster)}``
    — pairs distinct and sorted by (a, b); cluster = smallest doc_id in
    the near-dup cluster, one row per doc that appears in a pair.

    Stages (all distributed; driver holds only the candidate-bucket key
    array and the candidate doc-id array — both small broadcast sides —
    never pair rows):

      1. minhash actor pool → (doc_id, band, band_hash), materialized once.
      2. LSH bucket sizes: ``groupby(band, band_hash).Count``; candidate
         buckets have size in [2, max_bucket] (larger = degenerate
         boilerplate; exact dedup should collapse those first).
      3. candidate member rows: vectorized ``np.isin`` against the
         broadcast candidate band_hash array (64-bit; cross-band hash
         collisions are harmless — grouping below is exact).
      4. texts attached to members via a reduce-side groupby(doc_id) join
         against the candidate-pruned corpus slice (no driver text dict).
      5. pair enumeration + exact Jaccard verify INSIDE
         ``groupby(band, band_hash).map_groups`` — shingles computed once
         per member per bucket, pairs emitted only at j ≥ threshold.
      6. global pair dedup (same pair verified in several bands) via the
         distributed sort-based distinct; clusters via a distributed
         min-label CC pass over the pair graph (:func:`cluster_pairs`).
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
    ).materialize()  # consumed twice below — never recompute the actor stage
    buckets = sig.groupby(["band", "band_hash"]).aggregate(
        Count(alias_name="sz")
    ).materialize()
    cand = buckets.map_batches(
        lambda t: t.filter(
            pa.compute.and_(
                pa.compute.greater(t.column("sz"), 1),
                pa.compute.less_equal(t.column("sz"), max_bucket),
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    # NO SILENT CAPS (same contract as simhash_near_dups): buckets past
    # max_bucket lose recall for their members, so the drop is COUNTED
    # and returned for the caller to alert on
    dropped_buckets = 0
    dropped_doc_slots = 0
    for t in buckets.map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("sz"), max_bucket)),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        dropped_buckets += t.num_rows
        dropped_doc_slots += int(
            pa.compute.sum(t.column("sz")).as_py() or 0
        )

    def _empty_result() -> dict:
        return {
            "dropped_buckets": dropped_buckets,
            "dropped_doc_slots": dropped_doc_slots,
            "pairs": _empty_pairs("j", pa.float64()),
            "clusters": ray.data.from_arrow(
                pa.schema(
                    [("doc_id", pa.int64()), ("cluster", pa.int64())]
                ).empty_table()
            ),
        }

    if cand.count() == 0:
        return _empty_result()

    # broadcast small side #1: candidate bucket hashes (one int per bucket)
    cand_hashes = np.sort(
        np.concatenate(
            [
                b.column("band_hash").to_numpy(zero_copy_only=False)
                for b in cand.iter_batches(batch_format="pyarrow")
            ]
        )
    )
    hashes_ref = ray.put(cand_hashes)

    def in_cand(batch: pa.Table) -> pa.Table:
        hs = ray.get(hashes_ref)
        h = batch.column("band_hash").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hs, h)
        pos[pos >= len(hs)] = len(hs) - 1
        return batch.filter(pa.array(hs[pos] == h))

    members = (
        sig.map_batches(in_cand, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                text_col, pa.array([None] * len(t), type=pa.string())
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # broadcast small side #2: candidate doc ids (prunes the corpus re-read)
    cand_ids = np.unique(
        np.concatenate(
            [
                b.column("doc_id").to_numpy(zero_copy_only=False)
                for b in members.select_columns(["doc_id"]).iter_batches(
                    batch_format="pyarrow"
                )
            ]
        )
    )
    if len(cand_ids) == 0:
        return _empty_result()
    ids_ref = ray.put(cand_ids)

    def docs_rows(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        idv = batch.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cids, idv)
        pos[pos >= len(cids)] = len(cids) - 1
        kept = batch.filter(pa.array(cids[pos] == idv))
        return pa.table(
            {
                "doc_id": pa.array(
                    kept.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "band": pa.array(np.full(len(kept), -1, dtype=np.int32)),
                "band_hash": pa.array(np.zeros(len(kept), dtype=np.int64)),
                text_col: kept.column(text_col).cast(pa.string()),
            }
        )

    docs_cand = ds.map_batches(docs_rows, batch_format="pyarrow")

    # reduce-side join: one group per candidate doc; the band=-1 row carries
    # the text, member rows get it attached
    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        tmask = g["band"].to_numpy() == -1
        if not tmask.any():
            return g.iloc[0:0]
        text = g.loc[tmask, text_col].iloc[0]
        out = g.loc[~tmask].copy()
        out[text_col] = text
        return out

    with_text = (
        members.union(docs_cand).groupby("doc_id").map_groups(
            attach_text, batch_format="pandas"
        )
    )

    # per-bucket pair enumeration + exact Jaccard verify, fully distributed
    def verify_bucket(g: pd.DataFrame, thr=threshold) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "j": pd.Series(dtype="float64")})
        if len(g) < 2 or len(g) > max_bucket:
            return empty
        g = g.sort_values("doc_id")
        ids_ = g["doc_id"].to_numpy()
        sh = [_shingles(t or "") for t in g[text_col].tolist()]
        rows_a, rows_b, rows_j = [], [], []
        for x in range(len(ids_)):
            for y in range(x + 1, len(ids_)):
                sa, sb = sh[x], sh[y]
                if len(sa) == 0 and len(sb) == 0:
                    j = 1.0
                else:
                    inter = len(np.intersect1d(sa, sb))
                    j = inter / (len(sa) + len(sb) - inter)
                if j >= thr:
                    rows_a.append(int(ids_[x]))
                    rows_b.append(int(ids_[y]))
                    rows_j.append(j)
        if not rows_a:
            return empty
        return pd.DataFrame({"a": rows_a, "b": rows_b, "j": rows_j})

    pair_rows = with_text.groupby(["band", "band_hash"]).map_groups(
        verify_bucket, batch_format="pandas"
    )

    # distributed finish: distinct pairs (same pair verified in several
    # bands), then clusters as a min-label CC pass — no driver pair loop
    pairs = distinct_pairs(pair_rows, "j", pa.float64()).materialize()
    return {
        "pairs": pairs,
        "clusters": cluster_pairs(pairs),
        "dropped_buckets": dropped_buckets,
        "dropped_doc_slots": dropped_doc_slots,
    }


class SimHasher:
    """Actor-pool stage: doc batch → (doc_id, simhash uint64, pair keys).

    64-bit SimHash over word unigrams (md5-stable token hashes). LSH keys
    are 2-of-6 CHUNK PAIRS: the fingerprint splits into 6 chunks
    (11+11+11+11+10+10 bits) and each of the C(6,2)=15 pairs emits a
    combined key (chunk_i shifted left 22 | chunk_j — injective; the
    populated key space per pair is 2^(w_i + w_j) ≤ 2^22 combinations).
    Two docs within Hamming distance h differ in at most h chunks, so for
    h ≤ 4 at least two chunks are untouched and the docs share ≥1 pair
    key (pigeonhole) — guaranteed recall at h ≤ 4. Versus single 16-bit
    chunks this widens the populated key space from 4·2^16 to ~15·2^22
    buckets, which keeps bucket sizes sub-``max_bucket`` at corpus scale
    instead of silently saturating."""

    CHUNK_OFFSETS = np.array([0, 11, 22, 33, 44, 54], dtype=np.uint64)
    CHUNK_WIDTHS = np.array([11, 11, 11, 11, 10, 10], dtype=np.uint64)
    PAIRS = [(i, j) for i in range(6) for j in range(i + 1, 6)]

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.word = re.compile(r"\w+")
        self.text_col = text_col
        self.id_col = id_col

    def fingerprint(self, text: str) -> int:
        toks = self.word.findall((text or "").lower())
        if not toks:
            return 0
        # token hash = low 8 digest bytes of md5, little-endian — exactly
        # DuckDB's md5_number_lower(), so fingerprints are SQL-checkable
        # (see ORACLE_SQL["simhash_fingerprints"])
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
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
        ids = np.asarray(
            batch.column(self.id_col).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        texts = batch.column(self.text_col).to_pylist()
        fps = np.array(
            [self.fingerprint(t) for t in texts], dtype=np.uint64
        ).reshape(len(texts))
        masks = ((np.uint64(1) << self.CHUNK_WIDTHS) - np.uint64(1))
        chunks = (fps[:, None] >> self.CHUNK_OFFSETS[None, :]) & masks[None, :]
        keys = np.stack(
            [
                (chunks[:, i] << np.uint64(22)) | chunks[:, j]
                for i, j in self.PAIRS
            ],
            axis=1,
        )  # (n, 15)
        npairs = len(self.PAIRS)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, npairs), type=pa.int64()),
                "chunk": pa.array(
                    np.tile(np.arange(npairs, dtype=np.int32), len(ids))
                ),
                "chunk_key": pa.array(
                    keys.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                "simhash": pa.array(np.repeat(fps, npairs), type=pa.uint64()),
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized uint64 popcount (SWAR)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


SIMHASH_GUARANTEED_HAMMING = 4  # 2-of-6 chunk pairs: h ≤ 4 always bucketed


def simhash_near_dups(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | tuple | None = None,
    max_bucket: int = 64,
) -> dict:
    """Near-dup pairs with Hamming distance ≤ max_hamming, via 2-of-6
    chunk-pair LSH buckets + exact Hamming verify. Returns
    ``{"pairs": Dataset (a, b, hamming) distinct, "dropped_buckets": int,
    "dropped_doc_slots": int}`` — NO SILENT CAPS: a bucket larger than
    ``max_bucket`` (degenerate boilerplate; exact dedup should collapse it
    first) is skipped but COUNTED, so zero recall can never masquerade as
    "no near-dups". Recall is guaranteed for
    ``max_hamming ≤ SIMHASH_GUARANTEED_HAMMING`` (= 4) when no bucket is
    dropped; larger radii are best-effort.

    The signature rows already carry the full fingerprint, so pairing needs
    no text join: each (chunk, chunk_key) bucket is paired inside
    ``groupby.map_groups`` with a vectorized XOR-popcount — no driver-side
    signature dict. Pairs are deduped distributed (the same pair fires in
    up to 15 chunk-pair buckets) and returned as a Dataset; only the two
    dropped-bucket counters reach the driver."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    sig = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket_pairs(g: pd.DataFrame, maxh=max_hamming) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
        if len(g) < 2:
            return empty
        g = g.drop_duplicates("doc_id")
        if len(g) > max_bucket:
            # marker row: (-1, bucket size, -1) — the driver tallies these
            return pd.DataFrame({"a": [-1], "b": [len(g)], "hamming": [-1]})
        g = g.sort_values("doc_id")
        ids_ = g["doc_id"].to_numpy(dtype=np.int64)
        fps = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids_) < 2:
            return empty
        d = _popcount64(fps[:, None] ^ fps[None, :])
        ai, bj = np.nonzero(np.triu(d <= maxh, k=1))
        if len(ai) == 0:
            return empty
        return pd.DataFrame(
            {"a": ids_[ai], "b": ids_[bj], "hamming": d[ai, bj].astype(np.int64)}
        )

    pair_rows = sig.groupby(["chunk", "chunk_key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    ).materialize()

    # dropped-bucket accounting: per-batch combine of the marker rows —
    # the driver reads one (count, slots) partial per block, never pairs
    def marker_partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column("hamming").to_numpy(zero_copy_only=False).astype(np.int64)
        m = (a == -1) & (h == -1)
        slots = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "buckets": pa.array([int(m.sum())], type=pa.int64()),
                "slots": pa.array([int(slots[m].sum())], type=pa.int64()),
            }
        )

    dropped_buckets = 0
    dropped_doc_slots = 0
    for b in pair_rows.map_batches(
        marker_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        dropped_buckets += int(b.column("buckets").to_numpy().sum())
        dropped_doc_slots += int(b.column("slots").to_numpy().sum())

    real = pair_rows.map_batches(
        lambda t: t.filter(
            pa.compute.invert(
                pa.compute.and_(
                    pa.compute.equal(t.column("a"), pa.scalar(-1)),
                    pa.compute.equal(t.column("hamming"), pa.scalar(-1)),
                )
            )
        ),
        batch_format="pyarrow",
    )
    return {
        "pairs": distinct_pairs(real, "hamming", pa.int64()),
        "dropped_buckets": dropped_buckets,
        "dropped_doc_slots": dropped_doc_slots,
    }


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """EXACT cosine near-dup pairs via blocked matmul of each batch against
    the broadcast full matrix (O(n²/B) per batch, distributed across
    batches; the broadcast side is O(n·dim) — one object-store copy per
    node, viable to ~1e7×768 f64). Returns a Dataset (a, b, cos_sim) —
    each unordered pair exactly once (each a-row lives in exactly one
    batch), so no distinct pass is needed and the output streams. The
    scale path beyond the broadcast tier is ``embedding_near_dups_ivf``
    (bucketed, no full broadcast)."""
    from .annsearch import _batch_matrix

    # materialize: the broadcast-matrix pass and the pairs pass both
    # consume ds — lazy, the upstream plan would execute twice
    ds = ds.materialize()
    rows = []
    ids = []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 16):
        rows.append(_batch_matrix(b, col))
        ids.append(b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64))
    if not rows:
        return _empty_pairs("cos_sim", pa.float64())
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
                "a": pa.array(a_ids[keep], type=pa.int64()),
                "b": pa.array(b_ids[keep], type=pa.int64()),
                "cos_sim": pa.array(sims[ai, bj][keep], type=pa.float64()),
            }
        )

    # bound the per-task sims buffer (batch x n float64): at n = 1e7 an
    # unbounded batch would allocate tens of GB in one matmul
    bs = int(max(64, min(1 << 16, (2 * 10**8) // max(len(all_ids), 1))))
    return ds.map_batches(pairs_batch, batch_format="pyarrow", batch_size=bs)


def embedding_near_dups_ivf(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    num_centroids: int | None = None,
    assign_top: int = 2,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> ray.data.Dataset:
    """Bucketed cosine near-dup — the 100-TB path: no full-matrix
    broadcast, pairs returned as a distinct Dataset (a, b, cos_sim).

    Composes the IVF build (engine.annsearch centroids) with per-bucket
    all-pairs: each vector is assigned to its ``assign_top`` nearest
    centroids (multi-probe insertion), then pairs are enumerated inside
    ``groupby("bucket").map_groups`` with one matmul per bucket. A pair is
    found iff the two vectors share ≥1 bucket — near-identical vectors
    (cos ≥ 0.95) share their top centroid with high probability; raise
    ``assign_top`` for recall (assign_top == num_centroids is exhaustive
    and equals the brute-force output — the pytest equivalence anchor)."""
    from .annsearch import _batch_matrix, _fit_centroids

    cent = _fit_centroids(ds, num_centroids, id_col=id_col, col=col)
    top = min(assign_top, len(cent))
    cent_ref = ray.put(cent)

    def assign_multi(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        mm = _batch_matrix(batch, col)
        nm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-30)
        sims = nm @ cc.T
        near = np.argsort(-sims, axis=1, kind="stable")[:, :top]
        bid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n, dim = nm.shape
        rep = np.repeat(np.arange(n), top)
        return pa.table(
            {
                "bucket": pa.array(near.reshape(-1).astype(np.int32)),
                id_col: pa.array(bid[rep]),
                # normalized vector carried into the bucket (fixed-size list)
                col: pa.FixedSizeListArray.from_arrays(
                    pa.array(nm[rep].reshape(-1)), dim
                ),
            }
        )

    bucketed = ds.map_batches(assign_multi, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame, thr=threshold) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "cos_sim": pd.Series(dtype="float64")})
        g = g.drop_duplicates(id_col)
        if len(g) < 2:
            return empty
        ids_ = g[id_col].to_numpy(dtype=np.int64)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[col].tolist()])
        # blocked upper-triangle matmul: a dup-heavy corpus concentrates
        # near-identical vectors into one centroid's bucket, and a k x k
        # sims matrix in one shot is O(k^2) memory — block rows so the
        # live buffer stays ~rows_per_block x k
        k = len(ids_)
        blk = int(max(64, min(k, (2 * 10**8) // max(k, 1))))
        outs = []
        for s in range(0, k, blk):
            e = min(s + blk, k)
            sims = m[s:e] @ m.T
            ai, bj = np.nonzero(sims >= thr)
            keep = (ai + s) < bj  # upper triangle only, no self-pairs
            if keep.any():
                a_ids, b_ids = ids_[ai[keep] + s], ids_[bj[keep]]
                swap = a_ids > b_ids  # group order != id order
                a_ids[swap], b_ids[swap] = b_ids[swap], a_ids[swap]
                outs.append(
                    pd.DataFrame(
                        {"a": a_ids, "b": b_ids,
                         "cos_sim": sims[ai[keep], bj[keep]]}
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    pair_rows = bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # same pair found in up to ``assign_top`` shared buckets → distinct
    # distributed (sort-based); the driver never touches pair rows
    return distinct_pairs(pair_rows, "cos_sim", pa.float64())


def canonical_dedup(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Canonicalized exact dedup — the "same document modulo case and
    whitespace" tier between byte-exact sha256 dedup and MinHash: lower
    → collapse ``\\s+`` to one space → trim, all vectorized pyarrow
    kernels (RE2 — the same regex engine DuckDB's oracle uses), then
    sha256 of the canonical form so the exchange ships 64-hex keys,
    never document bodies. One row per canonical text: smallest
    surviving id + duplicate count, settled by the SORT-BASED grouped
    (min, sum) reduce — the group key is near-unique per document, the
    exact big-output shape Ray 2.49's hash aggregate handles ~100×
    slower than its sort (CLAUDE.md)."""
    import pyarrow.compute as pc

    from .ingest import sha256_column
    from .ntile import grouped_sums_sorted

    def norm(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t.column(text_col))
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        return pa.table(
            {
                "norm_sha256": sha256_column(x),
                id_col: t.column(id_col),
                "_1": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    return grouped_sums_sorted(
        docs.map_batches(norm, batch_format="pyarrow"),
        "norm_sha256",
        [id_col, "_1"],
        [id_col, "dup_count"],
        op=["min", "sum"],
    )


def dedup_keep_best(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> ray.data.Dataset:
    """Keep-BEST exact dedup — the curation variant of
    :func:`canonical_dedup`: within each case/whitespace-canonical group,
    survive the row with the HIGHEST ``score_col`` (ties → smallest id)
    instead of the smallest id. Canonical variants differ in original
    length, so "longest original" is the standard keep rule. Runs as the
    same single sort-based grouped reduce: (score, id) are packed into
    one order-preserving int64 (score·2⁴⁰ + (2⁴⁰−1−id)) so the argmax is
    a plain grouped MAX — no per-group materialization, no second pass
    to fetch the winner's attributes."""
    import pyarrow.compute as pc

    from .ingest import sha256_column
    from .ntile import grouped_sums_sorted

    ID_SPACE = np.int64(1) << 40  # id < 2^40, score < 2^23 → packs in int64

    def norm(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        score = (
            t.column(score_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if len(ids) and (
            ids.min() < 0 or ids.max() >= ID_SPACE or score.max() >= (1 << 23)
        ):
            raise ValueError("keep-best packing needs id < 2^40, score < 2^23")
        x = pc.utf8_lower(t.column(text_col))
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        return pa.table(
            {
                "norm_sha256": sha256_column(x),
                "_ord": pa.array(score * ID_SPACE + (ID_SPACE - 1 - ids)),
                "_1": pa.array(np.ones(len(t), dtype=np.int64)),
            }
        )

    best = grouped_sums_sorted(
        docs.map_batches(norm, batch_format="pyarrow"),
        "norm_sha256",
        ["_ord", "_1"],
        ["_ord", "dup_count"],
        op=["max", "sum"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        o = t.column("_ord").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "norm_sha256": t.column("norm_sha256"),
                id_col: pa.array(ID_SPACE - 1 - (o & (ID_SPACE - 1))),
                score_col: pa.array(o >> 40),
                "dup_count": t.column("dup_count"),
            }
        )

    return best.map_batches(unpack, batch_format="pyarrow")
