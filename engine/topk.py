"""Grouped top-k — "keep the best k rows per key", the training-data
curation primitive (best N documents per domain / language / dedup
cluster) that Ray Data has no native operator for.

Design (fully distributed, no per-group Python):

1. per-batch COMBINER: each batch keeps at most k rows per key it
   contains (vectorized lexsort + run-position mask) — bounds the volume
   entering the sort at k × batches per key, independent of group skew.
2. global ``sort(key, order DESC)`` — Ray range-partitions; rows of one
   key are contiguous, possibly spanning block boundaries.
3. per-block rank mask: a row survives if its within-key rank < k. Ranks
   restart at 0 per key inside a block; the only correction needed is the
   first key run of each block, whose rank offset is the count of rows of
   that key in earlier blocks — the driver accumulates that from tiny
   per-block (first_key, first_run_len, last_key, last_run_len) metadata
   tasks, never rows (same pattern as the vertex-dictionary offsets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import nonempty_block_refs


def _run_ranks(keys: np.ndarray) -> np.ndarray:
    """Position of each row within its contiguous same-key run."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    new_run = np.concatenate(([True], keys[1:] != keys[:-1]))
    idx = np.arange(len(keys), dtype=np.int64)
    run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
    return idx - run_start


def topk_per_group(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    k: int = 3,
    descending: bool = True,
) -> ray.data.Dataset:
    """Top-``k`` rows per ``key_col`` by ``order_col`` (ties broken by the
    remaining columns' sorted order within the global sort — deterministic
    for any fully-ordering column set). Returns all original columns."""
    other = [c for c in ds.schema().names if c not in (key_col, order_col)]
    sort_cols = [key_col, order_col] + other
    sort_desc = [False, descending] + [False] * len(other)

    def _sort_key(col: np.ndarray, desc: bool = False) -> np.ndarray:
        """Exact lexsort key for any comparable dtype. Plain negation only
        for signed/float (unsigned would wrap mod 2^64 — an order value of
        0 would outrank everything; strings would TypeError); everything
        else goes through an exact per-batch rank transform (``np.unique``
        inverse), which preserves the total order and keeps object arrays
        out of ``np.lexsort``."""
        if col.dtype.kind in "if":
            return -col if desc else col
        _, inv = np.unique(col, return_inverse=True)
        inv = inv.astype(np.int64)
        return -inv if desc else inv

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        order = t.column(order_col).to_numpy(zero_copy_only=False)
        o = _sort_key(order, descending)
        # same full tie-break as the global sort, least-significant first —
        # a boundary tie pruned by a weaker order would corrupt the result
        tie = [
            _sort_key(t.column(c).to_numpy(zero_copy_only=False))
            for c in reversed(other)
        ]
        perm = np.lexsort(tuple(tie) + (o, _sort_key(keys)))
        ranks = _run_ranks(keys[perm])
        keep = perm[ranks < k]
        keep.sort()  # preserve input order of survivors
        return t.take(pa.array(keep))

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    s = pruned.sort(sort_cols, descending=sort_desc).materialize()

    refs = nonempty_block_refs(s)
    if not refs:
        return s

    @ray.remote
    def block_meta(tbl: pa.Table):
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        run_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        nrows = len(keys)
        first_len = int(run_starts[1]) if len(run_starts) > 1 else nrows
        last_len = nrows - int(run_starts[-1])
        return keys[0], first_len, keys[-1], last_len, nrows

    metas = ray.get([block_meta.remote(r) for r in refs])
    # driver: rank offset of each block's FIRST key = rows of that key in
    # earlier blocks (contiguous after the sort). (cur_key, cur_count)
    # tracks the trailing run of the last block seen, chaining across
    # single-key blocks.
    offsets = []
    cur_key, cur_count = None, 0
    for first_key, first_len, last_key, last_len, nrows in metas:
        off = cur_count if first_key == cur_key else 0
        offsets.append(off)
        if first_len == nrows:  # single-key block: the run keeps growing
            cur_key, cur_count = last_key, off + nrows
        else:
            cur_key, cur_count = last_key, last_len

    @ray.remote
    def rank_filter(tbl: pa.Table, first_offset: int) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ranks = _run_ranks(keys)
        if first_offset and len(keys):
            first_run = keys == keys[0]
            # only the leading contiguous run of the first key
            lead = np.logical_and.accumulate(first_run)
            ranks = ranks + np.where(lead, first_offset, 0)
        return tbl.filter(pa.array(ranks < k))

    out_refs = [rank_filter.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def _with_es_key(t: pa.Table, weight_col: str, id_col: str) -> pa.Table:
    """Drop weight <= 0 rows and append the Efraimidis–Spirakis
    exponential sample key ln(u)/w, u stateless from md5-low-64 of the
    id (== DuckDB md5_number_lower >> 11, +1, / 2^53 — reproducible in
    SQL term for term)."""
    import hashlib

    w_all = t.column(weight_col).to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(w_all > 0))
    ids = t.column(id_col).to_pylist()
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
            >> 11
            for i in ids
        ),
        dtype=np.int64,
        count=len(ids),
    )
    w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
    u = (h.astype(np.float64) + 1.0) / 9007199254740992.0
    return t.append_column("_es_key", pa.array(np.log(u) / w, pa.float64()))


def weighted_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    id_col: str,
    k: int,
) -> ray.data.Dataset:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis-
    Spirakis A-ES: P(draw) ∝ weight): every row scores the exponential
    key ln(u)/w with u derived STATELESSLY from md5-low-64 of its id
    (== DuckDB ``md5_number_lower`` — the repo's reorder / repartition /
    resume-stable hash family, no RNG state to ship or checkpoint), and
    the k largest keys win — the importance-sampling primitive of corpus
    mixing. Distributed shape: each batch argpartition-prunes to ≤ k
    candidate rows, so the global sort ranks only O(k × blocks)
    survivors, then ``limit(k)``. Rows with weight ≤ 0 are excluded
    (they can never be drawn). The sample key rides only inside the
    pipeline; the output keeps the original columns."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    names = ds.schema().names

    def partial(t: pa.Table) -> pa.Table:
        t = _with_es_key(t, weight_col, id_col)
        key = t.column("_es_key").to_numpy(zero_copy_only=False)
        if t.num_rows > k:
            idx = np.argpartition(-key, k - 1)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    pruned = ds.map_batches(partial, batch_format="pyarrow")
    top = pruned.sort("_es_key", descending=True).limit(k)
    return top.map_batches(
        lambda t: t.select(names), batch_format="pyarrow"
    )


def weighted_sample_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    id_col: str,
    k: int,
) -> ray.data.Dataset:
    """Per-KEY deterministic weighted sample without replacement: the k
    largest A-ES exponential keys within each ``key_col`` group — the
    per-domain / per-source importance draw of corpus mixing (the
    weighted sibling of the per-key capped sample). Same stateless
    md5 key as :func:`weighted_sample`; selection rides the grouped
    top-k operator (per-batch k-per-key combiner, one global sort,
    O(blocks) rank-offset metadata — no per-group shuffle). Ties break
    by the remaining columns ascending (SQL ``ORDER BY es_key DESC,
    <cols>``). Weight <= 0 rows are excluded; output keeps the
    original columns."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    names = ds.schema().names
    keyed = ds.map_batches(
        lambda t: _with_es_key(t, weight_col, id_col),
        batch_format="pyarrow",
    )
    top = topk_per_group(keyed, key_col, "_es_key", k=k, descending=True)
    return top.map_batches(
        lambda t: t.select(names), batch_format="pyarrow"
    )
