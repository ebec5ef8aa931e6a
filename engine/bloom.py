"""Distributed Bloom-filter semi-join prefilter — the 100-TB pattern for
"keep left rows whose key exists on the right" when the right key set is
too large to broadcast but most left rows DON'T match.

Pipeline (output is EXACT — the Bloom pass only prunes, never decides):

1. Build: one ``map_batches`` pass over the right keys emits each batch's
   distinct bit positions; the driver ORs them into an m-bit array and
   packs it (m/8 bytes — the same bounded-broadcast class as the dense
   rank/degree vectors: ~150 MB for 1e9 keys at 10 bits/key). Shipped
   ONCE via ``ray.put``; tasks test bits on the packed bytes directly
   (no per-task unpack).
2. Prefilter: ``map_batches`` over the left keeps only rows whose key
   hits all ``k`` bits — false positives survive, false negatives are
   impossible (splitmix64 double hashing, deterministic).
3. Exact verify: the survivors' distinct keys are intersected with the
   right keys via the sort-based ``engine.setops`` path (one shuffle of
   the PRUNED key volume, not the full left), and the verified key set —
   O(distinct matching keys), typically ≪ right — is broadcast once to
   filter the surviving rows.

The reference has no Bloom analog (single-process, SURVEY.md §2.2); this
is infrastructure for north-rule-scale anti/semi joins where
``engine.joins.broadcast_join`` (ship the whole right side) stops
fitting. For match-heavy workloads (most left rows match) skip the
prefilter and use ``engine.setops`` directly — the Bloom pass only pays
for itself when it prunes.

Scope: integer (int64/uint64) key columns — pack composite/string keys
into one integer upstream (e.g. the md5-based id hash used elsewhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Vigna, public domain) — vectorized uint64."""
    x = x + _GOLDEN
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing."""
    keys = keys.astype(np.uint64)
    h1 = _mix64(keys)
    h2 = _mix64(keys ^ _GOLDEN) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def _contains(packed: np.ndarray, m: int, k: int, keys: np.ndarray) -> np.ndarray:
    """Bool mask: key hits all k bits. Tests the packed bytes directly
    (np.packbits default big bit order: bit p lives at byte p>>3,
    bit 7-(p&7))."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, m, k)
    byte = packed[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (np.uint64(7) - (pos & np.uint64(7)))) & 1
    return bit.all(axis=1)


def build_bloom(
    ds: ray.data.Dataset, col: str, num_bits: int, num_hashes: int = 4
) -> dict:
    """One distributed pass over ``ds[col]`` → packed m-bit Bloom filter
    ``{"bits": uint8[m/8], "m": m, "k": num_hashes}``. Per-batch distinct
    positions stream to the driver (bounded by m bits total, the
    sanctioned broadcast-state accumulation path, cf.
    engine/graph.dense_out_degrees)."""
    m, k = int(num_bits), int(num_hashes)

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.unique(_positions(keys, m, k))
        return pa.table({"pos": pa.array(pos, type=pa.uint64())})

    bits = np.zeros(m, dtype=bool)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        bits[b.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)] = True
    return {"bits": np.packbits(bits), "m": m, "k": k}


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 4,
) -> ray.data.Dataset:
    """EXACT ``left SEMI JOIN right``: all left rows (all columns) whose
    ``on`` key appears in ``right[right_on]`` — Bloom-prefiltered so the
    verify shuffle sees only the surviving fraction of the left."""
    from . import setops

    right_on = right_on or on
    bloom = build_bloom(right, right_on, num_bits, num_hashes)
    bits_ref = ray.put(bloom["bits"])
    m, k = bloom["m"], bloom["k"]

    def prefilter(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.filter(pa.array(_contains(ray.get(bits_ref), m, k, keys)))

    survivors = left.map_batches(prefilter, batch_format="pyarrow").materialize()

    # exact verify: intersect survivor keys with the right keys (sort
    # path, shuffles only the pruned volume), broadcast the verified set
    key_type = dict(zip(left.schema().names, left.schema().types))[on]

    def right_keys(t: pa.Table) -> pa.Table:
        return pa.table({on: t.column(right_on).cast(key_type)})

    verified = setops.intersect_keys(
        survivors.select_columns([on]),
        right.map_batches(right_keys, batch_format="pyarrow"),
        on,
    )
    vk = np.sort(
        np.concatenate(
            [
                b.column(on).to_numpy(zero_copy_only=False)
                for b in verified.iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    vk_ref = ray.put(vk)

    def exact(t: pa.Table) -> pa.Table:
        keys = t.column(on).to_numpy(zero_copy_only=False)
        hit = np.searchsorted(ray.get(vk_ref), keys)
        arr = ray.get(vk_ref)
        ok = (hit < len(arr)) & (arr[np.minimum(hit, len(arr) - 1)] == keys) \
            if len(arr) else np.zeros(len(keys), dtype=bool)
        return t.filter(pa.array(ok))

    return survivors.map_batches(exact, batch_format="pyarrow")
