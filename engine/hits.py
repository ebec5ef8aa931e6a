"""HITS hubs & authorities (Kleinberg) on the dataset engine.

Unnormalized integer variant: with ``auth_0 = hub_0 = 1`` every iterate is
an exact integer (auth_k(v) counts length-(2k-1) alternating paths ending
at v), so results are hash-comparable against a DuckDB oracle with NO
float-rounding caveats — the bracketing trick used across this repo
(normalization is a presentation step; the fixpoint direction is the
same). Update order is the classic one: auth from the previous hubs, then
hubs from the NEW authorities.

Dataflow per iteration (the house gather pattern, same as
engine/pagerank.py's distributed apply): two gather passes, each a
``map_batches`` over a globally key-sorted adjacency emitting ONE dense
segment row per block, merged by a single remote task whose return value
IS the next vector's ObjectRef — the driver chains refs and never holds,
ships, or iterates an O(V) array per iteration. The forward adjacency is
sorted by dst (gather auth at dst), the reverse by src (gather hub at
src); both are built and materialized once.

Values are exact while they fit float64's 2^53 integer window; the merge
task guards that and raises rather than silently losing precision (3
iterations over the sf0.1 graph peak around 1e15).

No reference analog (the reference is PageRank-only); this reuses its
fixpoint/timing discipline (ref: src/main.cpp:145-196).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _make_gather_fn(val_ref, mult_col: str | None = None):
    """Segment task: for a block of (key, nbr[, mult]) rows globally
    sorted by ``key``, emit a dense segment seg[key - lo] = Σ val[nbr]
    (· mult when ``mult_col`` is given — the weighted-edge variant; one
    row per block; block boundaries overlap by ≤ 1 key and raw sums
    accumulate)."""
    schema = pa.schema([("lo", pa.int64()), ("seg", pa.large_list(pa.float64()))])

    def gather_seg(batch: pa.Table) -> pa.Table:
        val = ray.get(val_ref)
        key = batch.column("key").to_numpy(zero_copy_only=False)
        nbr = batch.column("nbr").to_numpy(zero_copy_only=False)
        if len(key) == 0:
            return pa.table(
                {"lo": pa.array([], type=pa.int64()),
                 "seg": pa.array([], type=pa.large_list(pa.float64()))},
                schema=schema,
            )
        contrib = val[nbr]
        if mult_col is not None:
            contrib = contrib * batch.column(mult_col).to_numpy(
                zero_copy_only=False
            )
        bounds = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate(([0], bounds))
        uk = key[starts]
        sums = np.add.reduceat(contrib, starts)
        lo = int(uk[0])
        seg = np.zeros(int(uk[-1]) - lo + 1)
        seg[uk.astype(np.int64) - lo] = sums
        return pa.table(
            {"lo": pa.array([lo], type=pa.int64()),
             "seg": pa.array([seg], type=pa.large_list(pa.float64()))},
            schema=schema,
        )

    return gather_seg


# Above this many segment blocks the apply pre-merges with a √B-fan-in
# tree level; below it the single merge task runs unchanged (bit-identical
# to the historical driver-side merge, which the oracle hash compares
# were validated against). 64 blocks ≈ the sf0.1 bench graph's ceiling.
_TREE_MERGE_FANIN = 64

_SEG_SCHEMA = pa.schema(
    [("lo", pa.int64()), ("seg", pa.large_list(pa.float64()))]
)


@ray.remote
def _merge_partial(d: float, seg_refs: list) -> pa.Table:
    """Level-1 of the two-level segment merge: combine CONSECUTIVE
    range-sorted blocks (in block order, so per-vertex addition order is
    preserved left-to-right) into one (lo, seg) row covering the group's
    key range; each segment is scaled by ``d`` as it lands (1.0 = raw
    sums). Group memory is O(group range), not O(n)."""
    rows = []  # (lo, flat) in block order
    for b in ray.get(list(seg_refs)):
        if b.num_rows == 0 or "lo" not in b.schema.names:
            continue
        lo_arr = b.column("lo").to_numpy(zero_copy_only=False)
        seg_col = b.column("seg")
        if isinstance(seg_col, pa.ChunkedArray):
            seg_col = seg_col.combine_chunks()
        flat = seg_col.values.to_numpy(zero_copy_only=False)
        offs = seg_col.offsets.to_numpy(zero_copy_only=False)
        for i in range(len(lo_arr)):
            rows.append((int(lo_arr[i]), flat[offs[i] : offs[i + 1]]))
    if not rows:
        return _SEG_SCHEMA.empty_table()
    lo = min(r[0] for r in rows)
    hi = max(r[0] + len(r[1]) for r in rows)
    merged = np.zeros(hi - lo)
    for s_lo, s in rows:
        if d == 1.0:
            merged[s_lo - lo : s_lo - lo + len(s)] += s
        else:
            merged[s_lo - lo : s_lo - lo + len(s)] += d * s
    return pa.table(
        {"lo": pa.array([lo], type=pa.int64()),
         "seg": pa.array([merged], type=pa.large_list(pa.float64()))},
        schema=_SEG_SCHEMA,
    )


def tree_merge_segment_refs(seg_refs: list, d: float = 1.0) -> list:
    """√B-fan-in pre-merge for the dense-tier apply: above
    ``_TREE_MERGE_FANIN`` blocks, ~√B parallel level-1 tasks each merge a
    run of consecutive blocks, so the final apply task pulls O(√B)
    objects instead of B — the apply stops serializing on per-block pulls
    and the dense tier holds to its documented ~1e9-vertex bound (one
    O(V) vector write remains, inherent to producing the next broadcast;
    beyond that tier the BSP engine's partitioned layout is the path, cf.
    engine/bsp.py). At or below the threshold returns the refs unchanged
    — the single-merge path stays bit-identical to the validated merge
    order. With ``d`` != 1 each segment is pre-scaled at level 1 (pass
    d=1.0 to the downstream apply). Level-1 groups are consecutive
    range-sorted blocks, so per-vertex addition ORDER is preserved —
    but the grouping changes the ASSOCIATION for a vertex straddling a
    group boundary (s1+(s2+s3) vs (s1+s2)+s3): exact for integer
    iterates (HITS), a one-ulp class for float tiers. Callers needing
    the strict left-fold (pagerank's reference-exact freeze mode) must
    bypass the tree and pass the raw refs to the single merge."""
    if len(seg_refs) <= _TREE_MERGE_FANIN:
        return seg_refs
    g = int(np.ceil(np.sqrt(len(seg_refs))))
    return [
        _merge_partial.remote(d, seg_refs[i : i + g])
        for i in range(0, len(seg_refs), g)
    ]


@ray.remote
def _merge_segments(n: int, seg_refs: list) -> np.ndarray:
    """Merge the per-block dense segments into the next vector (vertices
    with no in-gather rows get 0). Runs off the driver; its return object
    IS the next iteration's broadcast ref."""
    new = np.zeros(n)
    for b in ray.get(list(seg_refs)):
        if b.num_rows == 0 or "lo" not in b.schema.names:
            continue  # the global sort can emit empty (schemaless) blocks
        lo_arr = b.column("lo").to_numpy(zero_copy_only=False)
        seg_col = b.column("seg")
        if isinstance(seg_col, pa.ChunkedArray):
            seg_col = seg_col.combine_chunks()
        flat = seg_col.values.to_numpy(zero_copy_only=False)
        offs = seg_col.offsets.to_numpy(zero_copy_only=False)
        for i in range(len(lo_arr)):
            s, e = offs[i], offs[i + 1]
            lo = lo_arr[i]
            new[lo : lo + (e - s)] += flat[s:e]
    if new.max(initial=0.0) >= 2.0**53:
        raise OverflowError(
            "HITS integer iterate exceeded float64's exact window (2^53); "
            "reduce iterations or switch to the normalized variant"
        )
    return new


def _sorted_pairs(enc: ray.data.Dataset, key: str, nbr: str) -> ray.data.Dataset:
    """(key, nbr) projection of the encoded edge table, globally sorted by
    key (one Ray range-partitioning sort at build time)."""

    def proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t.column(key).cast(pa.int64()),
                "nbr": t.column(nbr).cast(pa.int64()),
            }
        )

    return enc.map_batches(proj, batch_format="pyarrow").sort("key").materialize()


def hits(
    enc: ray.data.Dataset, n: int, iterations: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """``iterations`` unnormalized HITS rounds over encoded (src, dst)
    edges with dense vids in [0, n). Returns (auth, hub) as exact-integer
    float64 arrays aligned to dense vid."""
    if iterations < 1:
        raise ValueError(
            f"hits() needs iterations >= 1, got {iterations} (auth is only "
            "defined after the first gather; there is no identity round)"
        )
    fwd = _sorted_pairs(enc, "dst", "src")  # gather auth at dst from hub[src]
    rev = _sorted_pairs(enc, "src", "dst")  # gather hub at src from auth[dst]
    hub_ref = ray.put(np.ones(n))
    auth_ref = None
    for _ in range(iterations):
        seg_refs = fwd.map_batches(
            _make_gather_fn(hub_ref),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).to_arrow_refs()
        auth_ref = _merge_segments.remote(n, tree_merge_segment_refs(seg_refs))
        seg_refs = rev.map_batches(
            _make_gather_fn(auth_ref),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).to_arrow_refs()
        hub_ref = _merge_segments.remote(n, tree_merge_segment_refs(seg_refs))
    return ray.get(auth_ref), ray.get(hub_ref)
