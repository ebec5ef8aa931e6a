"""Weighted PageRank on the dataset engine.

Same fixpoint as the reference's PageRank (damping, uniform teleport,
dangling mass redistributed uniformly — ref: src/Graph.cpp:118-173) but
each out-edge carries a weight and a vertex's mass splits proportionally:
``rank_k(v) = ((1-d) + d·Σ_sink rank_{k-1}) / n
             + d · Σ_{u→v} rank_{k-1}(u) · (w(u,v) / wsum(u))``,
where sinks are vertices with total out-weight 0. With all weights 1 this
is exactly classic PageRank.

Dataflow: one build (dense out-weight sums via per-batch partials, the
per-edge coefficient w/wsum attached once, one global sort by dst), then
per iteration a single dense-segment gather (engine/hits.py's gather with
the coefficient as the multiplier) merged by one remote task whose return
object IS the next rank ref — the driver chains ObjectRefs and reads a
small stats scalar, never the O(V) vector. Same broadcast-tier contract
as ``engine.pagerank`` (dense vectors to ~1e9 vertices; beyond that the
BSP engine's partitioned layout applies).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .hits import _make_gather_fn, tree_merge_segment_refs

DAMPING = 0.85


def _dense_weight_sums(edges_w: ray.data.Dataset, n: int) -> np.ndarray:
    """Dense per-src total out-weight (per-batch combine → driver
    bincount; the same O(V)-driver build step as dense_out_degrees)."""

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(src, kind="stable")
        ss, ws = src[order], w[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(np.diff(ss)) + 1))
            if len(ss)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "src": pa.array(ss[starts] if len(ss) else ss),
                "ws": pa.array(
                    np.add.reduceat(ws, starts) if len(ss) else ws
                ),
            }
        )

    ws = np.zeros(n)
    for b in edges_w.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1 << 20
    ):
        src = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        w = b.column("ws").to_numpy(zero_copy_only=False)
        ws += np.bincount(src, weights=w, minlength=n)
    return ws


@ray.remote(num_returns=2)
def _apply_wpr(old_rank, sinks, n, coef, d, seg_refs):
    """Merge gather segments into the next rank vector off the driver;
    returns (rank, stats) as this task's own object-store values."""
    # Accumulate raw in-link sums first and apply damping ONCE on the
    # total (new = base + d * acc): a vertex whose dst range straddles a
    # block boundary gathers from multiple segments, and d*a + d*b is an
    # ulp off d*(a+b) — the same operation-order rule as the reference's
    # in-link-total damping (CLAUDE.md) and the SQL oracle's single
    # `d * COALESCE(m, 0)`.
    acc = np.zeros(n)
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
            s, e = offs[i], offs[i + 1]
            lo = lo_arr[i]
            acc[lo : lo + (e - s)] += flat[s:e]
    new = coef / n + d * acc
    return new, {
        "l1": float(np.abs(new - old_rank).sum()),
        "dangling": float(new[sinks].sum()),
    }


def weighted_pagerank(
    edges_w: ray.data.Dataset,
    n: int,
    iterations: int = 10,
    d: float = DAMPING,
) -> np.ndarray:
    """``iterations`` weighted supersteps over encoded (src, dst, w) edges
    with dense vids in [0, n). Returns the dense rank vector."""
    ws = _dense_weight_sums(edges_w, n)
    inv = np.zeros(n)
    nz = ws > 0
    inv[nz] = 1.0 / ws[nz]
    sinks = np.flatnonzero(~nz)
    inv_ref = ray.put(inv)

    def attach(t: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        src = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "key": t.column("dst").cast(pa.int64()),
                "nbr": pa.array(src),
                "coef": pa.array(w * iv[src]),
            }
        )

    adj = (
        edges_w.map_batches(attach, batch_format="pyarrow")
        .sort("key")
        .materialize()
    )
    rank = np.full(n, 1.0 / n)
    rank_ref = ray.put(rank)
    sinks_ref = ray.put(sinks)
    sink_mass = float(rank[sinks].sum())
    for _ in range(iterations):
        coef = (1.0 - d) + d * sink_mass
        seg_refs = adj.map_batches(
            _make_gather_fn(rank_ref, mult_col="coef"),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        ).to_arrow_refs()
        # raw sums (d applied once after the merge); the √B pre-merge
        # keeps per-vertex addition ORDER but regroups association at
        # level-1 boundaries — a one-ulp class, invisible to the
        # ROUND-decimals oracle (and the sf-scale oracle graphs sit
        # below the fan-in threshold, taking the bit-identical
        # passthrough)
        rank_ref, stats_ref = _apply_wpr.remote(
            rank_ref, sinks_ref, n, coef, d, tree_merge_segment_refs(seg_refs)
        )
        sink_mass = ray.get(stats_ref)["dangling"]
    return ray.get(rank_ref)
