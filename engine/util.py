"""Small shared helpers."""

from __future__ import annotations

import ray


def default_concurrency(reserve: int = 2, cap: int = 16) -> int:
    """Actor-pool size that leaves ``reserve`` CPUs free.

    An actor pool that reserves every cluster CPU deadlocks any downstream
    stage that needs its own actors (Ray's hash-shuffle groupby/join
    aggregators) — the pool never releases CPUs and the aggregators never
    schedule. Always size pools below the cluster total.
    """
    try:
        total = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        total = 4
    return max(1, min(cap, total - reserve))


def nonempty_block_refs(ds, return_counts: bool = False):
    """Object refs of a materialized Dataset's non-empty blocks — the
    house idiom for block-parallel operators (empty blocks from a global
    sort are schemaless in Ray 2.49 and must be skipped). With
    ``return_counts``: also the per-block row counts (rank-offset
    chains)."""
    refs, counts = [], []
    for rb in ds.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if meta.num_rows:
                refs.append(blk)
                counts.append(int(meta.num_rows))
    return (refs, counts) if return_counts else refs
