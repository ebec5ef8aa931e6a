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
