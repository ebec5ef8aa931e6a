"""Connected components — Dataset-native min-label propagation (north-rule N4).

Same superstep shape as PageRank (SURVEY.md §2.3 N4): messages are labels
pushed along the symmetrized edge set, combined per batch with a vectorized
min, shuffled with ``groupby("dst").aggregate(Min)``, applied as
``label = min(label, incoming)``; converged when zero labels change
(exact-match check). Labels are the smallest original id of each component.

The fully partitioned variant (no broadcast label vector) is
``engine.bsp.bsp_connected_components``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from . import graph as G


def _min_partial(labels_ref):
    def fn(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = labels[src]
        # per-batch combiner: min label per dst
        uniq, inv = np.unique(dst, return_inverse=True)
        m = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, lbl)
        return pa.table(
            {
                "dst": pa.array(uniq.astype(np.uint64), type=pa.uint64()),
                "lbl": pa.array(m),
            }
        )

    return fn


def connected_components(
    edges: ray.data.Dataset, max_iters: int = 10_000
) -> tuple[dict, int]:
    """Returns (dict original_id -> smallest original id in its component,
    rounds to fixpoint)."""
    ids = G.vertex_ids(edges)
    n = len(ids)
    enc = G.encode_edges(edges, ids)
    sym = G.symmetrize(enc).materialize()
    labels = np.arange(n, dtype=np.int64)
    rounds = 0
    while rounds < max_iters:
        rounds += 1
        ref = ray.put(labels)
        partial = sym.map_batches(_min_partial(ref), batch_format="pyarrow")
        agg = partial.groupby("dst").aggregate(Min("lbl", alias_name="lbl"))
        new = labels.copy()
        for b in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            dv = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            lv = b.column("lbl").to_numpy(zero_copy_only=False)
            np.minimum.at(new, dv, lv)
        if (new == labels).all():
            break
        labels = new
    get = (lambda x: x.item()) if hasattr(ids[0], "item") else (lambda x: x)
    return {get(ids[v]): get(ids[labels[v]]) for v in range(n)}, rounds


def components_dataset(cc: dict) -> ray.data.Dataset:
    ids = sorted(cc)
    return ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "label": pa.array([cc[i] for i in ids])})
    )
