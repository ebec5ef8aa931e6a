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


def _cc_label_arrays(
    edges: ray.data.Dataset, max_iters: int = 10_000
) -> tuple[np.ndarray, np.ndarray, int]:
    """Run min-label propagation; returns (sorted original ids, dense label
    vids, rounds). The label/id arrays are the broadcast-engine state —
    all post-processing on them stays vectorized numpy."""
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
    return ids, labels, rounds


def connected_components_dataset(
    edges: ray.data.Dataset, max_iters: int = 10_000
) -> tuple[ray.data.Dataset, int]:
    """Returns ((id, label) Dataset, rounds) — label = smallest original id
    in the component. Built by vectorized fancy-indexing on the label
    array (no per-vertex Python loop)."""
    ids, labels, rounds = _cc_label_arrays(edges, max_iters)
    tbl = pa.table({"id": pa.array(ids), "label": pa.array(ids[labels])})
    return ray.data.from_arrow(tbl), rounds


def connected_components(
    edges: ray.data.Dataset, max_iters: int = 10_000
) -> tuple[dict, int]:
    """Returns (dict original_id -> smallest original id in its component,
    rounds to fixpoint). Convenience wrapper over the arrays — prefer
    ``connected_components_dataset`` in pipelines."""
    ids, labels, rounds = _cc_label_arrays(edges, max_iters)
    return dict(zip(ids.tolist(), ids[labels].tolist())), rounds


def components_dataset(cc: dict) -> ray.data.Dataset:
    ids = sorted(cc)
    return ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "label": pa.array([cc[i] for i in ids])})
    )
