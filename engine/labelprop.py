"""Label propagation (community detection) — north-rule N5.

Synchronous LPA on the undirected simple graph: each round every vertex
takes the most frequent label among its neighbors' previous-round labels,
tie-broken by the SMALLEST label; fixed iteration count for determinism.

Distributed argmax without per-group Python: label counts are
``groupby(["dst","label"]).Sum`` partials, then the per-dst argmax is a
second ``groupby("dst").Max`` over a packed score
``cnt * n + (n-1-label)`` — max score ⇔ (max count, then min label).
Packing is exact while ``max_count * n < 2^63`` (fine for any graph whose
edge count times vertex count stays under 9.2e18; beyond that, split the
argmax into a max-count join)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Sum

from . import graph as G


def _count_partial(labels_ref):
    def fn(batch: pa.Table) -> pa.Table:
        labels = ray.get(labels_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = labels[src]
        n = len(labels)
        key = dst * n + lbl  # pack (dst, label); n*n < 2^63 guarded below
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "dst": pa.array((uniq // n).astype(np.uint64), type=pa.uint64()),
                "label": pa.array((uniq % n).astype(np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    return fn


def label_propagation_dataset(
    edges: ray.data.Dataset, iterations: int = 5
) -> ray.data.Dataset:
    """(id, label) Dataset after ``iterations`` synchronous rounds —
    vectorized construction, no per-vertex Python loop."""
    ids, labels = _lpa_label_arrays(edges, iterations)
    return ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "label": pa.array(ids[labels])})
    )


def label_propagation(
    edges: ray.data.Dataset, iterations: int = 5
) -> dict:
    """Returns dict original_id -> original_id community label after
    ``iterations`` synchronous rounds (deterministic). Prefer
    ``label_propagation_dataset`` in pipelines."""
    ids, labels = _lpa_label_arrays(edges, iterations)
    return dict(zip(ids.tolist(), ids[labels].tolist()))


def _lpa_label_arrays(
    edges: ray.data.Dataset, iterations: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    ids = G.vertex_ids(edges)
    n = len(ids)
    if n * n >= 2**62:
        raise ValueError("packed-argmax overflow guard: graph too large")
    enc = G.encode_edges(edges, ids)
    sym = G.symmetrize(enc).materialize()
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        ref = ray.put(labels)
        counts = sym.map_batches(_count_partial(ref), batch_format="pyarrow")
        counts = counts.groupby(["dst", "label"]).aggregate(
            Sum("cnt", alias_name="cnt")
        )

        def pack(batch: pa.Table, n=n) -> pa.Table:
            dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            lbl = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
            cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
            score = cnt * n + (n - 1 - lbl)
            return pa.table(
                {
                    "dst": pa.array(dst.astype(np.uint64), type=pa.uint64()),
                    "score": pa.array(score),
                }
            )

        best = (
            counts.map_batches(pack, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Max("score", alias_name="score"))
        )
        new = labels.copy()
        for b in best.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
            dv = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            sv = b.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
            new[dv] = n - 1 - (sv % n)
        labels = new
    return ids, labels
