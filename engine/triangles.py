"""Triangle counting — north-rule N6.

Degree-ordered orientation bounds wedge fan-out (max oriented out-degree is
O(sqrt E)), then wedges are closed in one of two ways:

- ``method="broadcast"`` (default): the oriented adjacency (CSR, neighbors
  sorted by orientation order) and the packed oriented-edge key set are
  broadcast once via ``ray.put``; a ``map_batches`` pass over the oriented
  edge Dataset expands each edge's higher-ordered wedge partners with
  vectorized ``searchsorted``/``repeat`` and counts closures per batch →
  global sum. Distributed compute, O(E') object-store footprint per node —
  the right trade to ~1e8 oriented edges.
- ``method="join"``: fully shuffled two-join pipeline
  (E' ⨝ E' on u → wedges; wedges ⨝ E' on (v,w) left_semi → closures) for
  inputs too large to broadcast. Caveat: ray 2.49's hash-shuffle join
  builds a schemaless empty table for partitions that received no rows and
  crashes (pyarrow FieldRef error) — so this path needs
  rows ≫ num_partitions; sentinel rows are injected to keep whole
  datasets non-empty, but per-partition emptiness on tiny inputs is not
  defendable — hence broadcast is the default.

The orientation key is ``deg[v] * n + v`` (a total order packed into
int64), with all ties broken by vid — deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from . import graph as G


def _oriented(edges: ray.data.Dataset):
    """→ (oriented Dataset (u, v) with order(u)<order(v), okey array, n)."""
    ids = G.vertex_ids(edges)
    n = len(ids)
    if n == 0:
        return None, None, 0
    enc = G.encode_edges(edges, ids)
    und = G.undirected_edges(enc).materialize()

    deg = np.zeros(n, dtype=np.int64)
    for b in und.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        np.add.at(deg, b.column("a").to_numpy(zero_copy_only=False).astype(np.int64), 1)
        np.add.at(deg, b.column("b").to_numpy(zero_copy_only=False).astype(np.int64), 1)
    okey = deg * np.int64(n) + np.arange(n, dtype=np.int64)
    # extra slots so sentinel vids n..n+2 (join path) have a defined order
    okey = np.concatenate([okey, okey.max() + 1 + np.arange(3, dtype=np.int64)])
    okey_ref = ray.put(okey)

    def orient(batch: pa.Table) -> pa.Table:
        ok = ray.get(okey_ref)
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        flip = ok[a] > ok[b]
        u = np.where(flip, b, a).astype(np.uint64)
        v = np.where(flip, a, b).astype(np.uint64)
        return pa.table(
            {
                "u": pa.array(u, type=pa.uint64()),
                "v": pa.array(v, type=pa.uint64()),
            }
        )

    return und.map_batches(orient, batch_format="pyarrow").materialize(), okey_ref, n


def triangle_count(
    edges: ray.data.Dataset,
    method: str = "auto",
    num_partitions: int | None = None,
) -> int:
    """``method="auto"``: the shuffled join pipeline is the DEFAULT scale
    path once the oriented edge set crosses ``GRAFT_TRI_JOIN_EDGES``
    (default 2e5) — below that the broadcast CSR is faster AND the join
    path risks Ray 2.49's empty-partition crash; the auto partition count
    (≤ rows/10k) keeps every join partition populated above the gate."""
    import os

    oriented, okey_ref, n = _oriented(edges)
    if n == 0:
        return 0
    if method == "auto":
        gate = int(os.environ.get("GRAFT_TRI_JOIN_EDGES", 200_000))
        method = "join" if oriented.count() >= gate else "broadcast"
    if method == "broadcast":
        return _count_broadcast(oriented, okey_ref, n)
    if method == "join":
        if num_partitions is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 4))
            except Exception:
                cpus = 4
            # cap BELOW the CPU count: hash-join spawns one aggregator actor
            # per partition, and more actors than CPUs deadlocks the stage
            num_partitions = max(
                2, min(max(2, cpus - 2), oriented.count() // 10_000 + 2)
            )
        return _count_join(oriented, okey_ref, n, num_partitions)
    raise ValueError(f"unknown method {method!r}")


def _count_broadcast(oriented: ray.data.Dataset, okey_ref, n: int) -> int:
    if n.bit_length() * 2 >= 63:
        raise ValueError("packed-key overflow guard: n too large for int64 n^2")
    # collect oriented edges once to build the broadcast CSR + key set
    us, vs = [], []
    for b in oriented.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        us.append(b.column("u").to_numpy(zero_copy_only=False).astype(np.int64))
        vs.append(b.column("v").to_numpy(zero_copy_only=False).astype(np.int64))
    u = np.concatenate(us) if us else np.empty(0, np.int64)
    v = np.concatenate(vs) if vs else np.empty(0, np.int64)
    okey = ray.get(okey_ref)
    rnk = np.empty(n, dtype=np.int64)  # orientation rank in [0, n)
    rnk[np.argsort(okey[:n], kind="stable")] = np.arange(n, dtype=np.int64)
    keys = np.sort(u * np.int64(n) + rnk[v])  # (u, rank(v))-sorted edge keys
    # neighbor array sorted by (u, rank(v)): decode back from the keys
    nbr_u = keys // n
    indptr = np.searchsorted(nbr_u, np.arange(n + 1))
    adj_ref = ray.put((indptr, keys, rnk))

    def close_wedges(batch: pa.Table) -> pa.Table:
        indptr, keys, rnk = ray.get(adj_ref)
        eu = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        ev = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        total = 0
        if len(eu) and len(keys):
            # wedge partners of edge (u,v): neighbors w of u with
            # rank(w) > rank(v); each edge's own key locates its slice start
            ek = eu * np.int64(n) + rnk[ev]
            lo = np.searchsorted(keys, ek) + 1
            hi = indptr[eu + 1]
            counts = np.maximum(hi - lo, 0)
            tot = int(counts.sum())
            if tot:
                # ragged-range gather: positions of all wedge partners
                starts_rep = np.repeat(lo, counts)
                local = np.arange(tot) - np.repeat(
                    counts.cumsum() - counts, counts
                )
                wrnk = keys[starts_rep + local] % n  # rank(w)
                vrep = np.repeat(ev, counts)
                wk = vrep * np.int64(n) + wrnk  # closing key (v, rank(w))
                idx = np.searchsorted(keys, wk)
                idx[idx >= len(keys)] = len(keys) - 1
                total = int((keys[idx] == wk).sum())
        return pa.table({"tri": pa.array([total], type=pa.int64())})

    out = oriented.map_batches(close_wedges, batch_format="pyarrow")
    return int(out.sum("tri") or 0)


def _count_join(
    oriented: ray.data.Dataset, okey_ref, n: int, num_partitions: int
) -> int:
    def with_sentinel(batch: pa.Table) -> pa.Table:
        # sentinel edge (n+1, n+2): keeps the dataset non-empty; u=n+1 only
        # matches itself and ok-filtering removes the resulting degenerate pair
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.append(u, np.uint64(n + 1)), type=pa.uint64()),
                "v": pa.array(np.append(v, np.uint64(n + 2)), type=pa.uint64()),
            }
        )

    right = oriented.map_batches(with_sentinel, batch_format="pyarrow").materialize()

    wedges = right.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
        left_suffix="",
        right_suffix="_r",
    )

    def filter_order(batch: pa.Table) -> pa.Table:
        ok = ray.get(okey_ref)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column("v_r").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ok[v] < ok[w]
        u_k = batch.column("u").to_numpy(zero_copy_only=False)[keep].astype(np.uint64)
        v_k = v[keep].astype(np.uint64)
        w_k = w[keep].astype(np.uint64)
        # sentinel wedge (n,n,n) can never close (no oriented edge has u=n)
        u_k = np.append(u_k, np.uint64(n))
        v_k = np.append(v_k, np.uint64(n))
        w_k = np.append(w_k, np.uint64(n))
        return pa.table(
            {
                "u": pa.array(u_k, type=pa.uint64()),
                "v": pa.array(v_k, type=pa.uint64()),
                "w": pa.array(w_k, type=pa.uint64()),
            }
        )

    wedges = wedges.map_batches(filter_order, batch_format="pyarrow")

    closed = wedges.join(
        right,
        join_type="left_semi",
        num_partitions=num_partitions,
        on=("v", "w"),
        right_on=("u", "v"),
    )
    return closed.count()
