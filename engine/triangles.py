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
- ``method="shard"``: fully partitioned shard actors — each actor owns
  the oriented edges with ``u % P == sid`` (adjacency sorted by
  (u, order) for wedge generation, plus a sorted packed key set for
  membership), wedges (v, w) are generated locally and routed to the
  owner of ``v`` through the object store, closures checked by
  ``searchsorted`` membership. Two waves, no broadcast CSR, no Ray
  shuffle join — the O(E'/P)-memory-per-actor scale path.
- ``method="join"``: fully shuffled two-join pipeline
  (E' ⨝ E' on u → wedges; wedges ⨝ E' on (v,w) left_semi → closures) for
  inputs too large to broadcast. Caveat: ray 2.49's hash-shuffle join
  builds a schemaless empty table for partitions that received no rows and
  crashes (pyarrow FieldRef error) — so this path needs
  rows ≫ num_partitions; sentinel rows are injected to keep whole
  datasets non-empty, but per-partition emptiness on tiny inputs is not
  defendable — hence the shard path is the preferred scale route.

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
    """→ (oriented Dataset (u, v) with order(u)<order(v), okey array, n,
    sorted original-id dictionary for decode)."""
    ids = G.vertex_ids(edges)
    n = len(ids)
    if n == 0:
        return None, None, 0, ids
    enc = G.encode_edges(edges, ids)
    und = G.undirected_edges(enc).materialize()

    # distributed degree count: per-batch (vertex, count) partials — one
    # row per distinct vertex per batch — merged on the driver with one
    # bincount per partial block (the engine/graph.py dense_out_degrees
    # pattern); the driver never iterates edge rows
    def _deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64),
                batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64),
            ]
        )
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {"v": pa.array(uniq), "cnt": pa.array(cnt.astype(np.int64))}
        )

    deg = np.zeros(n, dtype=np.float64)
    partials = und.map_batches(
        _deg_partial, batch_format="pyarrow", batch_size=None
    )
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        deg += np.bincount(
            b.column("v").to_numpy(zero_copy_only=False),
            weights=b.column("cnt").to_numpy(zero_copy_only=False),
            minlength=n,
        )
    deg = deg.astype(np.int64)
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

    return (
        und.map_batches(orient, batch_format="pyarrow").materialize(),
        okey_ref,
        n,
        ids,
    )


def triangle_count(
    edges: ray.data.Dataset,
    method: str = "auto",
    num_partitions: int | None = None,
) -> int:
    """``method="auto"``: the partitioned shard-actor pipeline is the
    DEFAULT scale path once the oriented edge set crosses
    ``GRAFT_TRI_JOIN_EDGES`` (default 2e5) — below that the broadcast CSR
    is faster (actor spin-up ~P × 100 ms dominates tiny graphs). The
    shuffled two-join variant is kept as an explicit ``method="join"``
    (it exercises Ray's hash-join machinery but is ~2× slower than the
    shard actors and subject to Ray 2.49's empty-partition crash on
    sparse partitions)."""
    import os

    oriented, okey_ref, n, _ids = _oriented(edges)
    if n == 0:
        return 0
    if method == "auto":
        gate = int(os.environ.get("GRAFT_TRI_JOIN_EDGES", 200_000))
        method = "shard" if oriented.count() >= gate else "broadcast"
    if method == "broadcast":
        return _count_broadcast(oriented, okey_ref, n)
    if method == "shard":
        if num_partitions is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 4))
            except Exception:
                cpus = 4
            num_partitions = max(2, min(cpus - 2, oriented.count() // 10_000 + 2))
        return _count_shard(oriented, okey_ref, n, num_partitions)
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


def _broadcast_csr(oriented: ray.data.Dataset, okey_ref, n: int):
    """Ship-once broadcast of the oriented adjacency: (indptr, sorted
    (u, rank(v)) edge keys, vid→rank, rank→vid). Shared by the global
    count and the per-vertex closure passes."""
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
    irnk = np.empty(n, dtype=np.int64)  # rank → vid
    irnk[rnk] = np.arange(n, dtype=np.int64)
    return ray.put((indptr, keys, rnk, irnk))


def _count_broadcast(oriented: ray.data.Dataset, okey_ref, n: int) -> int:
    adj_ref = _broadcast_csr(oriented, okey_ref, n)

    def close_wedges(batch: pa.Table) -> pa.Table:
        indptr, keys, rnk, _irnk = ray.get(adj_ref)
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


@ray.remote
class _TriShard:
    """Owns oriented edges with ``u % P == sid``; generates this shard's
    wedges and answers membership queries for edges whose ``u`` it owns.
    Per-actor memory is O(E'/P + V) (V for the orientation-key array —
    the same footprint every BSP shard already carries for ranks)."""

    def __init__(self, sid: int, num_shards: int, okey: np.ndarray, n: int):
        # okey arrives as the resolved array: Ray auto-dereferences an
        # ObjectRef passed as a direct actor-constructor argument
        self.sid = sid
        self.P = num_shards
        self.ok = okey
        self.n = n
        self._us: list = []
        self._vs: list = []

    def ingest(self, u: np.ndarray, v: np.ndarray) -> int:
        self._us.append(u.astype(np.int64))
        self._vs.append(v.astype(np.int64))
        return len(u)

    def finalize(self) -> int:
        u = np.concatenate(self._us) if self._us else np.empty(0, np.int64)
        v = np.concatenate(self._vs) if self._vs else np.empty(0, np.int64)
        self._us = self._vs = None
        # adjacency rows sorted by (u, order(v)): wedge partners of the row
        # at position i are rows i+1 .. end-of-u-run
        order = np.lexsort((self.ok[v], u))
        self.u, self.v = u[order], v[order]
        # membership keys for closure checks (u*n + v packed, sorted)
        self.keys = np.sort(self.u * np.int64(self.n) + self.v)
        return len(u)

    def wedges(self) -> list:
        """Generate all (v, w) wedge keys from the local adjacency, routed
        by ``v % P``; returns P packed-key arrays (ObjectRefs)."""
        u, v, n, P = self.u, self.v, self.n, self.P
        outs: list = [[] for _ in range(P)]
        if len(u):
            # end-of-run index for every row
            run_starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
            run_ids = np.cumsum(np.concatenate(([True], u[1:] != u[:-1]))) - 1
            run_ends = np.concatenate((run_starts[1:], [len(u)]))
            ends = run_ends[run_ids]
            pos = np.arange(len(u), dtype=np.int64)
            counts = ends - (pos + 1)
            tot = int(counts.sum())
            if tot:
                starts_rep = np.repeat(pos + 1, counts)
                local = np.arange(tot, dtype=np.int64) - np.repeat(
                    counts.cumsum() - counts, counts
                )
                w = v[starts_rep + local]
                vr = np.repeat(v, counts)
                wk = vr * np.int64(n) + w
                tgt = vr % P
                for t in range(P):
                    m = tgt == t
                    if m.any():
                        outs[t].append(wk[m])
        return [
            ray.put(
                np.concatenate(outs[t]) if outs[t] else np.empty(0, np.int64)
            )
            for t in range(P)
        ]

    def count_closed(self, refs: list) -> int:
        total = 0
        for r in refs:
            wk = ray.get(r)
            if len(wk) == 0 or len(self.keys) == 0:
                continue
            idx = np.searchsorted(self.keys, wk)
            idx[idx >= len(self.keys)] = len(self.keys) - 1
            total += int((self.keys[idx] == wk).sum())
        return total


def _count_shard(
    oriented: ray.data.Dataset, okey_ref, n: int, num_shards: int
) -> int:
    if n.bit_length() * 2 >= 63:
        raise ValueError("packed-key overflow guard: n too large for int64 n^2")
    actors = [
        _TriShard.remote(s, num_shards, okey_ref, n) for s in range(num_shards)
    ]
    P = num_shards

    def route(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        shard = u % P
        refs = []
        for s in range(P):
            m = shard == s
            if m.any():
                refs.append(actors[s].ingest.remote(u[m], v[m]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(u)], type=pa.int64())})

    for _ in oriented.map_batches(route, batch_format="pyarrow").iter_batches():
        pass
    ray.get([a.finalize.remote() for a in actors])
    # wave 1: every shard emits wedge keys routed by v % P
    emitted = ray.get([a.wedges.remote() for a in actors])
    # wave 2: each shard checks membership of the wedges routed to it
    counts = ray.get(
        [
            actors[t].count_closed.remote([emitted[s][t] for s in range(P)])
            for t in range(P)
        ]
    )
    for a in actors:
        ray.kill(a)
    return int(sum(counts))


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


def local_clustering(
    edges: ray.data.Dataset, round_to: int = 9
) -> ray.data.Dataset:
    """Per-vertex triangle counts + local clustering coefficient
    ``lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`` over the undirected
    simple graph — the graph feature behind community curation and
    spam-node detection. Same degree-ordered broadcast-CSR wedge
    closure as :func:`triangle_count`, but each closed wedge credits
    its three corners into a per-batch bincount partial; the partials
    settle through the sort-based grouped SUM (O(3·tri) partial rows,
    never a hash aggregate). Degrees come free from the orientation key
    (okey = deg·n + vid); the vertex dictionary ships once via
    ``ray.put`` — the documented dense ≤1e9-vertex broadcast tier (the
    shard-actor closure is the path beyond it). Emits only triangle
    participants (deg ≥ 2 by construction)."""
    from .ntile import grouped_sum_sorted

    out_schema = pa.schema(
        [
            ("vid", pa.int64()),
            ("n_tri", pa.int64()),
            ("deg", pa.int64()),
            ("lcc", pa.float64()),
        ]
    )
    oriented, okey_ref, n, ids = _oriented(edges)
    if n == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    adj_ref = _broadcast_csr(oriented, okey_ref, n)
    empty_partial = pa.table(
        {
            "venc": pa.array([], type=pa.int64()),
            "c": pa.array([], type=pa.int64()),
        }
    )

    def close_credit(batch: pa.Table) -> pa.Table:
        indptr, keys, rnk, irnk = ray.get(adj_ref)
        eu = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        ev = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        if not (len(eu) and len(keys)):
            return empty_partial
        ek = eu * np.int64(n) + rnk[ev]
        lo = np.searchsorted(keys, ek) + 1
        hi = indptr[eu + 1]
        counts = np.maximum(hi - lo, 0)
        tot = int(counts.sum())
        if not tot:
            return empty_partial
        starts_rep = np.repeat(lo, counts)
        local = np.arange(tot) - np.repeat(counts.cumsum() - counts, counts)
        wrnk = keys[starts_rep + local] % n  # rank(w)
        vrep = np.repeat(ev, counts)
        urep = np.repeat(eu, counts)
        wk = vrep * np.int64(n) + wrnk  # closing key (v, rank(w))
        idx = np.searchsorted(keys, wk)
        idx[idx >= len(keys)] = len(keys) - 1
        m = keys[idx] == wk
        if not m.any():
            return empty_partial
        # one credit per corner of every closed triangle (u, v, w)
        allv = np.concatenate([urep[m], vrep[m], irnk[wrnk[m]]])
        venc, c = np.unique(allv, return_counts=True)
        return pa.table(
            {"venc": pa.array(venc), "c": pa.array(c.astype(np.int64))}
        )

    partial = oriented.map_batches(close_credit, batch_format="pyarrow")
    tri = grouped_sum_sorted(partial, "venc", "c", out_col="n_tri")
    ids_ref = ray.put(np.asarray(ids, dtype=np.int64))

    def finish(t: pa.Table) -> pa.Table:
        ids_arr = ray.get(ids_ref)
        okey = ray.get(okey_ref)
        venc = t.column("venc").to_numpy(zero_copy_only=False)
        ntri = t.column("n_tri").to_numpy(zero_copy_only=False)
        deg = okey[venc] // n
        lcc = np.round(2.0 * ntri / (deg * (deg - 1)), round_to)
        return pa.table(
            {
                "vid": pa.array(ids_arr[venc]),
                "n_tri": pa.array(ntri),
                "deg": pa.array(deg),
                "lcc": pa.array(lcc, pa.float64()),
            }
        ).cast(out_schema)

    return tri.map_batches(finish, batch_format="pyarrow")


def edge_support(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-EDGE triangle support — the k-truss building block: for each
    undirected edge {a, b}, the number of triangles containing it
    (= common neighbors of a and b). Same degree-ordered broadcast-CSR
    wedge closure as :func:`local_clustering`, but each closed triangle
    credits its three EDGES (canonical pairs packed into one int64,
    a·n + b with a < b in encoded space) instead of its corners; the
    partials settle through the sort-based grouped SUM. Emits only
    edges with support ≥ 1 (a support-0 edge is below every truss).
    Output canonicalized on ORIGINAL ids: (a, b, support), a < b."""
    from .ntile import grouped_sum_sorted

    out_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("support", pa.int64())]
    )
    oriented, okey_ref, n, ids = _oriented(edges)
    if n == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    adj_ref = _broadcast_csr(oriented, okey_ref, n)
    empty_partial = pa.table(
        {"eenc": pa.array([], type=pa.int64()), "c": pa.array([], type=pa.int64())}
    )

    def close_credit_edges(batch: pa.Table) -> pa.Table:
        indptr, keys, rnk, irnk = ray.get(adj_ref)
        eu = batch.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        ev = batch.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        if not (len(eu) and len(keys)):
            return empty_partial
        ek = eu * np.int64(n) + rnk[ev]
        lo = np.searchsorted(keys, ek) + 1
        hi = indptr[eu + 1]
        counts = np.maximum(hi - lo, 0)
        tot = int(counts.sum())
        if not tot:
            return empty_partial
        starts_rep = np.repeat(lo, counts)
        local = np.arange(tot) - np.repeat(counts.cumsum() - counts, counts)
        wrnk = keys[starts_rep + local] % n
        vrep = np.repeat(ev, counts)
        urep = np.repeat(eu, counts)
        wk = vrep * np.int64(n) + wrnk
        idx = np.searchsorted(keys, wk)
        idx[idx >= len(keys)] = len(keys) - 1
        m = keys[idx] == wk
        if not m.any():
            return empty_partial
        u3, v3, w3 = urep[m], vrep[m], irnk[wrnk[m]]
        # one credit per EDGE of every closed triangle (u, v, w)
        ea = np.concatenate([u3, u3, v3])
        eb = np.concatenate([v3, w3, w3])
        lo_, hi_ = np.minimum(ea, eb), np.maximum(ea, eb)
        packed = lo_ * np.int64(n) + hi_
        eenc, c = np.unique(packed, return_counts=True)
        return pa.table(
            {"eenc": pa.array(eenc), "c": pa.array(c.astype(np.int64))}
        )

    partial = oriented.map_batches(close_credit_edges, batch_format="pyarrow")
    sup = grouped_sum_sorted(partial, "eenc", "c", out_col="support")
    ids_ref = ray.put(np.asarray(ids, dtype=np.int64))

    def finish(t: pa.Table) -> pa.Table:
        ids_arr = ray.get(ids_ref)
        eenc = t.column("eenc").to_numpy(zero_copy_only=False)
        a = ids_arr[eenc // n]
        b = ids_arr[eenc % n]
        return pa.table(
            {
                "a": pa.array(np.minimum(a, b)),
                "b": pa.array(np.maximum(a, b)),
                "support": t.column("support"),
            }
        ).cast(out_schema)

    return sup.map_batches(finish, batch_format="pyarrow")


def k_truss(
    edges: ray.data.Dataset, k: int, max_rounds: int = 64
) -> tuple[ray.data.Dataset, int]:
    """k-truss decomposition: the maximal subgraph in which every edge
    lies in >= k-2 triangles — the cohesion filter one notch stronger
    than k-core (every k-truss edge is in a (k-1)-core). Iterated peel:
    each round recomputes per-edge support over the SURVIVORS
    (:func:`edge_support` — degree-ordered broadcast-CSR closure, the
    same <= broadcastable-CSR tier as local_clustering; the BSP engine
    is the beyond-that tier) and drops edges below k-2. Since E_r is a
    subset of E_{r-1}, a round with an unchanged edge count IS the
    fixpoint. Returns (surviving (a, b) edges canonical on original
    ids, support passes run including the fixpoint-confirming one)."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    import pyarrow.compute as pc

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("support"), k - 2))
        return pa.table({"src": t.column("a"), "dst": t.column("b")})

    cur = edges
    prev_cnt = -1
    for rounds in range(1, max_rounds + 1):
        nxt = (
            edge_support(cur)
            .map_batches(keep, batch_format="pyarrow")
            .materialize()
        )
        cnt = nxt.count()
        if cnt == prev_cnt or cnt == 0:
            out = nxt.map_batches(
                lambda t: pa.table(
                    {"a": t.column("src"), "b": t.column("dst")}
                ),
                batch_format="pyarrow",
            )
            return out, rounds
        prev_cnt, cur = cnt, nxt
    raise RuntimeError(
        f"k_truss did not converge in {max_rounds} support passes"
    )
