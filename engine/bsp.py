"""Persistent shard-actor BSP engine — the fully partitioned scale path.

``engine.pagerank`` broadcasts the dense rank vector (fine to ~1e9
vertices); this module keeps ALL vertex and edge state sharded across
long-lived Ray actors, so nothing is O(V) on any single process:

- Shard ``s`` of ``P`` owns vertices ``{v : v % P == s}`` and the out-edges
  whose src it owns (the actor-held analog of the reference's in-CSR
  ``Graph4CL`` layout, ref: src/Graph4CL.cpp:16-46 — we use the out-CSR /
  push direction because Ray's shuffle replaces the gather).
- Ingest is push-based: ``map_batches`` tasks split each edge block by
  ``src % P`` and call ``ingest`` on the owning actors — the driver never
  sees an edge.
- Each superstep: (1) tiny scalar collective for the dangling sum
  (ref: src/Graph.cpp:135-140), (2) every actor bincount-combines its local
  contributions by dst and ships one array per destination shard through
  the object store (all-to-all of pre-combined partials), (3) every actor
  applies ``new = sink_sum + d·mass`` to its owned slice and returns its
  local L1 residual (ref update rule: src/Graph.cpp:142-155).
- Driver traffic per superstep: 3·P small RPCs + P² object refs — no
  vertex data.

Connected components run on the same actors with a min-label combine
(north-rule N4). Checkpoint/resume writes one parquet per shard per
iteration (per-partition lineage, north-rule N7).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

DAMPING = 0.85


@ray.remote
class ShardActor:
    """Owns vertices v ≡ shard_id (mod P) and their out-edges."""

    def __init__(self, shard_id: int, num_shards: int):
        self.sid = shard_id
        self.P = num_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.n_owned = 0

    def ingest(self, src: np.ndarray, dst: np.ndarray) -> int:
        self._src_parts.append(np.asarray(src, dtype=np.int64))
        self._dst_parts.append(np.asarray(dst, dtype=np.int64))
        return len(src)

    def finalize(self, n_total: int) -> dict:
        """Build the local CSR-ish layout; precompute the static combine and
        routing structure so supersteps are pure numpy."""
        self.n_total = n_total
        self.n_owned = len(range(self.sid, n_total, self.P))
        src = (
            np.concatenate(self._src_parts) if self._src_parts else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts) if self._dst_parts else np.empty(0, np.int64)
        )
        self._src_parts = self._dst_parts = []
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        self.edge_src_local = src // self.P          # local index of src
        self.edge_dst = dst
        # out-degree of owned vertices (multigraph: duplicates count,
        # ref: src/Graph.cpp:92-97)
        self.outdeg = np.bincount(self.edge_src_local, minlength=self.n_owned).astype(
            np.int64
        )
        self.inv_outdeg = np.zeros(self.n_owned)
        nz = self.outdeg > 0
        self.inv_outdeg[nz] = 1.0 / self.outdeg[nz]
        self.is_sink = ~nz
        # static per-shard combine: compact dst ids once
        self.uniq_dst, self.dst_inv = np.unique(dst, return_inverse=True)
        dshard = self.uniq_dst % self.P
        self.route_order = np.argsort(dshard, kind="stable")
        routed = dshard[self.route_order]
        self.route_bounds = np.searchsorted(routed, np.arange(self.P + 1))
        self.rank = np.full(self.n_owned, 1.0 / n_total) if n_total else np.empty(0)
        self.label = np.arange(self.sid, n_total, self.P, dtype=np.int64)
        self._incoming: list = []
        return {
            "shard": self.sid,
            "owned": self.n_owned,
            "edges": int(len(dst)),
            "sinks": int(self.is_sink.sum()),
        }

    # ---- PageRank -------------------------------------------------------

    def reset_ranks(self) -> None:
        self.rank = np.full(self.n_owned, 1.0 / self.n_total)

    def sink_rank_sum(self) -> float:
        return float(self.rank[self.is_sink].sum())

    def emit_mass(self) -> list:
        """Combine local contributions by dst, return one (dst, mass) pair
        of arrays per destination shard (refs go through the object store)."""
        w = self.rank * self.inv_outdeg
        mass = np.bincount(
            self.dst_inv, weights=w[self.edge_src_local], minlength=len(self.uniq_dst)
        )
        out = []
        for t in range(self.P):
            lo, hi = self.route_bounds[t], self.route_bounds[t + 1]
            sel = self.route_order[lo:hi]
            # ray.put → the driver routes only tiny refs; payload moves
            # shard-to-shard through the object store
            out.append(ray.put((self.uniq_dst[sel], mass[sel])))
        return out

    def receive(self, parts: list) -> None:
        """Accept this shard's slice of every source shard's emission
        (a list of ObjectRefs, resolved locally at apply time)."""
        self._incoming.extend(parts)

    def apply_rank(self, sink_sum: float, d: float) -> float:
        mass = np.zeros(self.n_owned)
        for ref in self._incoming:
            dst_ids, m = ray.get(ref)
            np.add.at(mass, dst_ids // self.P, m)
        self._incoming = []
        new = sink_sum + d * mass
        l1 = float(np.abs(new - self.rank).sum())
        self.rank = new
        return l1

    # ---- Connected components (min-label) -------------------------------

    def emit_min_label(self) -> list:
        """Per destination shard: (dst_ids, min incoming label per dst)."""
        lbl = np.full(len(self.uniq_dst), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lbl, self.dst_inv, self.label[self.edge_src_local])
        out = []
        for t in range(self.P):
            lo, hi = self.route_bounds[t], self.route_bounds[t + 1]
            sel = self.route_order[lo:hi]
            out.append(ray.put((self.uniq_dst[sel], lbl[sel])))
        return out

    def apply_min_label(self) -> int:
        new = self.label.copy()
        for ref in self._incoming:
            dst_ids, lbl = ray.get(ref)
            loc = dst_ids // self.P
            np.minimum.at(new, loc, lbl)
        self._incoming = []
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    # ---- state I/O ------------------------------------------------------

    def get_state(self, what: str = "rank") -> pa.Table:
        vid = np.arange(self.sid, self.n_total, self.P, dtype=np.uint64)
        col = self.rank if what == "rank" else self.label
        return pa.table({"vid": pa.array(vid, type=pa.uint64()), what: pa.array(col)})

    def checkpoint(self, root: str, it: int, what: str = "rank") -> dict:
        os.makedirs(os.path.join(root, f"iter={it}", "ranks"), exist_ok=True)
        tbl = self.get_state(what)
        fn = os.path.join(root, f"iter={it}", "ranks", f"shard-{self.sid:05d}.parquet")
        pq.write_table(tbl, fn)
        data = self.rank if what == "rank" else self.label
        return {
            "part": self.sid,
            "rows": int(len(data)),
            "content_hash": hashlib.sha256(np.ascontiguousarray(data).tobytes()).hexdigest()[:16],
        }

    def restore(self, root: str, it: int, what: str = "rank") -> None:
        fn = os.path.join(root, f"iter={it}", "ranks", f"shard-{self.sid:05d}.parquet")
        tbl = pq.read_table(fn)
        col = tbl.column(what).to_numpy(zero_copy_only=False)
        if what == "rank":
            self.rank = col.astype(np.float64)
        else:
            self.label = col.astype(np.int64)


class BSPGraph:
    """Driver-side handle over the shard actors."""

    def __init__(
        self,
        edges_encoded: ray.data.Dataset,
        n: int,
        num_shards: int = 8,
        symmetric_copy: bool = False,
    ):
        """``edges_encoded``: Dataset (src, dst) with dense vids in [0, n).
        ``symmetric_copy``: also ingest reversed edges (for CC messages)."""
        self.P = num_shards
        self.n = n
        self.actors = [
            ShardActor.remote(s, num_shards) for s in range(num_shards)
        ]
        actors, P = self.actors, num_shards

        def route(batch: pa.Table) -> pa.Table:
            src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            if symmetric_copy:
                src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            shard = src % P
            refs = []
            for s in range(P):
                m = shard == s
                if m.any():
                    refs.append(actors[s].ingest.remote(src[m], dst[m]))
            ray.get(refs)  # delivery barrier inside the task, not the driver
            return pa.table({"n": pa.array([len(src)], type=pa.int64())})

        # drive ingestion; driver only sees per-block edge counts
        counts = edges_encoded.map_batches(route, batch_format="pyarrow")
        self.num_edges = int(
            sum(b.column("n").to_numpy()[0] for b in counts.iter_batches(batch_format="pyarrow"))
        )
        self.shard_stats = ray.get([a.finalize.remote(n) for a in self.actors])
        self.num_sinks = sum(s["sinks"] for s in self.shard_stats)

    def _exchange(self, emit_method: str) -> None:
        emitted = [getattr(a, emit_method).remote() for a in self.actors]
        parts = ray.get(emitted)  # P lists of P (ids, values) pairs (small refs)
        recv = []
        for t, a in enumerate(self.actors):
            recv.append(a.receive.remote([parts[s][t] for s in range(self.P)]))
        ray.get(recv)

    def pagerank(
        self,
        iterations: int | None = None,
        eps: float | None = None,
        d: float = DAMPING,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
    ) -> tuple[ray.data.Dataset, int, list[dict]]:
        """Returns (ranks Dataset (vid, rank), iterations, metrics)."""
        if iterations is None and eps is None:
            raise ValueError("set iterations and/or eps")
        start = 0
        if checkpoint_dir:
            from . import checkpoint as ckpt

            done = ckpt.completed_iterations(checkpoint_dir)
            if done:
                start = done[-1]
                ray.get(
                    [a.restore.remote(checkpoint_dir, start) for a in self.actors]
                )
        metrics: list[dict] = []
        it = start
        while True:
            if iterations is not None and it >= iterations:
                break
            it += 1
            t0 = time.perf_counter()
            sink_total = sum(ray.get([a.sink_rank_sum.remote() for a in self.actors]))
            sink_sum = ((1.0 - d) + d * sink_total) / self.n
            self._exchange("emit_mass")
            l1 = sum(ray.get([a.apply_rank.remote(sink_sum, d) for a in self.actors]))
            dt = time.perf_counter() - t0
            metrics.append(
                {
                    "iteration": it,
                    "wall_sec": dt,
                    "edges": self.num_edges,
                    "edges_per_sec": self.num_edges / dt if dt > 0 else float("inf"),
                    "l1_residual": l1,
                    "num_vertices": self.n,
                }
            )
            if checkpoint_dir and it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, metrics[-1])
            if eps is not None and l1 < eps:
                break
        return self.state_dataset("rank"), it, metrics

    def _checkpoint(self, root: str, it: int, metric: dict) -> None:
        lineage = ray.get([a.checkpoint.remote(root, it) for a in self.actors])
        d = os.path.join(root, f"iter={it}")
        with open(os.path.join(d, "metrics.json"), "w") as f:
            json.dump({"iteration": it, "metrics": metric, "partitions": lineage}, f)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")

    def connected_components(self, max_iters: int = 10_000) -> tuple[ray.data.Dataset, int]:
        """Min-label propagation to fixpoint. Requires symmetric_copy=True.
        Labels are the minimum dense vid of each component (exact-match
        semantics, north-rule N4). Returns (labels Dataset, rounds)."""
        rounds = 0
        while rounds < max_iters:
            rounds += 1
            self._exchange("emit_min_label")
            changed = sum(
                ray.get([a.apply_min_label.remote() for a in self.actors])
            )
            if changed == 0:
                break
        return self.state_dataset("label"), rounds

    def state_dataset(self, what: str = "rank") -> ray.data.Dataset:
        tables = ray.get([a.get_state.remote(what) for a in self.actors])
        return ray.data.from_arrow(tables)


def bsp_pagerank(
    edges: ray.data.Dataset,
    iterations: int | None = None,
    eps: float | None = None,
    num_shards: int = 8,
    d: float = DAMPING,
    checkpoint_dir: str | None = None,
):
    """End-to-end PageRank on the shard-actor engine over original-id edges.

    Returns a ``PageRankResult`` (same shape as ``engine.pagerank``): ranks
    aligned to the sorted original-id dictionary.
    """
    from . import graph as G
    from .pagerank import PageRankResult

    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=num_shards)
    ds, iters, metrics = g.pagerank(
        iterations=iterations, eps=eps, d=d, checkpoint_dir=checkpoint_dir
    )
    rank = np.empty(len(ids))
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        rank[vid] = b.column("rank").to_numpy(zero_copy_only=False)
    return PageRankResult(ids=ids, ranks=rank, iterations=iters, metrics=metrics)


def bsp_connected_components(
    edges: ray.data.Dataset, num_shards: int = 8
) -> tuple[dict, int]:
    """Undirected connected components; label = smallest original id in the
    component (exact-match semantics, north-rule N4).

    Returns (dict original_id -> original_id label, rounds)."""
    from . import graph as G

    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=num_shards, symmetric_copy=True)
    ds, _rounds = g.connected_components()
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        for v, l in zip(vid, lbl):
            out[ids[v].item() if hasattr(ids[v], "item") else ids[v]] = (
                ids[l].item() if hasattr(ids[l], "item") else ids[l]
            )
    return out, _rounds
