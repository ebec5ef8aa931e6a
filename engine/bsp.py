"""Persistent shard-actor BSP engine — the fully partitioned scale path.

``engine.pagerank`` broadcasts the dense rank vector (fine to ~1e9
vertices); this module keeps ALL vertex and edge state sharded across
long-lived Ray actors, so nothing is O(V) on any single process:

- Shard ``s`` of ``P`` owns vertices ``{v : v % P == s}`` and the out-edges
  whose src it owns (the actor-held analog of the reference's CSR
  ``Graph4CL`` layout, ref: src/Graph4CL.cpp:16-46 — out-CSR / push
  direction, because the object-store exchange replaces the gather).
- Ingest is push-based: ``map_batches`` tasks split each edge block by
  ``src % P`` and call ``ingest`` on the owning actors — the driver never
  sees an edge.
- The exchange topology is STATIC and shipped once: each shard's combined
  destination-id slices (sorted, contiguous per target shard) AND every
  shard's per-target slice boundaries go to the receivers at setup;
  receivers precompute a permutation + segment boundaries. Per superstep
  only the VALUE arrays move, and every combine is
  ``np.add/minimum.reduceat`` over precomputed segments — no hashing,
  no ``ufunc.at``, no re-serialized ids.
- A superstep is exactly TWO actor waves: (1) emit — each actor combines
  its local contributions per destination with one ``reduceat`` and ships
  one value object per target NODE GROUP (G=1, the single-node default:
  the whole combined array as ONE object); (2) apply — each actor
  resolves the P source objects for its own group (zero-copy plasma
  on-node), slices its own window via the static bounds, applies
  ``new = sink_sum + d·mass`` (ref update rule: src/Graph.cpp:142-155,
  sink_sum per src/Graph.cpp:135-140) and returns its local L1 residual
  AND its new dangling-rank sum, which feeds the next superstep's
  sink_sum with no extra collective. Driver traffic: 2·P RPCs + P·G tiny
  ObjectRefs per superstep — never vertex data. On a G-node cluster
  (shards placement-grouped per node, ``num_node_groups=G``) cross-node
  bytes are exactly the values destined to each node — O(nodes) traffic,
  the distributed analog of the reference's per-iteration host↔device
  transfer discipline (src/Graph4CL.cpp:161-189).

Connected components run on the same actors with min-label combines
(north-rule N4). Checkpoint/resume writes one parquet per shard per
iteration with per-partition lineage (north-rule N7).
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
SSSP_SENTINEL = np.int64(2**62)  # unreached marker for weighted SSSP


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
        """Build the local layout; precompute every static structure so a
        superstep is pure vectorized numpy over contiguous arrays."""
        self.n_total = n_total
        self.n_owned = len(range(self.sid, n_total, self.P))
        src = (
            np.concatenate(self._src_parts) if self._src_parts else np.empty(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts) if self._dst_parts else np.empty(0, np.int64)
        )
        self._src_parts = self._dst_parts = []
        self.num_edges = len(dst)
        # out-degree of owned vertices (multigraph: duplicates count,
        # ref: src/Graph.cpp:92-97)
        src_local = src // self.P
        self.outdeg = np.bincount(src_local, minlength=self.n_owned).astype(np.int64)
        self.inv_outdeg = np.zeros(self.n_owned)
        nz = self.outdeg > 0
        self.inv_outdeg[nz] = 1.0 / self.outdeg[nz]
        self.is_sink = ~nz

        # destination compaction, pre-sorted by (dst % P, dst) so per-target
        # slices are contiguous. ONE argsort of the packed key (instead of
        # np.unique(return_inverse) + a second argsort): the finalize wave
        # runs P actors concurrently and is memory-bandwidth-bound, so the
        # extra sort + inverse-permutation passes dominated build time
        key = (dst % self.P) * np.int64(n_total + 1) + dst
        edge_order = np.argsort(key, kind="stable")
        sk = key[edge_order]
        new_run = (
            np.concatenate(([True], sk[1:] != sk[:-1]))
            if len(sk)
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(new_run)
        uniq_key = sk[starts]
        self.uniq_dst = (uniq_key % np.int64(n_total + 1)).astype(np.int64)
        uniq_shard = (uniq_key // np.int64(n_total + 1)).astype(np.int64)
        self.route_bounds = np.searchsorted(uniq_shard, np.arange(self.P + 1))
        # edge-level combine structure: edges reordered by compact dst idx
        # once, so every per-superstep combine is a single reduceat
        self.edge_starts = starts
        self.edge_src_local = src_local[edge_order]
        # per-edge compact dst index (sorted)
        self.edge_dst_idx = np.cumsum(new_run) - 1

        self.rank = np.full(self.n_owned, 1.0 / n_total) if n_total else np.empty(0)
        self.frozen = np.zeros(self.n_owned, dtype=bool)
        self.label = np.arange(self.sid, n_total, self.P, dtype=np.int64)
        self._in_ready = False
        return {
            "shard": self.sid,
            "owned": self.n_owned,
            "edges": int(self.num_edges),
            "sinks": int(self.is_sink.sum()),
        }

    # ---- static exchange topology ---------------------------------------

    def static_id_slices(self) -> list:
        """One ObjectRef per target shard: the sorted dst ids this shard
        will send values for (shipped once, cached by the receiver)."""
        out = []
        for t in range(self.P):
            lo, hi = self.route_bounds[t], self.route_bounds[t + 1]
            out.append(ray.put(self.uniq_dst[lo:hi].copy()))
        return out

    def get_route_bounds(self) -> np.ndarray:
        """This shard's static per-target slice boundaries into its
        combined value array (P+1 ints, shipped once to every receiver)."""
        return self.route_bounds

    def set_sources(
        self, id_refs: list, src_bounds: list, group_of: np.ndarray | None = None
    ) -> None:
        """Receive every source shard's static id slice for this target
        plus every source's route_bounds; precompute the merge permutation
        + segment boundaries. ``src_bounds`` lets ``apply_*`` slice its own
        window out of each source's combined value array — the
        per-superstep exchange needs one ``ray.put`` per (source,
        node-group) (O(P·G) objects total, G = number of node groups)
        instead of one per (source, target) pair (O(P²)).

        ``group_of`` (len P, nondecreasing, contiguous runs) maps each
        TARGET shard to its node group. With G=1 (single node, the
        default) each source ships its WHOLE combined array as one object
        — a zero-copy plasma read for every co-located receiver. On a
        G-node cluster each source ships one object per target NODE
        holding only that node's slices, so cross-node traffic is the
        data actually destined there (O(nodes) total), not P× the
        combined array. This is the distributed analog of the reference's
        per-iteration host↔device transfer discipline
        (ref: src/Graph4CL.cpp:161-189)."""
        P = self.P
        if group_of is None:
            group_of = np.zeros(P, dtype=np.int64)
        self._group_of = np.asarray(group_of, dtype=np.int64)
        self._my_group = int(self._group_of[self.sid])
        # first target shard of my group (groups are contiguous runs)
        g_lo = int(np.searchsorted(self._group_of, self._my_group, side="left"))
        self._my_group_lo = g_lo  # my index within the group = sid - g_lo
        # each source's group-object for my group starts at its
        # route_bounds[g_lo]; target windows inside it are group-local
        self._src_bounds = [np.asarray(b) for b in src_bounds]
        self._src_group_base = [int(b[g_lo]) for b in self._src_bounds]
        slices = ray.get(list(id_refs))
        self._src_sizes = [len(s) for s in slices]
        if sum(self._src_sizes) == 0:
            self.in_perm = np.empty(0, np.int64)
            self.in_starts = np.empty(0, np.int64)
            self.in_target = np.empty(0, np.int64)
            self._in_ready = True
            return
        concat = np.concatenate(slices) // self.P  # local indices
        self.in_perm = np.argsort(concat, kind="stable")
        sorted_loc = concat[self.in_perm]
        uniq_loc, starts = np.unique(sorted_loc, return_index=True)
        self.in_starts = starts
        self.in_target = uniq_loc
        self._in_ready = True

    def _incoming_slices(self, refs: list) -> list:
        """Resolve the P per-source group objects for THIS shard's node
        group (one vector ``ray.get``) and slice this target's window out
        of each, source order. Windows are group-local: the group object
        from source s starts at its route_bounds[first shard of my group]."""
        full = ray.get(list(refs))
        t = self.sid
        return [
            np.asarray(a)[
                self._src_bounds[s][t] - self._src_group_base[s]
                : self._src_bounds[s][t + 1] - self._src_group_base[s]
            ]
            for s, a in enumerate(full)
        ]

    def _group_slices(self, combined: np.ndarray) -> list:
        """Split a combined per-target value array into one object per
        node group (G refs; G=1 ships the whole array — the single-node
        degenerate path). Group g covers contiguous target shards
        [searchsorted(g, left), searchsorted(g, right))."""
        G = int(self._group_of[-1]) + 1
        if G == 1:
            return [ray.put(combined)]
        out = []
        for g in range(G):
            lo = int(np.searchsorted(self._group_of, g, side="left"))
            hi = int(np.searchsorted(self._group_of, g, side="right"))
            out.append(
                ray.put(combined[self.route_bounds[lo] : self.route_bounds[hi]])
            )
        return out

    # ---- PageRank -------------------------------------------------------

    def reset_ranks(self) -> None:
        self.rank = (
            np.full(self.n_owned, 1.0 / self.n_total)
            if self.n_total
            else np.empty(0)
        )
        self.frozen = np.zeros(self.n_owned, dtype=bool)

    def sink_rank_sum(self) -> float:
        return float(self.rank[self.is_sink].sum())

    def emit_mass(self):
        """Combine local contributions per compact dst (one ``reduceat``
        over the dst-sorted edge array); ship one object per node group
        (the whole combined array as ONE object when G=1) — receivers
        slice their window via the static route_bounds (see
        ``set_sources``)."""
        w = self.rank * self.inv_outdeg
        vals = w[self.edge_src_local]  # edges already in dst-sorted order
        if len(vals):
            mass = np.add.reduceat(vals, self.edge_starts)
        else:
            mass = np.empty(0, np.float64)
        return self._group_slices(mass)

    def apply_rank(
        self, refs: list, sink_sum: float, d: float,
        freeze_delta: float | None = None,
    ) -> tuple:
        """One wave: resolve incoming mass slices, apply the update, return
        (local L1, dangling-rank sum of the NEW ranks, active count) — the
        dangling sum feeds the next superstep's sink_sum without a separate
        collective. ``freeze_delta`` enables the reference-exact per-vertex
        freeze (ref: src/Graph.cpp:160-169): a vertex moving < delta
        commits and stops updating but keeps contributing its committed
        rank; the driver stops when the global active count hits 0."""
        parts = self._incoming_slices(refs)
        mass_local = np.zeros(self.n_owned)
        if parts and self.in_perm.size:
            concat = np.concatenate(parts)
            sums = np.add.reduceat(concat[self.in_perm], self.in_starts)
            mass_local[self.in_target] = sums
        new = sink_sum + d * mass_local
        if freeze_delta is None:
            l1 = float(np.abs(new - self.rank).sum())
            self.rank = new
            n_active = self.n_owned
        else:
            active = ~self.frozen
            diff = np.abs(new - self.rank)
            self.rank = np.where(active, new, self.rank)
            self.frozen |= active & (diff < freeze_delta)
            l1 = float(diff[active].sum())
            n_active = int((~self.frozen).sum())
        return l1, float(self.rank[self.is_sink].sum()), n_active

    # ---- Connected components (min-label) -------------------------------

    def emit_min_label(self):
        vals = self.label[self.edge_src_local]  # already in dst-sorted order
        if len(vals):
            mins = np.minimum.reduceat(vals, self.edge_starts)
        else:
            mins = np.empty(0, np.int64)
        # one object per node group; receivers slice via route_bounds
        return self._group_slices(mins)

    def apply_min_label(self, refs: list) -> int:
        parts = self._incoming_slices(refs)
        new = self.label.copy()
        if parts and self.in_perm.size:
            concat = np.concatenate(parts)
            mins = np.minimum.reduceat(concat[self.in_perm], self.in_starts)
            new[self.in_target] = np.minimum(new[self.in_target], mins)
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    # ---- BFS hop distance (min-plus over the same combine structure) ----

    def bfs_begin(self, source_vid) -> None:
        """Init BFS from one source vid or an array of them (multi-source
        BFS = distance-to-nearest-landmark, the primitive under landmark /
        seed-set distance sketches): distances live in ``label`` (the CC
        min-label machinery is reused verbatim for the emit half —
        min-plus propagation is min-label with a +1 on apply). Sentinel
        ``n_total`` marks unreached (hop counts are < n_total always)."""
        self.label = np.full(self.n_owned, self.n_total, dtype=np.int64)
        srcs = np.atleast_1d(np.asarray(source_vid, dtype=np.int64))
        mine = srcs[srcs % self.P == self.sid]
        self.label[mine // self.P] = 0

    def apply_min_dist(self, refs: list) -> int:
        """BFS apply: dist = min(dist, min over in-neighbors of dist + 1).
        Unreached neighbors carry the sentinel; sentinel + 1 never beats a
        real distance and the owned sentinel, so unreached stays unreached
        until a real frontier arrives."""
        parts = self._incoming_slices(refs)
        new = self.label.copy()
        if parts and self.in_perm.size:
            concat = np.concatenate(parts)
            mins = np.minimum.reduceat(concat[self.in_perm], self.in_starts)
            new[self.in_target] = np.minimum(new[self.in_target], mins + 1)
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    # ---- Weighted SSSP (min-plus with per-edge integer weights) ---------

    def sssp_begin(self, source_vid: int, wmod: int = 9) -> None:
        """Init single-source shortest paths. Per-edge integer weights are
        derived in-shard from the UNORDERED dense-vid pair —
        ``w = 1 + ((min(s,t) % 97) * 31 + max(s,t) % 89) % wmod`` — so the
        weighting is symmetric (a true undirected weighted graph even
        though the symmetrized edge set stores both directions), needs no
        ingest-path changes, and is exactly reproducible in SQL via a
        ROW_NUMBER dense-rank CTE. Distances live in ``label`` (same
        shared-state caveat as bfs); sentinel 2**62 marks unreached —
        any real path is ≤ (n-1)·wmod, and sentinel + w never beats the
        owned sentinel in the min-apply."""
        s = self.edge_src_local * self.P + self.sid
        t = self.uniq_dst[self.edge_dst_idx]
        a, b = np.minimum(s, t), np.maximum(s, t)
        self.edge_w = 1 + ((a % 97) * 31 + b % 89) % wmod
        self.label = np.full(self.n_owned, SSSP_SENTINEL, dtype=np.int64)
        if source_vid % self.P == self.sid:
            self.label[source_vid // self.P] = 0

    def emit_min_plus(self):
        """SSSP emit: per compact dst, min over local edges of
        dist[src] + w — the weighted analog of ``emit_min_label``; the
        apply half is ``apply_min_label`` verbatim (pure min, the +w
        already happened here)."""
        vals = self.label[self.edge_src_local] + self.edge_w
        if len(vals):
            mins = np.minimum.reduceat(vals, self.edge_starts)
        else:
            mins = np.empty(0, np.int64)
        return self._group_slices(mins)

    # ---- Label propagation (per-shard label-count combine) --------------

    def emit_label_counts(self):
        """LPA emit: count (dst, label) pairs locally (the per-shard
        combine), ship ONE (dst_ids, labels, counts, per-target positions)
        object — message volume is distinct (dst, label) pairs, not edges.
        Unlike PR/CC the slice positions depend on which pairs exist this
        round, so they travel with the payload."""
        vals = self.label[self.edge_src_local]
        base = np.int64(self.n_total + 1)
        key = self.edge_dst_idx.astype(np.int64) * base + vals
        uk, cnt = np.unique(key, return_counts=True)
        dst_idx = (uk // base).astype(np.int64)
        lbl = (uk % base).astype(np.int64)
        gdst = self.uniq_dst[dst_idx]
        cnt = cnt.astype(np.int64)
        pos = np.searchsorted(dst_idx, self.route_bounds)
        G = int(self._group_of[-1]) + 1
        if G == 1:
            return [ray.put((gdst, lbl, cnt, pos))]
        out = []
        for g in range(G):
            lo = int(np.searchsorted(self._group_of, g, side="left"))
            hi = int(np.searchsorted(self._group_of, g, side="right"))
            a, b = pos[lo], pos[hi]
            out.append(
                ray.put((gdst[a:b], lbl[a:b], cnt[a:b], pos[lo : hi + 1] - a))
            )
        return out

    def apply_mode_label(self, refs: list) -> int:
        """LPA apply: merge incoming (dst, label, count) triples, take the
        most frequent label per owned vertex (tie → smallest label).
        Vertices with no incoming keep their label."""
        full = ray.get(list(refs))
        # positions in a group object are group-local: index by my rank
        # within the group (== sid for G=1, where _my_group_lo is 0)
        t = self.sid - self._my_group_lo
        parts = []
        for gd_a, lb_a, ct_a, pos in full:
            lo, hi = pos[t], pos[t + 1]
            if hi > lo:
                parts.append((gd_a[lo:hi], lb_a[lo:hi], ct_a[lo:hi]))
        if not parts:
            return 0
        gd = np.concatenate([p[0] for p in parts])
        lb = np.concatenate([p[1] for p in parts])
        ct = np.concatenate([p[2] for p in parts])
        base = np.int64(self.n_total + 1)
        key = (gd // self.P) * base + lb
        order = np.argsort(key, kind="stable")
        key_s, ct_s = key[order], ct[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(key_s)) + 1))
        tot = np.add.reduceat(ct_s, starts)
        ukey = key_s[starts]
        uloc = (ukey // base).astype(np.int64)
        ulbl = (ukey % base).astype(np.int64)
        # per vertex: argmax count, tie-break smallest label (lexsort keys
        # are last-is-primary)
        order2 = np.lexsort((ulbl, -tot, uloc))
        uloc_s = uloc[order2]
        first = np.concatenate(([0], np.flatnonzero(np.diff(uloc_s)) + 1))
        sel = order2[first]
        new = self.label.copy()
        new[uloc[sel]] = ulbl[sel]
        changed = int((new != self.label).sum())
        self.label = new
        return changed

    # ---- k-core peeling (north-rule dense-subgraph primitive) -----------

    def kcore_begin(self, k: int) -> None:
        """Init distributed peeling. Requires symmetric ingest (each
        undirected edge present in BOTH directions), so a vertex's
        undirected degree == its out-degree on this shard."""
        self.kc_k = int(k)
        self.kc_deg = self.outdeg.astype(np.float64).copy()
        self.kc_alive = np.ones(self.n_owned, dtype=bool)

    def kcore_emit(self):
        """One peel wave, emit half: kill owned vertices whose surviving
        degree dropped below k; ship per-destination decrement counts over
        the STATIC combine structure (one reduceat + the group slicing of
        emit_mass — per-round cost is O(E/P + distinct-dst/P) regardless
        of how many rounds have run; no edge rewrite, no driver degrees).
        Returns (group refs, number newly dead)."""
        newly = self.kc_alive & (self.kc_deg < self.kc_k)
        self.kc_alive &= ~newly
        vals = newly[self.edge_src_local].astype(np.float64)
        if len(vals):
            dec = np.add.reduceat(vals, self.edge_starts)
        else:
            dec = np.empty(0, np.float64)
        return self._group_slices(dec), int(newly.sum())

    def kcore_apply(self, refs: list) -> None:
        """Apply half: subtract incoming decrements from owned degrees
        (decrements addressed to already-dead vertices are harmless)."""
        parts = self._incoming_slices(refs)
        if parts and self.in_perm.size:
            concat = np.concatenate(parts)
            sums = np.add.reduceat(concat[self.in_perm], self.in_starts)
            self.kc_deg[self.in_target] -= sums

    def kcore_alive_vids(self) -> pa.Table:
        vid = np.arange(self.sid, self.n_total, self.P, dtype=np.uint64)
        return pa.table(
            {"vid": pa.array(vid[self.kc_alive], type=pa.uint64())}
        )

    # ---- state I/O ------------------------------------------------------

    def get_state(self, what: str = "rank") -> pa.Table:
        vid = np.arange(self.sid, self.n_total, self.P, dtype=np.uint64)
        col = self.rank if what == "rank" else self.label
        return pa.table({"vid": pa.array(vid, type=pa.uint64()), what: pa.array(col)})

    def checkpoint_to(self, iter_dir: str, what: str = "rank") -> dict:
        """Write this shard's state parquet into ``iter_dir`` (the driver
        passes a tmp dir and renames it atomically once all shards and the
        metadata are written). Multi-node deployments must point
        ``checkpoint_dir`` at SHARED storage (NFS / fuse-mounted object
        store): shards write from their own node and the driver renames
        from its — on node-local disks the published checkpoint would be
        missing every remote shard."""
        os.makedirs(os.path.join(iter_dir, "ranks"), exist_ok=True)
        tbl = self.get_state(what)
        fn = os.path.join(iter_dir, "ranks", f"shard-{self.sid:05d}.parquet")
        pq.write_table(tbl, fn)
        data = self.rank if what == "rank" else self.label
        return {
            "part": self.sid,
            "rows": int(len(data)),
            "content_hash": hashlib.sha256(
                np.ascontiguousarray(data).tobytes()
            ).hexdigest()[:16],
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
        num_node_groups: int | None = None,
    ):
        """``edges_encoded``: Dataset (src, dst) with dense vids in [0, n).
        ``symmetric_copy``: also ingest reversed edges (for CC messages).
        ``num_node_groups``: exchange grouping — shards are split into G
        contiguous groups (on a real cluster: one group per NODE, shards
        placement-grouped per node) and each shard ships one value object
        per TARGET GROUP per superstep, so cross-group traffic is exactly
        the data destined there (O(nodes)), not G× the combined array.
        G=1 (default, or env GRAFT_NODE_GROUPS) degenerates to the
        single-object single-node path. Results are bit-identical for any
        G (same combine order; grouping only re-slices the shipped
        arrays)."""
        if num_node_groups is None:
            num_node_groups = int(os.environ.get("GRAFT_NODE_GROUPS", "1"))
        if not 1 <= num_node_groups <= num_shards:
            raise ValueError(
                f"num_node_groups must be in [1, {num_shards}], "
                f"got {num_node_groups}"
            )
        self.G = num_node_groups
        # contiguous group runs; group_of[s] = node group of shard s
        self.group_of = (
            np.arange(num_shards, dtype=np.int64) * num_node_groups
        ) // num_shards
        self.P = num_shards
        self.n = n
        self.symmetric_copy = symmetric_copy
        self.actors = [ShardActor.remote(s, num_shards) for s in range(num_shards)]
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

        counts = edges_encoded.map_batches(route, batch_format="pyarrow")
        self.num_edges = int(
            sum(
                b.column("n").to_numpy().sum()
                for b in counts.iter_batches(batch_format="pyarrow")
            )
        )
        self.shard_stats = ray.get([a.finalize.remote(n) for a in self.actors])
        self.num_sinks = sum(s["sinks"] for s in self.shard_stats)
        # ship the static exchange topology once (id slices + every
        # source's route_bounds, so per-superstep value exchange is ONE
        # object per source shard — O(P) driver refs, not O(P²))
        id_slices = ray.get([a.static_id_slices.remote() for a in self.actors])
        bounds = ray.get([a.get_route_bounds.remote() for a in self.actors])
        ray.get(
            [
                self.actors[t].set_sources.remote(
                    [id_slices[s][t] for s in range(P)], bounds, self.group_of
                )
                for t in range(P)
            ]
        )

    def _emit(self, emit_method: str) -> list:
        """Emit wave; returns, per source shard, its G per-group value
        refs. ``_incoming_for`` selects each target's group column."""
        return ray.get([getattr(a, emit_method).remote() for a in self.actors])

    def _incoming_for(self, emits: list, t: int) -> list:
        """The P refs target shard ``t`` must read: every source's object
        for t's node group (one ref per source; with G=1 every target
        reads the same single object per source — zero-copy on one node)."""
        g = int(self.group_of[t])
        return [emits[s][g] for s in range(self.P)]

    def exchange_stats(self) -> dict:
        """Static per-superstep exchange volume (bytes of float64 values)
        under the current grouping vs the ungrouped P×-amplification
        baseline: 'grouped_cross_bytes' counts only objects crossing a
        group boundary under one-group-per-node placement;
        'ungrouped_cross_bytes' is each source's full combined array
        fetched by every OTHER group (the pre-grouping design)."""
        bounds = ray.get([a.get_route_bounds.remote() for a in self.actors])
        grouped = ungrouped = total = 0
        for s in range(self.P):
            b = np.asarray(bounds[s])
            full = int(b[-1]) * 8
            total += full
            ungrouped += full * (self.G - 1)
            for g in range(self.G):
                lo = int(np.searchsorted(self.group_of, g, side="left"))
                hi = int(np.searchsorted(self.group_of, g, side="right"))
                sz = int(b[hi] - b[lo]) * 8
                if g != int(self.group_of[s]):
                    grouped += sz
        return {
            "num_shards": self.P,
            "num_node_groups": self.G,
            "combined_value_bytes_total": total,
            "grouped_cross_bytes": grouped,
            "ungrouped_cross_bytes": ungrouped,
        }

    def pagerank(
        self,
        iterations: int | None = None,
        eps: float | None = None,
        d: float = DAMPING,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 1,
        freeze_delta: float | None = None,
    ) -> tuple[ray.data.Dataset, int, list[dict]]:
        """Returns (ranks Dataset (vid, rank), iterations, metrics).

        ``freeze_delta``: reference-exact per-vertex freeze stop (see
        ``ShardActor.apply_rank``); the run stops when every vertex is
        frozen, counting the final all-frozen sweep (ref:
        src/Graph.cpp:133). Not combinable with checkpointing (the frozen
        mask is not persisted)."""
        if iterations is None and eps is None and freeze_delta is None:
            raise ValueError("set iterations, eps and/or freeze_delta")
        if freeze_delta is not None and checkpoint_dir is not None:
            raise ValueError(
                "freeze_delta is not combinable with checkpointing"
            )
        if self.n == 0:
            return self.state_dataset("rank"), 0, []
        start = 0
        resumed = False
        if checkpoint_dir:
            from . import checkpoint as ckpt

            done = ckpt.completed_iterations(checkpoint_dir)
            if done:
                start = done[-1]
                meta_fn = os.path.join(
                    checkpoint_dir, f"iter={start}", "metrics.json"
                )
                with open(meta_fn) as f:
                    meta = json.load(f)
                ck_p = meta.get("num_shards")
                ck_n = meta.get("num_vertices")
                if ck_p is not None and ck_p != self.P:
                    raise ValueError(
                        f"checkpoint written with num_shards={ck_p}, "
                        f"cannot resume with num_shards={self.P}"
                    )
                if ck_n is not None and ck_n != self.n:
                    raise ValueError(
                        f"checkpoint holds {ck_n} vertices, graph has {self.n}"
                    )
                ray.get([a.restore.remote(checkpoint_dir, start) for a in self.actors])
                resumed = True
        if not resumed:
            # a prior pagerank() on this graph leaves rank/frozen state
            # behind — a fresh (non-resumed) call must not warm-start
            ray.get([a.reset_ranks.remote() for a in self.actors])
        metrics: list[dict] = []
        it = start
        sink_total = sum(ray.get([a.sink_rank_sum.remote() for a in self.actors]))
        active_total = self.n
        while True:
            if iterations is not None and it >= iterations:
                break
            it += 1
            if freeze_delta is not None and active_total == 0:
                # final all-frozen sweep counted (ref: src/Graph.cpp:133)
                break
            t0 = time.perf_counter()
            sink_sum = ((1.0 - d) + d * sink_total) / self.n
            emits = self._emit("emit_mass")
            results = ray.get(
                [
                    a.apply_rank.remote(
                        self._incoming_for(emits, t), sink_sum, d, freeze_delta
                    )
                    for t, a in enumerate(self.actors)
                ]
            )
            l1 = sum(r[0] for r in results)
            sink_total = sum(r[1] for r in results)
            active_total = sum(r[2] for r in results)
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
        """Atomic per-iteration checkpoint: shards write into a tmp dir,
        the driver writes metadata (including the shard count and vertex
        count that ``restore`` validates) and renames — stale files from a
        previous run with a different P can never survive alongside a
        fresh ``_SUCCESS``."""
        import shutil

        d = os.path.join(root, f"iter={it}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        lineage = ray.get([a.checkpoint_to.remote(tmp) for a in self.actors])
        with open(os.path.join(tmp, "metrics.json"), "w") as f:
            json.dump(
                {
                    "iteration": it,
                    "num_shards": self.P,
                    "num_vertices": self.n,
                    "metrics": metric,
                    "partitions": lineage,
                },
                f,
            )
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        os.replace(tmp, d)

    def _require_symmetric(self, what: str, assume_symmetric: bool) -> None:
        """Undirected algorithms silently return directed answers when the
        graph was built without reversed edges — raise instead. Callers
        that pre-symmetrized the edge Dataset themselves (e.g. via
        ``graph.symmetrize``) pass ``assume_symmetric=True``."""
        if not (self.symmetric_copy or assume_symmetric):
            raise ValueError(
                f"{what} requires an undirected graph: build the BSPGraph "
                "with symmetric_copy=True, or pass assume_symmetric=True "
                "if the edge Dataset already contains both directions"
            )

    def connected_components(
        self, max_iters: int = 10_000, assume_symmetric: bool = False
    ) -> tuple[ray.data.Dataset, int]:
        """Min-label propagation to fixpoint. Requires symmetric_copy=True
        (or ``assume_symmetric=True`` for pre-symmetrized edge input).
        Labels are the minimum dense vid of each component (exact-match
        semantics, north-rule N4). Returns (labels Dataset, rounds)."""
        self._require_symmetric("connected_components()", assume_symmetric)
        rounds = 0
        while rounds < max_iters:
            rounds += 1
            emits = self._emit("emit_min_label")
            changed = sum(
                ray.get(
                    [
                        a.apply_min_label.remote(self._incoming_for(emits, t))
                        for t, a in enumerate(self.actors)
                    ]
                )
            )
            if changed == 0:
                break
        return self.state_dataset("label"), rounds

    def bfs(
        self,
        source_vid,
        max_iters: int = 10_000,
        assume_symmetric: bool = False,
    ) -> tuple[ray.data.Dataset, int]:
        """BFS hop distances from one source vid or an array of them
        (multi-source: dist = hops to the NEAREST source — the landmark /
        seed-set distance primitive); min-plus label propagation to
        fixpoint on the same static combine structure as CC — each round
        is two actor waves, O(E/P + distinct-dst/P) per shard, no driver
        vertex state. Requires symmetric_copy=True for undirected
        semantics. Returns (Dataset (vid, label=dist; unreached carry the
        sentinel n), rounds). ``rounds - 1`` is the eccentricity of the
        source set within its components (the last round confirms the
        fixpoint).

        NOTE: distances live in the shared per-vertex ``label`` state (the
        same array CC / LPA use and checkpoints restore) — run BFS on its
        own BSPGraph, or expect a subsequent CC/LPA on this instance to
        start from distances instead of identity labels."""
        self._require_symmetric("bfs()", assume_symmetric)
        srcs = np.atleast_1d(np.asarray(source_vid, dtype=np.int64))
        if srcs.size == 0 or not ((srcs >= 0) & (srcs < self.n)).all():
            # a negative vid would silently mark shard P-1's LAST owned
            # vertex as the source (python modulo/fancy-index semantics)
            raise ValueError(f"source vids {srcs} out of range [0, {self.n})")
        ray.get([a.bfs_begin.remote(srcs) for a in self.actors])
        rounds = 0
        while rounds < max_iters:
            rounds += 1
            emits = self._emit("emit_min_label")
            changed = sum(
                ray.get(
                    [
                        a.apply_min_dist.remote(self._incoming_for(emits, t))
                        for t, a in enumerate(self.actors)
                    ]
                )
            )
            if changed == 0:
                break
        return self.state_dataset("label"), rounds

    def sssp(
        self,
        source_vid: int,
        wmod: int = 9,
        max_iters: int = 10_000,
        assume_symmetric: bool = False,
    ) -> tuple[ray.data.Dataset, int]:
        """Single-source WEIGHTED shortest paths (distributed Bellman-Ford:
        min-plus propagation to fixpoint on the same static combine
        structure as CC/BFS — two actor waves per round, no driver vertex
        state). Edge weights are the deterministic symmetric in-shard
        derivation documented on ``ShardActor.sssp_begin`` (integer
        1..wmod), so distances are exact integers and SQL-oracle-checkable.
        Requires symmetric_copy=True. Returns (Dataset (vid, label=dist;
        unreached carry SSSP_SENTINEL), rounds) — the last round confirms
        the fixpoint. Same shared ``label`` state caveat as bfs()."""
        self._require_symmetric("sssp()", assume_symmetric)
        if not (0 <= source_vid < self.n):
            raise ValueError(f"source_vid {source_vid} out of range [0, {self.n})")
        if wmod <= 0:
            raise ValueError(f"wmod must be > 0: {wmod}")
        ray.get([a.sssp_begin.remote(source_vid, wmod) for a in self.actors])
        rounds = 0
        while rounds < max_iters:
            rounds += 1
            emits = self._emit("emit_min_plus")
            changed = sum(
                ray.get(
                    [
                        a.apply_min_label.remote(self._incoming_for(emits, t))
                        for t, a in enumerate(self.actors)
                    ]
                )
            )
            if changed == 0:
                break
        return self.state_dataset("label"), rounds

    def kcore(
        self, k: int, max_rounds: int = 10_000, assume_symmetric: bool = False
    ) -> tuple[ray.data.Dataset, int]:
        """Distributed k-core peeling on the shard actors: a round is two
        actor waves (kill + decrement-exchange) over the static combine
        topology — no per-round edge rewrite, no O(V) driver state; round
        cost is independent of rounds-so-far. Requires symmetric_copy=True
        over a distinct self-loop-free edge set. ``rounds`` counts every
        peel pass including the final no-death one (stable input → 1),
        matching ``engine.kcore.kcore``. Returns (alive-vids Dataset,
        rounds)."""
        self._require_symmetric("kcore()", assume_symmetric)
        ray.get([a.kcore_begin.remote(k) for a in self.actors])
        rounds = 0
        while rounds < max_rounds:
            rounds += 1
            res = ray.get([a.kcore_emit.remote() for a in self.actors])
            emits = [r[0] for r in res]
            if sum(r[1] for r in res) == 0:
                break
            ray.get(
                [
                    a.kcore_apply.remote(self._incoming_for(emits, t))
                    for t, a in enumerate(self.actors)
                ]
            )
        return (
            ray.data.from_arrow_refs(
                [a.kcore_alive_vids.remote() for a in self.actors]
            ),
            rounds,
        )

    def label_propagation(
        self, iterations: int = 5, assume_symmetric: bool = False
    ) -> ray.data.Dataset:
        """Synchronous LPA (north-rule N5) on the shard actors: per-shard
        (dst, label)-count combine → exchange → per-vertex mode with
        smallest-label tie-break. The graph must be ingested as the DEDUPED
        symmetrized edge set (``graph.symmetrize``) — LPA counts are
        multiplicity-sensitive, unlike the idempotent CC min. Callers
        that pre-symmetrized pass ``assume_symmetric=True``; building
        with ``symmetric_copy=True`` over a deduped single-direction
        edge set is equally valid (each neighbor counted once per
        direction)."""
        self._require_symmetric("label_propagation()", assume_symmetric)
        if self.n * (self.n + 1) >= 2**62:
            raise ValueError("packed (dst,label) key overflow guard")
        for _ in range(iterations):
            emits = self._emit("emit_label_counts")
            ray.get(
                [
                    a.apply_mode_label.remote(self._incoming_for(emits, t))
                    for t, a in enumerate(self.actors)
                ]
            )
        return self.state_dataset("label")

    def state_dataset(self, what: str = "rank") -> ray.data.Dataset:
        # from_arrow_refs, not ray.get + from_arrow: the shard tables stay
        # in the object store (no O(V) driver heap copy); the refs are
        # driver-owned task returns, so they outlive actor shutdown
        return ray.data.from_arrow_refs(
            [a.get_state.remote(what) for a in self.actors]
        )

    def shutdown(self) -> None:
        """Kill the shard actors and release their CSR memory (actors hold
        their shards for the graph's lifetime otherwise)."""
        for a in self.actors:
            ray.kill(a)
        self.actors = []


def bsp_pagerank_dataset(
    edges: ray.data.Dataset,
    iterations: int | None = None,
    eps: float | None = None,
    num_shards: int = 8,
    d: float = DAMPING,
    checkpoint_dir: str | None = None,
) -> tuple[ray.data.Dataset, int, list[dict]]:
    """Fully Dataset-native PageRank — NO O(V) driver state anywhere:
    the vertex dictionary is distributed (``graph.vertices_dataset``),
    encoding goes through the hash-sharded dictionary-actor service
    (``graph.encode_edges_service``, O(V/P) per actor), vertex state
    lives on the BSP shards, and the result maps back to original ids with
    one decode join. This is the 10^12-file path promised by the north
    rule. Returns ((id, rank) Dataset, iterations, metrics)."""
    from . import graph as G

    verts, n = G.vertices_dataset(edges)
    enc, _ = G.encode_edges_service(edges, vertices=verts)
    g = BSPGraph(enc, n=n, num_shards=num_shards)
    state, iters, metrics = g.pagerank(
        iterations=iterations, eps=eps, d=d, checkpoint_dir=checkpoint_dir
    )
    decoded = G.decode_vids(state, verts).select_columns(["id", "rank"])
    return decoded, iters, metrics


def bsp_pagerank(
    edges: ray.data.Dataset,
    iterations: int | None = None,
    eps: float | None = None,
    num_shards: int = 8,
    d: float = DAMPING,
    checkpoint_dir: str | None = None,
    dictionary: str = "auto",
    freeze_delta: float | None = None,
):
    """End-to-end PageRank on the shard-actor engine over original-id edges.

    Returns a ``PageRankResult`` (same shape as ``engine.pagerank``): ranks
    aligned to the sorted original-id dictionary. (This convenience wrapper
    collects the O(V) result driver-side; use ``bsp_pagerank_dataset`` to
    stay distributed end to end.) ``dictionary``: see ``_PreparedGraph``.
    """
    from . import graph as G
    from .pagerank import PageRankResult

    if dictionary == "auto":
        if edges.count() >= G.join_dict_edge_threshold():
            # numeric ids → hash-sharded service; string ids → Dataset join
            dictionary = "service" if G.ids_are_numeric(edges) else "join"
        else:
            dictionary = "broadcast"
    if dictionary in ("join", "service"):
        verts, n = G.vertices_dataset(edges)
        encode = (
            G.encode_edges_join if dictionary == "join" else G.encode_edges_service
        )
        enc, _ = encode(edges, vertices=verts)
        ids = np.asarray(verts.sort("vid").to_pandas()["id"])
    else:
        ids = G.vertex_ids(edges)
        enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=num_shards)
    ds, iters, metrics = g.pagerank(
        iterations=iterations, eps=eps, d=d, checkpoint_dir=checkpoint_dir,
        freeze_delta=freeze_delta,
    )
    rank = np.empty(len(ids))
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        rank[vid] = b.column("rank").to_numpy(zero_copy_only=False)
    return PageRankResult(ids=ids, ranks=rank, iterations=iters, metrics=metrics)


def bsp_label_propagation(
    edges: ray.data.Dataset, iterations: int = 5, num_shards: int = 8
) -> dict:
    """LPA on the shard-actor engine over original-id edges; must equal
    ``engine.labelprop.label_propagation`` exactly (same synchronous
    mode/tie-break semantics). Returns dict id -> community label id."""
    from . import graph as G

    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    sym = G.symmetrize(enc)  # deduped simple graph, both directions
    g = BSPGraph(sym, n=len(ids), num_shards=num_shards)
    ds = g.label_propagation(iterations=iterations, assume_symmetric=True)
    vid_all, lbl_all = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid_all.append(b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64))
        lbl_all.append(b.column("label").to_numpy(zero_copy_only=False).astype(np.int64))
    vid = np.concatenate(vid_all) if vid_all else np.empty(0, np.int64)
    lbl = np.concatenate(lbl_all) if lbl_all else np.empty(0, np.int64)
    return dict(zip(ids[vid].tolist(), ids[lbl].tolist()))


def bsp_connected_components_dataset(
    edges: ray.data.Dataset, num_shards: int = 8
) -> tuple[ray.data.Dataset, int]:
    """Undirected connected components on the shard-actor engine, fully
    Dataset-native: join vertex dictionary in, decode labels out — no O(V)
    driver arrays. Returns ((id, label_id) Dataset, rounds)."""
    from . import graph as G

    if edges.count() == 0:
        # the encode/join machinery (and Ray 2.49's hash shuffle) crashes
        # on fully-empty inputs — short-circuit to an empty typed result
        empty = pa.schema([("id", pa.int64()), ("label_id", pa.int64())])
        return ray.data.from_arrow(empty.empty_table()), 0
    verts, n = G.vertices_dataset(edges)
    enc, _ = G.encode_edges_service(edges, vertices=verts)
    g = BSPGraph(enc, n=n, num_shards=num_shards, symmetric_copy=True)
    state, rounds = g.connected_components()
    # join on vid: uniform key. Materialized: both the roots scan below
    # and the returned map_batches consume it — lazy, the hash join would
    # re-execute from lineage on the second consumption
    withid = G.decode_vids(state, verts).materialize()
    # label decode: a join keyed on `label` would be skewed (few distinct
    # labels, one per component) AND trips Ray 2.49's empty-partition join
    # crash on small inputs. Instead: the component roots are exactly the
    # rows with vid == label, one per component — a SMALL table, broadcast
    # as a sorted lookup (degenerate worst case: all-singleton components
    # makes it O(V), the same bound as the broadcast dictionary).
    import pyarrow.compute as pc

    roots = withid.map_batches(
        lambda t: t.filter(
            pc.equal(t.column("vid"), pc.cast(t.column("label"), pa.uint64()))
        ),
        batch_format="pyarrow",
    )
    root_lbl, root_id = [], []
    for b in roots.select_columns(["label", "id"]).iter_batches(
        batch_format="pyarrow"
    ):
        root_lbl.append(b.column("label").to_numpy(zero_copy_only=False))
        root_id.append(np.asarray(b.column("id").to_pylist()))
    if not root_lbl:  # empty edge input: no components, empty result
        empty = pa.schema([("id", pa.int64()), ("label_id", pa.int64())])
        return ray.data.from_arrow(empty.empty_table()), rounds
    lbl_arr = np.concatenate(root_lbl)
    id_arr = np.concatenate(root_id)
    order = np.argsort(lbl_arr)
    lookup_ref = ray.put((lbl_arr[order], id_arr[order]))

    def add_label_id(t: pa.Table) -> pa.Table:
        lbls, ids_ = ray.get(lookup_ref)
        lv = t.column("label").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(lbls, lv)
        return pa.table(
            {"id": t.column("id"), "label_id": pa.array(ids_[pos])}
        )

    decoded = withid.map_batches(add_label_id, batch_format="pyarrow")
    return decoded, rounds


def bsp_connected_components(
    edges: ray.data.Dataset, num_shards: int = 8
) -> tuple[dict, int]:
    """Undirected connected components; label = smallest original id in the
    component (exact-match semantics, north-rule N4).

    Returns (dict original_id -> original_id label, rounds). Convenience
    wrapper (collects O(V) driver-side, vectorized); pipelines should use
    ``bsp_connected_components_dataset``."""
    from . import graph as G

    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=num_shards, symmetric_copy=True)
    ds, _rounds = g.connected_components()
    vid_all, lbl_all = [], []
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid_all.append(b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64))
        lbl_all.append(b.column("label").to_numpy(zero_copy_only=False).astype(np.int64))
    vid = np.concatenate(vid_all) if vid_all else np.empty(0, np.int64)
    lbl = np.concatenate(lbl_all) if lbl_all else np.empty(0, np.int64)
    return dict(zip(ids[vid].tolist(), ids[lbl].tolist())), _rounds
