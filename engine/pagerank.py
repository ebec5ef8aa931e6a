"""Distributed power-iteration PageRank — the north-star dataflow.

Per superstep (the analog of the reference's fixpoint loop,
ref: src/Graph.cpp:118-173 / the OpenCL ``calcranks`` kernel
src/god-kernel.cl:26-56):

  1. ``sink_sum = ((1-d) + d * Σ_{outdeg=0} rank) / N`` — global scalar
     (ref: src/Graph.cpp:135-140; teleport term folded in).
  2. contribution push: ``map_batches`` over the **static, materialized,
     dst-sorted adjacency blocks** emits per-batch pre-combined
     ``(dst, mass=Σ rank[src]/outdeg[src])`` partials. The previous-round
     rank vector is a dense float64 array broadcast once per superstep via
     ``ray.put`` and read zero-copy inside each task.
  3. shuffle: ``groupby("dst").aggregate(Sum("mass"))`` over the partials
     (≤ num_blocks rows per key thanks to the per-batch combiner); optional
     two-phase salted aggregation for heavy-hitter vertices (north-rule N9).
  4. apply + convergence: ``new = sink_sum + d * mass`` (vertices with no
     in-links receive exactly ``sink_sum``), L1 residual ``Σ|new-old|``
     (north-rule 1e-6 criterion).

Vertex state here is the broadcast dense array (8 B/vertex — one
object-store copy per node, viable to ~1e9 vertices); the fully partitioned
vertex state lives in ``engine.bsp`` for beyond that. Per-vertex scores
match the sequential reference to allclose 1e-6 at the same iteration count
(SURVEY.md §5.2, §7.6: freezing deviation ≤ iters·1e-16).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from . import graph as G

DAMPING = 0.85


def _sort_block_by_dst(batch: pa.Table) -> pa.Table:
    """Build-time block prep: sort by dst so the per-superstep combiner is a
    boundary scan + ``np.add.reduceat`` instead of a per-round sort."""
    order = np.argsort(batch.column("dst").to_numpy(zero_copy_only=False), kind="stable")
    return batch.take(pa.array(order))


def _attach_inv_and_sort(enc, inv_ref, global_sort: bool):
    """Adjacency build: attach 1/outdeg[src] and sort by dst.

    ``global_sort=True`` range-partitions by dst (one Ray sort, once per
    build): each block then holds a contiguous dst range, so per-superstep
    combined partials total ≈ V rows instead of ≈ E — a much smaller
    shuffle. Falls back to per-block sorting when disabled."""

    def attach_inv(batch: pa.Table) -> pa.Table:
        iv = ray.get(inv_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False)
        return batch.append_column("inv_outdeg", pa.array(iv[src]))

    ds = enc.map_batches(attach_inv, batch_format="pyarrow")
    if global_sort:
        return ds.sort("dst")
    # batch_size=None: sort WHOLE blocks — the default 1024-row batches
    # would leave each output block a concatenation of independently
    # sorted runs, breaking the combiner's one-partial-per-dst-per-block
    # bound (correct either way, but the combine stops combining)
    return ds.map_batches(
        _sort_block_by_dst, batch_format="pyarrow", batch_size=None
    )


@dataclass
class PageRankResult:
    ids: np.ndarray          # original vertex ids, sorted (dictionary order)
    ranks: np.ndarray        # float64, aligned with ids
    iterations: int
    metrics: list[dict] = field(default_factory=list)

    def as_table(self) -> pa.Table:
        return pa.table({"id": pa.array(self.ids), "rank": pa.array(self.ranks)})

    def as_dict(self) -> dict:
        return dict(zip(self.ids.tolist(), self.ranks.tolist()))

    def top_k(self, k: int = 10, ascending: bool = False) -> pa.Table:
        """R12/R13: global order by rank, top-k (desc) / bottom-k (asc)."""
        order = np.argsort(self.ranks, kind="stable")
        if not ascending:
            order = order[::-1]
        sel = order[:k]
        return pa.table(
            {"id": pa.array(self.ids[sel]), "rank": pa.array(self.ranks[sel])}
        )


class _PreparedGraph:
    """Build product: dictionary, dense degrees, sinks, materialized
    dst-sorted adjacency with per-edge 1/outdeg[src].

    ``dictionary="service"`` encodes via the hash-sharded dictionary
    actors (``encode_edges_service``); ``"join"`` is the pure-Dataset-API
    hash-join equivalent (~100× slower per row in Ray 2.49); "auto"
    switches from "broadcast" to "service" above ``GRAFT_JOIN_DICT_EDGES``
    edges (default 5e8). Note the dataset engine still broadcasts the
    dense rank vector (O(V) per node) — its hard ceiling; past that use
    ``engine.bsp``, which keeps every O(V)/O(E) structure sharded."""

    def __init__(
        self,
        edges: ray.data.Dataset,
        num_blocks: int | None = None,
        global_sort: bool = True,
        dictionary: str = "auto",
    ):
        if dictionary == "auto":
            # count() executes the (lazy) input; materialize first so the
            # threshold probe + vertex/encode passes share one execution
            edges = edges.materialize()
            if edges.count() >= G.join_dict_edge_threshold():
                # the hash-sharded service routes by numeric-id hash; string
                # ids must fall back to the pure-Dataset hash join
                dictionary = "service" if G.ids_are_numeric(edges) else "join"
            else:
                dictionary = "broadcast"
        if dictionary in ("join", "service"):
            verts, _n = G.vertices_dataset(edges)
            if _n == 0:
                raise ValueError("pagerank: empty edge input (0 vertices)")
            encode = (
                G.encode_edges_join
                if dictionary == "join"
                else G.encode_edges_service
            )
            enc, _ = encode(edges, vertices=verts)
            # result mapping still needs the sorted original ids driver-side
            # (the engine broadcasts the dense rank vector anyway)
            self.ids = np.asarray(verts.sort("vid").to_pandas()["id"])
            self.n = len(self.ids)
        else:
            self.ids = G.vertex_ids(edges)
            self.n = len(self.ids)
            if self.n == 0:
                raise ValueError("pagerank: empty edge input (0 vertices)")
            enc = G.encode_edges(edges, self.ids)
        if num_blocks:
            enc = enc.repartition(num_blocks)
        # materialize: dense_out_degrees AND the adjacency build both
        # consume enc — lazy, the whole encode would execute twice
        enc = enc.materialize()
        self.outdeg = G.dense_out_degrees(enc, self.n)
        self.sinks = G.sink_vids(self.outdeg)
        inv = np.zeros(self.n)
        nz = self.outdeg > 0
        inv[nz] = 1.0 / self.outdeg[nz]
        inv_ref = ray.put(inv)
        self.global_sort = global_sort
        self.adj = _attach_inv_and_sort(enc, inv_ref, global_sort).materialize()
        self.num_edges = self.adj.count()


def _combine_block(batch: pa.Table, rank: np.ndarray):
    """Per-block combine: (dst, mass=Σ rank[src]/outdeg[src]) with dst
    unique within the block (dst is block-sorted → boundary scan)."""
    src = batch.column("src").to_numpy(zero_copy_only=False)
    dst = batch.column("dst").to_numpy(zero_copy_only=False)
    inv = batch.column("inv_outdeg").to_numpy(zero_copy_only=False)
    mass = rank[src] * inv
    if len(dst) == 0:
        return src, dst, mass
    bounds = np.flatnonzero(np.diff(dst)) + 1
    starts = np.concatenate(([0], bounds))
    return src, dst[starts], np.add.reduceat(mass, starts)


def _make_segment_fn(rank_ref):
    """Contribution task for the DISTRIBUTED apply: each (globally
    dst-sorted) adjacency block combines its masses and emits ONE row — a
    dense float64 mass segment covering the block's contiguous dst range.
    The per-vertex scatter-add happens here, inside the task; the driver
    only merges O(num_blocks) segments with vectorized `+=` (segments
    overlap by at most one dst at block boundaries, and carrying raw mass
    means overlaps simply accumulate)."""

    schema = pa.schema(
        [("lo", pa.int64()), ("seg", pa.large_list(pa.float64()))]
    )

    def contrib_seg(batch: pa.Table) -> pa.Table:
        rank = ray.get(rank_ref)
        _src, out_dst, out_mass = _combine_block(batch, rank)
        if len(out_dst) == 0:
            return pa.table(
                {"lo": pa.array([], type=pa.int64()),
                 "seg": pa.array([], type=pa.large_list(pa.float64()))},
                schema=schema,
            )
        lo = int(out_dst[0])
        seg = np.zeros(int(out_dst[-1]) - lo + 1)
        seg[out_dst.astype(np.int64) - lo] = out_mass
        return pa.table(
            {"lo": pa.array([lo], type=pa.int64()),
             "seg": pa.array([seg], type=pa.large_list(pa.float64()))},
            schema=schema,
        )

    return contrib_seg


@ray.remote(num_returns=3)
def _apply_segments(
    old_rank: np.ndarray,
    frozen: np.ndarray | None,
    sinks: np.ndarray,
    teleport: np.ndarray | None,
    n: int,
    coef: float,
    d: float,
    freeze_delta: float | None,
    seg_refs: list,
):
    """The distributed APPLY step, off the driver: merge the per-block
    dense mass segments into the new rank vector and return it as this
    task's own object-store return value. The driver passes the previous
    rank/frozen ObjectRefs as top-level args (resolved zero-copy here),
    keeps only the returned refs, and ``ray.get``s the small stats dict —
    it never holds, ships, or iterates an O(V) array per superstep.

    Merge order is block order (``seg_refs`` come from
    ``Dataset.to_arrow_refs``), identical to the former driver-side
    ``iter_batches`` merge — results are bit-identical."""
    sink_sum = coef / n
    base = np.full(n, sink_sum) if teleport is None else coef * teleport
    # accumulate RAW segment mass, then apply damping ONCE on the in-link
    # total (new = base + d*acc) — per-segment d*seg would give a vertex
    # straddling a block boundary d*a + d*b instead of d*(a+b), the exact
    # ulp class the repo's 'multiply damping once' rule (and the SQL
    # oracle's operation order) forbids
    acc = np.zeros(n)
    for b in ray.get(list(seg_refs)):
        if b.num_rows == 0 or "lo" not in b.schema.names:
            continue  # the global sort emits empty (schemaless) blocks
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
    new = base + d * acc
    if freeze_delta is None:
        l1 = float(np.abs(new - old_rank).sum())
        rank, new_frozen, n_active = new, None, n
    else:
        active = ~frozen
        diff = np.abs(new - old_rank)
        rank = np.where(active, new, old_rank)
        new_frozen = frozen | (active & (diff < freeze_delta))
        l1 = float(diff[active].sum())
        n_active = int((~new_frozen).sum())
    stats = {
        "l1": l1,
        "dangling": float(rank[sinks].sum()),
        "num_active": n_active,
    }
    return rank, new_frozen, stats


def _make_contrib_fn(rank_ref, heavy_ref=None, num_salts: int = 8):
    """Stateless contribution task (row output — the salted / full-shuffle
    paths). ``ray.get(rank_ref)`` is a zero-copy plasma read per task
    (O(1), shared per node) — cheaper than spinning a fresh actor pool
    every superstep."""

    def contrib(batch: pa.Table) -> pa.Table:
        rank = ray.get(rank_ref)
        src, out_dst, out_mass = _combine_block(batch, rank)
        cols = {
            "dst": pa.array(out_dst.astype(np.uint64), type=pa.uint64()),
            "mass": pa.array(out_mass),
        }
        if heavy_ref is not None:
            heavy = ray.get(heavy_ref)
            # salt heavy-hitter keys so no single reducer key explodes
            salt = np.zeros(len(out_dst), dtype=np.int32)
            hmask = np.isin(out_dst, heavy)
            if hmask.any() and len(src):
                # deterministic per-(batch, heavy-key) salt: mix the key with
                # a batch fingerprint so partials for the same heavy dst
                # spread across sub-keys regardless of batch count/ordering
                fp = np.uint64(
                    (int(src[0]) * 0x9E3779B97F4A7C15 + len(src))
                    & 0xFFFFFFFFFFFFFFFF
                )
                mixed = (
                    out_dst[hmask].astype(np.uint64)
                    * np.uint64(0xBF58476D1CE4E5B9)
                    + fp
                )
                salt[hmask] = (mixed % np.uint64(num_salts)).astype(np.int32)
            cols["salt"] = pa.array(salt)
        return pa.table(cols)

    return contrib


def pagerank(
    edges: ray.data.Dataset,
    iterations: int | None = None,
    eps: float | None = None,
    d: float = DAMPING,
    num_blocks: int | None = None,
    salted: bool = False,
    heavy_indeg_threshold: int = 1 << 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    prepared: "_PreparedGraph | None" = None,
    shuffle_aggregate: bool = False,
    teleport: np.ndarray | None = None,
    freeze_delta: float | None = None,
) -> PageRankResult:
    """Run PageRank over an edge Dataset (original ids, any dtype).

    Stop when ``iterations`` supersteps have run, or when the L1 residual
    drops below ``eps`` (whichever is given; both → first hit). At least
    one of the two must be set — unless ``freeze_delta`` is given.

    ``freeze_delta``: REFERENCE-EXACT stop rule (ref: src/Graph.cpp:160-169
    via the rank_new = 0.0 sentinel): a vertex whose update moves less than
    ``freeze_delta`` commits that value and FREEZES — it stops updating but
    keeps contributing its committed rank — and the run stops when every
    vertex is frozen, with the final all-frozen sweep counted
    (src/Graph.cpp:133). ``freeze_delta=1e-16`` reproduces the reference's
    iteration counts exactly (FIXTURES.md goldens 25/29/44). Not
    combinable with checkpointing (the frozen mask is not persisted).

    ``teleport``: optional dense personalization vector t (length n,
    Σt = 1) — PERSONALIZED PageRank: random jumps and dangling mass
    restart from t instead of uniformly, i.e.
    ``rank_k(v) = ((1-d) + d·Σ_sink rank_{k-1}) · t(v) + d·Σ_in ...``;
    ``rank_0 = t``. ``teleport=None`` is classic PageRank (t uniform).

    ``shuffle_aggregate=False`` skips the per-superstep
    ``groupby("dst")`` (valid because the dense apply merges the few
    block-boundary duplicate partials); keep it True to exercise the full
    shuffle path or when the result must stay distributed.
    """
    if iterations is None and eps is None and freeze_delta is None:
        raise ValueError("set iterations, eps and/or freeze_delta")
    if freeze_delta is not None and checkpoint_dir is not None:
        raise ValueError("freeze_delta is not combinable with checkpointing")
    from . import checkpoint as ckpt

    g = prepared or _PreparedGraph(edges, num_blocks=num_blocks)
    n = g.n
    if teleport is not None:
        teleport = np.asarray(teleport, dtype=np.float64)
        if len(teleport) != n:
            raise ValueError(f"teleport length {len(teleport)} != n {n}")
        if np.any(teleport < 0):
            raise ValueError("teleport vector has negative entries")
        if not math.isclose(float(teleport.sum()), 1.0, rel_tol=1e-9, abs_tol=1e-12):
            raise ValueError(
                f"teleport vector must sum to 1 (got {teleport.sum()!r})"
            )
    rank = np.full(n, 1.0 / n) if teleport is None else teleport.copy()

    heavy_ref = None
    if salted:
        # pure function of the materialized adjacency — cache on the
        # prepared graph so repeated salted runs don't re-pull every dst
        cached = getattr(g, "_heavy_cache", None)
        if cached is not None and cached[0] == heavy_indeg_threshold:
            heavy_ref = cached[1]
        else:
            indeg = np.zeros(n, dtype=np.int64)
            for b in g.adj.select_columns(["dst"]).iter_batches(
                batch_format="pyarrow", batch_size=1 << 20
            ):
                np.add.at(indeg, b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64), 1)
            heavy = np.flatnonzero(indeg >= heavy_indeg_threshold).astype(np.uint64)
            heavy_ref = ray.put(heavy)
            g._heavy_cache = (heavy_indeg_threshold, heavy_ref)

    start_iter = 0
    if checkpoint_dir:
        resumed = ckpt.load_latest(checkpoint_dir)
        if resumed is not None:
            start_iter, saved = resumed
            if len(saved["rank"]) != n:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} holds "
                    f"{len(saved['rank'])} vertices, graph has {n} — "
                    "refusing to resume across different graphs"
                )
            rank[saved["vid"]] = saved["rank"]

    metrics: list[dict] = []
    frozen = (
        np.zeros(n, dtype=bool) if freeze_delta is not None else None
    )
    it = start_iter
    # DISTRIBUTED apply (the default path): each dst-sorted block
    # scatter-adds its combined masses into a dense segment inside its
    # map task; ONE _apply_segments task merges the O(num_blocks)
    # segments and returns the new rank vector as its own object-store
    # return. The driver chains ObjectRefs and reads back a small stats
    # dict — per superstep it neither re-``ray.put``s the O(V) rank
    # vector nor pulls O(V) segments (its former two O(V) roles); O(V)
    # touches the driver only at checkpoints and the final result.
    distributed_apply = not salted and not shuffle_aggregate and g.global_sort
    if distributed_apply:
        sinks_ref = ray.put(g.sinks)
        teleport_ref = ray.put(teleport) if teleport is not None else None
        rank_ref = ray.put(rank)
        frozen_ref = ray.put(frozen) if frozen is not None else None
        sink_rank_sum = float(rank[g.sinks].sum())
        active_total = n
    while True:
        if iterations is not None and it >= iterations:
            break
        it += 1
        if frozen is not None:
            all_frozen = (
                active_total == 0 if distributed_apply else bool(frozen.all())
            )
            if all_frozen:
                # the final all-frozen sweep IS counted (ref: src/Graph.cpp:133)
                break
        t0 = time.perf_counter()
        if distributed_apply:
            # restart coefficient: (1-d) jump mass + d × dangling mass,
            # spread over the teleport distribution (uniform 1/n classic)
            coef = (1.0 - d) + d * sink_rank_sum
            seg_refs = g.adj.map_batches(
                _make_segment_fn(rank_ref),
                batch_format="pyarrow",
                batch_size=None,  # one segment per block, not per 1024 rows
                zero_copy_batch=True,
            ).to_arrow_refs()
            # √B-fan-in pre-merge above the block threshold (engine.hits):
            # level 1 pre-scales each segment by d, so the apply runs with
            # d=1 on the pre-damped partials; at or below the threshold
            # the refs pass through untouched and the apply stays
            # bit-identical to the validated single-merge order. The tree
            # regroups the ASSOCIATION of float adds for vertices whose
            # range straddles a level-1 group boundary (ulp-class), so the
            # reference-exact freeze mode — whose 1e-16 per-vertex
            # comparisons must match the strict left-fold that reproduces
            # the golden iteration counts — always takes the single-merge
            # path.
            from .hits import tree_merge_segment_refs

            merged_refs = (
                seg_refs
                if freeze_delta is not None
                else tree_merge_segment_refs(seg_refs, d=d)
            )
            d_apply = d if merged_refs is seg_refs else 1.0
            rank_ref, frozen_ref, stats_ref = _apply_segments.remote(
                rank_ref, frozen_ref, sinks_ref, teleport_ref,
                n, coef, d_apply, freeze_delta, merged_refs,
            )
            stats = ray.get(stats_ref)
            l1 = stats["l1"]
            sink_rank_sum = stats["dangling"]
            active_total = stats["num_active"]
        else:
            coef = (1.0 - d) + d * rank[g.sinks].sum()
            sink_sum = coef / n
            rank_ref = ray.put(rank)
            base = np.full(n, sink_sum) if teleport is None else coef * teleport
            # raw in-link mass accumulated here; damping applied ONCE on
            # the total below (repo rule / SQL-oracle operation order)
            acc = np.zeros(n)
            contrib = _make_contrib_fn(rank_ref, heavy_ref)
            partials = g.adj.map_batches(
                contrib, batch_format="pyarrow", batch_size=None
            )
            if salted:
                phase1 = partials.groupby(["dst", "salt"]).aggregate(
                    Sum("mass", alias_name="mass")
                )
                masses = phase1.groupby("dst").aggregate(
                    Sum("mass", alias_name="mass")
                )
            elif shuffle_aggregate:
                masses = partials.groupby("dst").aggregate(
                    Sum("mass", alias_name="mass")
                )
            else:
                # per-block-sorted (global_sort=False) fallback: partials
                # are per-dst-unique within a block; the dense scatter-add
                # below merges cross-block duplicates
                masses = partials
            for b in masses.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
                dv = b.column("dst").to_numpy(zero_copy_only=False)
                mv = b.column("mass").to_numpy(zero_copy_only=False)
                if len(dv) == 0:
                    continue
                # partials for the same dst can meet inside one batch when
                # a sorted block is split mid-key, so plain fancy-index +=
                # (last write wins) would drop rank mass; for sorted
                # batches combine duplicates with one reduceat, else fall
                # back to the exact scatter-add
                diffs = np.diff(dv.astype(np.int64))
                if np.all(diffs > 0):
                    acc[dv] += mv
                elif np.all(diffs >= 0):
                    starts = np.concatenate(([0], np.flatnonzero(diffs) + 1))
                    acc[dv[starts]] += np.add.reduceat(mv, starts)
                else:
                    np.add.at(acc, dv, mv)
            new = base + d * acc
            if frozen is None:
                l1 = float(np.abs(new - rank).sum())
                rank = new
            else:
                # ref semantics: active vertices commit the new value,
                # then freeze when the move was < delta; frozen vertices
                # keep their committed rank (they still contributed to
                # `new` above via `rank`, which holds committed values)
                active = ~frozen
                diff = np.abs(new - rank)
                rank = np.where(active, new, rank)
                frozen |= active & (diff < freeze_delta)
                l1 = float(diff[active].sum())
            sink_rank_sum = float(rank[g.sinks].sum())
            active_total = int((~frozen).sum()) if frozen is not None else n
        dt = time.perf_counter() - t0
        metrics.append(
            {
                "iteration": it,
                "wall_sec": dt,
                "edges": g.num_edges,
                "edges_per_sec": g.num_edges / dt if dt > 0 else float("inf"),
                "l1_residual": l1,
                "dangling_mass": sink_rank_sum,
                "num_vertices": n,
                **(
                    {"num_active": active_total}
                    if frozen is not None
                    else {}
                ),
            }
        )
        if checkpoint_dir and it % checkpoint_every == 0:
            if distributed_apply:
                # O(V) pull only when persisting (disk write is O(V) anyway)
                rank = ray.get(rank_ref)
            ckpt.save_iteration(checkpoint_dir, it, rank, metrics[-1])
        if eps is not None and l1 < eps:
            break

    if distributed_apply:
        rank = ray.get(rank_ref)
    return PageRankResult(ids=g.ids, ranks=rank, iterations=it, metrics=metrics)


def ranks_dataset(res: PageRankResult) -> ray.data.Dataset:
    """Result as a Ray Dataset (id, rank) for downstream pipelines."""
    return ray.data.from_arrow(res.as_table())


def agreement(a: PageRankResult, b: PageRankResult, atol: float = 1e-9) -> float:
    """R14 analog — fraction of vertices whose ranks agree within ``atol``,
    compared BY VALUE per original id, never by sort position (the
    reference's positional compare is nondeterministic under ties,
    ref: src/main.cpp:16-33; SURVEY.md §7.6)."""
    da, db = a.as_dict(), b.as_dict()
    if set(da) != set(db):
        return 0.0
    hits = sum(1 for v in da if abs(da[v] - db[v]) <= atol)
    return hits / max(1, len(da))
