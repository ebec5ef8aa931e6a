"""Graph construction: vertex dictionary, dense encoding, degrees, sinks.

Replaces the reference's pointer-graph build (``Graph::read``,
ref: src/Graph.cpp:60-116) with Dataset operations:

- vertex dictionary   (ref: the ``nodes_map`` id compaction, src/Graph.cpp:60-91)
  — deterministic **sort-by-id** dense ids, not first-appearance order
  (order-dependent and unreproducible under parallel reads; SURVEY.md §7.6).
- out-degrees         (ref: ``Node::nlinks_out``, src/Graph.cpp:16-24)
- sink detection      (ref: ``sink_nodes`` scan, src/Graph.cpp:107-115)

Broadcast pattern: the sorted unique-id array and the dense out-degree
array are O(V) driver/worker objects shipped once per build via ``ray.put``
and read zero-copy inside ``map_batches`` tasks. This is the standard
"broadcast dictionary" design and holds to V ≈ 1e8-1e9 on big-memory nodes
(8-16 B/vertex/node); beyond that, the encode step goes through the
hash-sharded dictionary-actor service (``encode_edges_service``, O(V/P)
per actor; same downstream pipeline) or the pure-Dataset-API
``encode_edges_join``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _batch_unique_ids(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: unique ids over src ∪ dst (shrinks the shuffle)."""
    s, d = batch.column("src"), batch.column("dst")
    if s.type != d.type:
        # a reader can infer different integer widths for the two columns;
        # chunked_array refuses mixed types — promote both to int64
        if not (pa.types.is_integer(s.type) and pa.types.is_integer(d.type)):
            raise TypeError(f"src/dst type mismatch: {s.type} vs {d.type}")
        s, d = pc.cast(s, pa.int64()), pc.cast(d, pa.int64())
    both = pa.chunked_array([s, d])
    return pa.table({"id": pc.unique(both.combine_chunks())})


def vertex_ids(edges: ray.data.Dataset) -> np.ndarray:
    """Sorted array of distinct vertex ids (numeric or string).

    Distributed per-batch ``unique`` partials → sort-based distributed
    distinct (``Dataset.unique`` routes through Ray's hash aggregate,
    ~100× slower than its sort at this shape); only the distinct-id set
    reaches the driver, already sorted block by block.
    """
    partials = edges.map_batches(_batch_unique_ids, batch_format="pyarrow")
    refs, _counts = _sorted_distinct_refs(partials, "id")
    if not refs:
        return np.empty(0, dtype=np.int64)
    blocks = [
        t.column("id").to_numpy(zero_copy_only=False) for t in ray.get(refs)
    ]
    return np.concatenate(blocks)  # blocks are range-ordered and deduped


def encode_edges(
    edges: ray.data.Dataset, ids: np.ndarray
) -> ray.data.Dataset:
    """Translate (src, dst) original ids → dense uint64 vids in [0, N).

    vid = position of the original id in the sorted ``ids`` array
    (binary search per batch — vectorized ``np.searchsorted`` against the
    broadcast dictionary; no shuffle).
    """
    ids_ref = ray.put(ids)

    def enc(batch: pa.Table) -> pa.Table:
        d = ray.get(ids_ref)

        def look(col: str) -> np.ndarray:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            if len(d) == 0:
                raise KeyError(f"empty dictionary; cannot encode {col}")
            pos = np.searchsorted(d, v)
            # a partial/stale dictionary must fail loudly instead of
            # silently encoding a clamped (wrong) vid — same contract as
            # _DictShard.lookup
            clipped = np.minimum(pos, len(d) - 1)
            ok = d[clipped] == v
            if not np.all(ok):
                missing = np.asarray(v)[~np.asarray(ok, dtype=bool)][:5]
                raise KeyError(
                    f"{col} ids missing from the dictionary: {missing!r}"
                )
            return pos

        src = look("src")
        dst = look("dst")
        return pa.table(
            {
                "src": pa.array(src.astype(np.uint64), type=pa.uint64()),
                "dst": pa.array(dst.astype(np.uint64), type=pa.uint64()),
            }
        )

    return edges.map_batches(enc, batch_format="pyarrow")


def _sorted_distinct_refs(
    ds: ray.data.Dataset, col: str
) -> tuple[list, list]:
    """Sort-based distributed DISTINCT on one column: global
    range-partitioned sort → per-block ``np.unique`` → cross-boundary
    duplicate runs dropped by comparing against the previous block's last
    value (per-block metadata only, never rows on the driver). Used
    instead of ``groupby().aggregate`` because Ray 2.49's hash aggregate
    is ~100× slower than its sort on this shape (51 s vs 0.2 s for 12.5M
    rows at 32 cpus). Returns (block refs, per-block row counts)."""
    s = ds.sort(col).materialize()
    refs = []
    for rb in s.iter_internal_ref_bundles():
        for blk, meta in rb.blocks:
            if not meta.num_rows:
                continue  # sort emits empty (schemaless) boundary blocks
            refs.append(blk)
    if not refs:
        return [], []

    @ray.remote(num_returns=2)
    def dedup_block(tbl: pa.Table):
        # block arrived sorted: np.unique keeps order and drops dups
        v = np.unique(tbl.column(col).to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(v)}), (v[0], v[-1], len(v))

    pairs = [dedup_block.remote(r) for r in refs]
    metas = ray.get([m for _, m in pairs])

    @ray.remote(num_returns=2)
    def drop_leading(tbl: pa.Table, prev_last):
        v = tbl.column(col).to_numpy(zero_copy_only=False)
        k = int(np.searchsorted(v, prev_last, side="right"))
        return pa.table({col: pa.array(v[k:])}), len(v) - k

    final_refs, counts = [], []
    for i, (tref, _) in enumerate(pairs):
        if i == 0:
            final_refs.append(tref)
            counts.append(metas[0][2])
        else:
            # the nearest previous block's last value bounds every earlier
            # value (blocks are range-partitioned), so one searchsorted
            # drops the whole cross-boundary duplicate run however many
            # blocks it spans
            t2, c2 = drop_leading.remote(tref, metas[i - 1][1])
            final_refs.append(t2)
            counts.append(c2)
    pending = [(i, c) for i, c in enumerate(counts) if not isinstance(c, int)]
    if pending:  # one batched get, not one driver round-trip per block
        for (i, _), v in zip(pending, ray.get([c for _, c in pending])):
            counts[i] = v
    return final_refs, counts


def distinct_count(ds: ray.data.Dataset, col: str) -> int:
    """COUNT(DISTINCT col) via the sort-based distinct — ``Dataset.unique``
    routes through Ray 2.49's hash aggregate (~100× slower than its sort
    at ≥10M rows). Only per-block counts reach the driver, never rows."""
    # normalize block format: _sorted_distinct_refs reads raw block refs,
    # which are pandas for from_pandas-origin Datasets
    arrow = ds.select_columns([col]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    _refs, counts = _sorted_distinct_refs(arrow, col)
    return int(sum(counts))


def vertices_dataset(
    edges: ray.data.Dataset,
) -> tuple[ray.data.Dataset, int]:
    """Distributed vertex dictionary: Dataset (id, vid) with dense uint64
    vids assigned in sorted-id order (same order as ``vertex_ids`` /
    ``encode_edges`` — the deterministic dictionary of SURVEY.md §7.6),
    built WITHOUT collecting the id set on the driver.

    Steps: per-batch unique partials → global range-partitioned
    ``sort("id")`` → per-block dedup (duplicates are adjacent after the
    sort; a run spanning block boundaries is resolved by dropping each
    block's leading values ≤ the previous block's last id — per-block
    metadata only, never rows on the driver) → dense vid = block offset +
    row position via one tiny task per block. Sort-based distinct because
    Ray 2.49's hash aggregate is ~100× slower than its sort on this shape
    (51 s vs 0.2 s for 12.5M partial rows at 32 cpus).

    Returns (vertices Dataset, n). Reference analog: the ``nodes_map``
    compaction, ref: src/Graph.cpp:60-91.
    """
    partials = edges.map_batches(_batch_unique_ids, batch_format="pyarrow")
    final_refs, counts = _sorted_distinct_refs(partials, "id")
    if not final_refs:
        return ray.data.from_arrow(
            pa.table({"id": pa.array([]), "vid": pa.array([], type=pa.uint64())})
        ), 0
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    n = int(offsets[-1])

    @ray.remote
    def add_vid(tbl: pa.Table, off: int) -> pa.Table:
        return pa.table(
            {
                "id": tbl.column("id"),
                "vid": pa.array(
                    np.arange(off, off + len(tbl), dtype=np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    new_refs = [add_vid.remote(r, int(o)) for r, o in zip(final_refs, offsets)]
    return ray.data.from_arrow_refs(new_refs), n


def join_dict_edge_threshold() -> int:
    """Edge count above which graph builds default to the join dictionary
    (``GRAFT_JOIN_DICT_EDGES``, default 5e8 — roughly where the broadcast
    id array stops being a free lunch on 128 GiB nodes)."""
    import os

    return int(os.environ.get("GRAFT_JOIN_DICT_EDGES", 500_000_000))


def ids_are_numeric(edges: ray.data.Dataset) -> bool:
    """True if the edge src/dst columns hold integer ids. The hash-sharded
    dictionary service routes by multiplicative hash of the numeric id
    (``_id_shard``); string-id graphs must take the ``join`` path instead."""
    schema = edges.schema()
    types = dict(zip(schema.names, schema.types))
    return all(
        isinstance(types[c], pa.DataType) and pa.types.is_integer(types[c])
        for c in ("src", "dst")
    )


def join_partitions_for(edges: ray.data.Dataset) -> int:
    """Hash-join partition count: scale with cluster CPUs but stay BELOW
    the CPU count (hash join spawns one aggregator actor per partition;
    more actors than CPUs deadlocks the stage), and never above what the
    data spread can fill — Ray 2.49's hash join crashes on a partition
    that received no rows (schemaless empty table), so tiny inputs must
    stay at few partitions."""
    from .util import default_concurrency

    cap = default_concurrency(reserve=2, cap=1 << 20)
    rows = edges.count()
    # floor of 2: Ray's hash join needs >1 partition; hosts with < 4
    # CPUs should prefer the broadcast/service encode paths
    return max(2, min(cap, rows // 10_000 + 2))


def encode_edges_join(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset | None = None,
    num_partitions: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """Translate (src, dst) original ids → dense uint64 vids via two
    hash-partitioned ``Dataset.join``s against the distributed vertex
    dictionary — the scale path past the broadcast dictionary
    (``encode_edges``), which caps at driver/worker memory (~1e9 ids).

    Output rows equal ``encode_edges(edges, vertex_ids(edges))`` as a
    multiset (same sort-by-id dictionary); order differs (hash join).
    Returns (encoded edges Dataset, n).
    """
    if vertices is None:
        vertices, n = vertices_dataset(edges)
        vmat = vertices.materialize()
    else:
        # materialize BEFORE count: a lazy caller-supplied dictionary
        # plan would otherwise execute twice (count, then the joins)
        vmat = vertices.materialize()
        n = vmat.count()
    # materialize edges too: join_partitions_for counts them and both
    # joins then read them — one execution instead of two
    edges = edges.materialize()
    P = num_partitions or join_partitions_for(edges)

    e1 = edges.join(
        vmat, join_type="inner", num_partitions=P, on=("src",), right_on=("id",)
    )
    e1 = e1.select_columns(["dst", "vid"]).rename_columns({"vid": "src_vid"})
    e2 = e1.join(
        vmat, join_type="inner", num_partitions=P, on=("dst",), right_on=("id",)
    )
    enc = e2.select_columns(["src_vid", "vid"]).rename_columns(
        {"src_vid": "src", "vid": "dst"}
    )
    return enc, n


@ray.remote
class _DictShard:
    """One shard of the distributed vertex dictionary: holds the (id, vid)
    rows whose hashed id lands here as sorted arrays, answers vectorized
    ``searchsorted`` lookups. The shared-mutable-index case where raw
    actors beat the Dataset API (Ray's generic hash join moves every row
    through a full shuffle; this ships only per-batch unique ids)."""

    def __init__(self):
        self._ids: list = []
        self._vids: list = []

    def ingest(self, ids: np.ndarray, vids: np.ndarray) -> int:
        self._ids.append(ids)
        self._vids.append(vids)
        return len(ids)

    def finalize(self) -> int:
        ids = np.concatenate(self._ids) if self._ids else np.empty(0, np.uint64)
        vids = (
            np.concatenate(self._vids) if self._vids else np.empty(0, np.uint64)
        )
        self._ids = self._vids = None
        o = np.argsort(ids, kind="stable")
        self.ids, self.vids = ids[o], vids[o]
        return len(ids)

    def lookup(self, q: np.ndarray) -> np.ndarray:
        """Vectorized id → vid. Raises ``KeyError`` on any id absent from
        the dictionary: ``encode_edges_service`` accepts a caller-supplied
        ``vertices`` dataset, and a partial dictionary must fail loudly
        instead of silently encoding a clamped (wrong) vid."""
        if len(q) == 0:
            return np.empty(0, np.uint64)
        if len(self.ids) == 0:
            raise KeyError(
                f"{len(q)} ids not in vertex dictionary (empty shard); "
                f"first missing id: {q[0]!r}"
            )
        idx = np.searchsorted(self.ids, q)
        clamped = np.minimum(idx, len(self.ids) - 1)
        miss = self.ids[clamped] != q
        if miss.any():
            missing = q[miss]
            raise KeyError(
                f"{len(missing)} ids not in vertex dictionary; "
                f"first missing id: {missing[0]!r}"
            )
        return self.vids[clamped]


def _id_shard(a: np.ndarray, P: int) -> np.ndarray:
    """Multiplicative hash → shard id (identical routing for ingest and
    lookup; plain ``% P`` would correlate with clustered id ranges)."""
    return (
        (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        >> np.uint64(33)
    ) % np.uint64(P)


def encode_edges_service(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset | None = None,
    num_shards: int | None = None,
) -> tuple[ray.data.Dataset, int]:
    """Translate (src, dst) original ids → dense uint64 vids through a
    hash-sharded dictionary-actor service — the fast past-driver-memory
    path (``encode_edges_join`` is the pure-Dataset-API equivalent, but
    Ray 2.49's hash join is ~100× slower per row).

    Each batch deduplicates its ids and queries only the owning shards;
    per-actor memory is O(V/P). Output rows equal
    ``encode_edges(edges, vertex_ids(edges))`` as a multiset. Numeric ids
    only (hash routing). Returns (encoded edges Dataset, n); the shard
    actors live as long as the returned Dataset's plan."""
    if vertices is None:
        vertices, n = vertices_dataset(edges)
    else:
        vertices = vertices.materialize()
        n = vertices.count()
    if num_shards is None:
        from .util import default_concurrency

        # reserve 2 CPUs for the routing/encode map_batches stages
        # (CLAUDE.md deadlock rule — a pool holding every CPU starves
        # them); uncapped above that so shards scale with host size
        num_shards = default_concurrency(reserve=2, cap=1 << 20)
    P = num_shards
    actors = [_DictShard.remote() for _ in range(P)]

    def route(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _id_shard(ids, P)
        refs = []
        for s in range(P):
            m = h == s
            if m.any():
                refs.append(actors[s].ingest.remote(ids[m], vids[m]))
        ray.get(refs)
        return pa.table({"n": pa.array([len(ids)], type=pa.int64())})

    for _ in vertices.map_batches(route, batch_format="pyarrow").iter_batches():
        pass
    ray.get([a.finalize.remote() for a in actors])

    def enc_batch(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        uq = np.unique(np.concatenate([src, dst]))
        h = _id_shard(uq, P)
        refs, masks = [], []
        for s in range(P):
            m = h == s
            if m.any():
                refs.append(actors[s].lookup.remote(uq[m]))
                masks.append(m)
        vid_of = np.empty(len(uq), np.uint64)
        for m, r in zip(masks, ray.get(refs)):
            vid_of[m] = r
        return pa.table(
            {
                "src": pa.array(
                    vid_of[np.searchsorted(uq, src)], type=pa.uint64()
                ),
                "dst": pa.array(
                    vid_of[np.searchsorted(uq, dst)], type=pa.uint64()
                ),
            }
        )

    enc = edges.map_batches(
        enc_batch, batch_format="pyarrow", batch_size=1 << 20
    )
    return enc, n


def decode_vids(
    state: ray.data.Dataset,
    vertices: ray.data.Dataset,
    vid_col: str = "vid",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Map a (vid, ...) result Dataset back to original ids with one hash
    join against the vertex dictionary (the distributed inverse of the
    broadcast ``ids[vid]`` lookup)."""
    P = num_partitions or join_partitions_for(state)
    out = state.join(
        vertices.materialize(),
        join_type="inner",
        num_partitions=P,
        on=(vid_col,),
        right_on=("vid",),
    )
    return out


def _batch_outdeg_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial out-degree counts (combiner before the groupby)."""
    src = batch.column("src").to_numpy(zero_copy_only=False)
    uniq, cnt = np.unique(src, return_counts=True)
    return pa.table(
        {
            "src": pa.array(uniq.astype(np.uint64), type=pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def dense_out_degrees(edges_encoded: ray.data.Dataset, n: int) -> np.ndarray:
    """Dense int64 out-degree vector of length ``n`` from encoded edges.

    Per-batch (src, cnt) partials (one row per distinct src per batch)
    accumulated into the dense array with ``np.bincount`` on the driver —
    this path already broadcasts O(V) state, and skipping the
    ``groupby("src")`` saves Ray 2.49's slow hash aggregate (25 s → ~3 s
    at 48.6M edges); exact while total degree < 2^53 (float64 weights).
    """
    deg = np.zeros(n, dtype=np.float64)
    partial = edges_encoded.map_batches(
        _batch_outdeg_partial, batch_format="pyarrow"
    )
    for b in partial.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        src = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        deg += np.bincount(src, weights=cnt, minlength=n)
    return deg.astype(np.int64)


def sink_vids(outdeg: np.ndarray) -> np.ndarray:
    """Dense vids with out-degree 0 (dangling vertices).

    Ref semantics: ``sink_nodes`` collection at src/Graph.cpp:107-115.
    """
    return np.flatnonzero(outdeg == 0)


def undirected_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical undirected simple edge set: (a=min, b=max), self-loops
    dropped, duplicates removed via the sort-based distributed distinct on
    the packed (a << 32 | b) key (no driver materialization, no Ray
    hash-aggregate — see ``_sorted_distinct_refs``)."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        # per-batch dedup (combiner); the packed key REQUIRES dense vids
        # < 2^32 — beyond that a's low bits and b's high bits would
        # collide and silently merge distinct edges
        if len(b) and int(b.max()) >= 1 << 32:
            raise ValueError(
                "undirected_edges packed key supports vids < 2^32; "
                "use a wider key for larger graphs"
            )
        key = (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)
        return pa.table({"k": pa.array(np.unique(key), type=pa.uint64())})

    canoned = edges.map_batches(canon, batch_format="pyarrow")
    refs, _counts = _sorted_distinct_refs(canoned, "k")
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.uint64()),
                    "b": pa.array([], type=pa.uint64()),
                }
            )
        )

    @ray.remote
    def unpack(tbl: pa.Table) -> pa.Table:
        uk = tbl.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(
                    (uk >> np.uint64(32)).astype(np.uint64), type=pa.uint64()
                ),
                "b": pa.array(
                    (uk & np.uint64(0xFFFFFFFF)).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    return ray.data.from_arrow_refs([unpack.remote(r) for r in refs])


def symmetrize(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Both directions of the canonical undirected edge set:
    (src, dst) ∪ (dst, src) — the message graph for CC / LPA."""
    und = undirected_edges(edges)

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), type=pa.uint64()),
                "dst": pa.array(np.concatenate([b, a]), type=pa.uint64()),
            }
        )

    return und.map_batches(both, batch_format="pyarrow")
