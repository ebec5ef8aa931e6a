"""k-core decomposition — iterative degree peeling on the undirected view
of a distinct edge set (the link-graph "dense subgraph" primitive:
repeatedly drop vertices of degree < k until every survivor has ≥ k
surviving neighbors).

Same engine shape as connected components (engine/components.py): each
round is one distributed degree pass (per-batch ``np.unique`` partials,
driver ``np.bincount`` accumulate — the sanctioned broadcast-state path,
engine/graph.dense_out_degrees) plus one broadcast-mask edge filter
(``ray.put`` of a bit-packed alive mask read once per task, never
re-shipped per batch). State is O(V/8) bytes broadcast + O(E) streamed;
the fully partitioned variant would hold per-shard degree slices in the
BSP engine, but at V = 1e9 the packed mask is 125 MB — comfortably
broadcastable, matching the repo's PageRank broadcast path.

Assumes the input edge set is distinct and self-loop-free (both hold for
the lineitem bipartite projection; a self-loop would count degree 2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from . import graph as G


def _deg_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial undirected-degree counts over both endpoints."""
    src = batch.column("src").to_numpy(zero_copy_only=False)
    dst = batch.column("dst").to_numpy(zero_copy_only=False)
    uniq, cnt = np.unique(np.concatenate([src, dst]), return_counts=True)
    return pa.table(
        {
            "vid": pa.array(uniq.astype(np.uint64), type=pa.uint64()),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def _dense_degrees(edges: ray.data.Dataset, n: int) -> np.ndarray:
    deg = np.zeros(n, dtype=np.float64)
    partial = edges.map_batches(_deg_partial, batch_format="pyarrow")
    for b in partial.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        deg += np.bincount(vid, weights=cnt, minlength=n)
    return deg.astype(np.int64)


def _alive_filter(mask_ref, n: int):
    def fn(batch: pa.Table) -> pa.Table:
        bits = ray.get(mask_ref)
        alive = np.unpackbits(bits, count=n).view(bool)
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(alive[src] & alive[dst]))

    return fn


def _canonical_undirected(enc: ray.data.Dataset, n: int) -> ray.data.Dataset:
    """Dedupe an encoded edge set into the canonical undirected simple
    graph (min, max) with self-loops dropped — for inputs (e.g. raw SNAP
    files) that may carry duplicates / both directions / self-loops, which
    would silently inflate degrees."""
    if n >= 1 << 32:
        raise ValueError("dedupe packs vids into 32 bits; graph too large")
    und = G.undirected_edges(enc)
    return und.map_batches(
        lambda t: pa.table({"src": t.column("a"), "dst": t.column("b")}),
        batch_format="pyarrow",
    )


def kcore(
    edges: ray.data.Dataset, k: int, max_rounds: int = 10_000,
    dedupe: bool = False,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Peel the graph to its k-core. Returns (sorted original ids, boolean
    alive mask over those ids, rounds). ``rounds`` counts every degree
    pass including the final no-change one (so a stable input reports 1).
    ``dedupe=True`` canonicalizes the input first (see the module
    precondition — raw SNAP inputs need it).
    """
    ids = G.vertex_ids(edges)
    n = len(ids)
    cur = G.encode_edges(edges, ids)
    if dedupe:
        cur = _canonical_undirected(cur, n)
    cur = cur.materialize()
    alive = np.ones(n, dtype=bool)
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        deg = _dense_degrees(cur, n)
        new_alive = alive & (deg >= k)
        if (new_alive == alive).all():
            break
        alive = new_alive
        mask_ref = ray.put(np.packbits(alive))
        cur = cur.map_batches(
            _alive_filter(mask_ref, n), batch_format="pyarrow"
        ).materialize()
    return ids, alive, rounds


def kcore_bsp(
    edges: ray.data.Dataset,
    k: int,
    num_shards: int | None = None,
    max_rounds: int = 10_000,
    dedupe: bool = False,
    prepared: "tuple | None" = None,
) -> tuple[ray.data.Dataset, int]:
    """Distributed k-core on the BSP shard actors (the scale path): the
    actors hold degree slices + alive masks, a peel round is two actor
    waves over the static exchange topology — no per-round O(E) edge
    rewrite, no O(V) driver bincount, round cost independent of
    rounds-so-far (contrast :func:`kcore`, which re-materializes the
    filtered edge set every round). Same survivor set (the k-core is
    unique) and the same round-count semantics. Returns (original-id
    (vid int64) Dataset, rounds).

    ``prepared``: an optional ``(BSPGraph, ids)`` pair from
    :func:`prepare_kcore_bsp` — the graph build (encode + ingest +
    finalize) dominates a single peel on large inputs, so callers running
    several k values (or re-peeling after a checkpoint) build once and
    pass it here; the graph is NOT shut down (the preparer owns it).
    ``edges``/``num_shards``/``dedupe`` are ignored when prepared is
    given."""
    if prepared is not None:
        g, ids = prepared
        alive_ds, rounds = g.kcore(k, max_rounds=max_rounds)
        return _decode_alive(alive_ds, ids), rounds

    # one-shot path: same build recipe as prepare_kcore_bsp (delegated so
    # the two paths cannot silently diverge), graph torn down after peel
    g, ids = prepare_kcore_bsp(edges, num_shards=num_shards, dedupe=dedupe)
    alive_ds, rounds = g.kcore(k, max_rounds=max_rounds)
    out = _decode_alive(alive_ds, ids)
    g.shutdown()
    return out, rounds


def _decode_alive(alive_ds: ray.data.Dataset, ids: np.ndarray) -> ray.data.Dataset:
    """Dense survivor vids → original ids (dictionary broadcast once)."""
    ids_ref = ray.put(ids)

    def decode(t: pa.Table) -> pa.Table:
        d = ray.get(ids_ref)
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"vid": pa.array(d[vid].astype(np.int64), type=pa.int64())}
        )

    return alive_ds.map_batches(decode, batch_format="pyarrow").materialize()


def prepare_kcore_bsp(
    edges: ray.data.Dataset,
    num_shards: int | None = None,
    dedupe: bool = False,
):
    """Build the (BSPGraph, ids) pair :func:`kcore_bsp` peels on — once
    per edge set, amortized across k values / repeated peels. The caller
    owns the graph (``prepared[0].shutdown()`` when done)."""
    from .bsp import BSPGraph
    from .util import default_concurrency

    ids = G.vertex_ids(edges)
    n = len(ids)
    enc = G.encode_edges(edges, ids)
    if dedupe:
        enc = _canonical_undirected(enc, n)
    g = BSPGraph(
        enc,
        n=n,
        num_shards=num_shards or default_concurrency(),
        symmetric_copy=True,
    )
    return g, ids


def kcore_vertices_dataset(
    edges: ray.data.Dataset, k: int, max_rounds: int = 10_000,
    dedupe: bool = False, engine: str = "bsp",
) -> tuple[ray.data.Dataset, int]:
    """Original ids of the k-core vertices as a (vid int64) Dataset.
    ``engine="bsp"`` (default) peels on the shard actors;
    ``engine="dataset"`` uses the broadcast-mask Dataset peel."""
    if engine == "bsp":
        return kcore_bsp(edges, k, max_rounds=max_rounds, dedupe=dedupe)
    ids, alive, rounds = kcore(edges, k, max_rounds, dedupe=dedupe)
    surv = ids[alive].astype(np.int64)
    return (
        ray.data.from_arrow(
            pa.table({"vid": pa.array(surv, type=pa.int64())})
        ),
        rounds,
    )
