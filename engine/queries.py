"""Driver-contract query pipelines over the /root/testdata tables.

Each function here backs one ``queries()`` entry in ``__ray_entry__.py``;
the matching DuckDB oracle SQL lives in ``ORACLE_SQL`` below (SURVEY.md
§2.4). Column names are kept identical between the Ray result and the SQL.
Float columns are rounded to a fixed number of decimals on BOTH sides so
the driver's value-hash compare is insensitive to summation order.

The link graph used throughout is projected from ``lineitem``:
``src = l_orderkey``, ``dst = l_partkey + 10_000_000`` (disjoint id
ranges), DISTINCT edges — a bipartite order→part reference graph. The
tripartite variant for triangles adds part→supplier and supplier→order
edges with suppliers offset by 20_000_000.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from . import graph as G
from .ingest import sha256_column

PART_OFFSET = 10_000_000
SUPP_OFFSET = 20_000_000
ROUND = 9  # decimals for float compare columns
_CC_ORACLE_ROUNDS = 14  # unroll depth of the cc_labels SQL oracle
_KCORE_ORACLE_ROUNDS = 8  # unroll depth of the kcore_3 SQL oracle
_BFS_ORACLE_ROUNDS = 16  # unroll depth of the bfs_hops SQL oracle
_SSSP_ORACLE_ROUNDS = 32  # unroll depth of the sssp_weighted SQL oracle
#   (weighted min paths take more hops than BFS when cheap long routes
#   beat expensive short ones; depth is guarded at query time)


def _li(sf_dir: str, columns):
    return ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=columns)


def edges_project(sf_dir: str) -> ray.data.Dataset:
    """Distinct (src, dst) edge table projected from lineitem (N1/N3 analog:
    the relational edge-extraction step, column-pruned at the read).
    Distinct runs on the sort-based path (pack into one int64 key →
    per-batch np.unique combiner → ``graph._sorted_distinct_refs``):
    the previous ``groupby().aggregate(Count)`` paid Ray 2.49's slow hash
    aggregate ~5 s of fixed cost at sf0.1 and sat at the root of every
    ``_graph_arrays`` query."""
    from .graph import _sorted_distinct_refs

    def proj(batch: pa.Table) -> pa.Table:
        src = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            + PART_OFFSET
        )
        key = src * np.int64(1 << 32) + dst  # per-batch dedup combiner
        return pa.table({"key": pa.array(np.unique(key))})

    packed = _li(sf_dir, ["l_orderkey", "l_partkey"]).map_batches(
        proj, batch_format="pyarrow"
    )
    refs, _counts = _sorted_distinct_refs(packed, "key")

    def unpack(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(key // (1 << 32), type=pa.int64()),
                "dst": pa.array(key % (1 << 32), type=pa.int64()),
            }
        )

    return ray.data.from_arrow_refs(refs).map_batches(
        unpack, batch_format="pyarrow"
    )


def out_degree(sf_dir: str) -> ray.data.Dataset:
    """Out-degree per source vertex of the distinct edge graph (R3)."""
    edges = edges_project(sf_dir)
    return edges.groupby("src").aggregate(Count(alias_name="outdeg"))


def sinks(sf_dir: str) -> ray.data.Dataset:
    """Dangling vertices (R4) via a true distributed anti-join: all vertices
    minus those appearing as src."""
    edges = edges_project(sf_dir).materialize()
    verts = edges.select_columns(["dst"]).union(
        edges.map_batches(
            lambda t: pa.table({"dst": t.column("src")}), batch_format="pyarrow"
        )
    )
    verts = (
        verts.groupby("dst").aggregate(Count(alias_name="_c")).select_columns(["dst"])
    )
    srcs = (
        edges.select_columns(["src"])
        .groupby("src")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["src"])
    )
    anti = verts.join(
        srcs,
        join_type="left_anti",
        num_partitions=G.join_partitions_for(edges),
        on=("dst",),
        right_on=("src",),
    )
    return anti.map_batches(
        lambda t: pa.table({"vid": t.column("dst")}), batch_format="pyarrow"
    )


_GRAPH_ARRAYS_CACHE: dict = {}


def _graph_arrays(sf_dir: str):
    """Driver-side dense arrays of the small lineitem graph (used by the
    superstep queries; the full engines are exercised by pagerank10).
    Memoized per sf_dir within a Ray session — a dozen contract queries
    derive from the same deterministic build, and re-deriving it per
    invocation dominated their wall time (13.6 s build vs 1.7 s of HITS
    iterations at sf0.1). The cached datasets hold object-store refs, so
    the cache is keyed by Ray session and dies with it."""
    sess = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (sf_dir, sess)
    hit = _GRAPH_ARRAYS_CACHE.get(key)
    if hit is not None:
        return hit
    edges = edges_project(sf_dir).materialize()
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids).materialize()
    n = len(ids)
    outdeg = G.dense_out_degrees(enc, n)
    out = (edges, ids, enc, n, outdeg)
    _GRAPH_ARRAYS_CACHE.clear()  # one graph at a time: bounded memory
    _GRAPH_ARRAYS_CACHE[key] = out
    return out


def pr_superstep1(sf_dir: str) -> ray.data.Dataset:
    """One PageRank superstep from uniform init (SQL-checkable slice of R8):
    rank1 = sink_sum + d * Σ_{u→v} rank0/outdeg(u), all vertices."""
    from .pagerank import pagerank

    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    res = pagerank(enc, iterations=1)
    rank = np.round(res.ranks, ROUND)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(rank),
            }
        )
    )


def toprank_superstep(sf_dir: str) -> ray.data.Dataset:
    """Top-10 vertices after one superstep (R12/R13), deterministic order:
    (rank DESC, vid ASC) on the rounded rank."""
    ranks = pr_superstep1(sf_dir)
    return ranks.sort(["rank", "vid"], descending=[True, False]).limit(10)


def ranksum_superstep(sf_dir: str) -> ray.data.Dataset:
    """Σ rank after one superstep ≈ 1 (R11), rounded to 6 decimals."""
    ranks = pr_superstep1(sf_dir)
    total = ranks.sum("rank")
    return ray.data.from_arrow(
        pa.table({"ranksum": pa.array([round(total, 6)])})
    )


def pagerank10(sf_dir: str) -> ray.data.Dataset:
    """Full 10-superstep PageRank on the lineitem graph, oracle-checked
    against the unrolled-CTE DuckDB SQL (plus pytest vs the sequential
    oracle)."""
    from .pagerank import pagerank

    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    res = pagerank(enc, iterations=10)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(np.round(res.ranks, ROUND)),
            }
        )
    )


def ppr10(sf_dir: str) -> ray.data.Dataset:
    """Personalized PageRank, 10 supersteps, teleport mass concentrated on
    the smallest-id vertex (dense vid 0 under the sort-by-id dictionary) —
    the link-graph similarity/recommendation primitive. Oracle-checked via
    the unrolled-CTE SQL with a CASE teleport base."""
    from .pagerank import pagerank

    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    t = np.zeros(n)
    t[0] = 1.0
    res = pagerank(enc, iterations=10, teleport=t)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(np.round(res.ranks, ROUND)),
            }
        )
    )


def cc_labels(sf_dir: str) -> ray.data.Dataset:
    """Connected components of the bipartite graph, oracle-checked against
    unrolled min-label-propagation SQL (plus pytest vs union-find)."""
    from .components import connected_components_dataset

    ds, rounds = connected_components_dataset(edges_project(sf_dir))
    # the SQL oracle unrolls exactly _CC_ORACLE_ROUNDS min-label rounds; a
    # graph whose labelling radius exceeds that would FALSELY mismatch, so
    # fail loudly here instead (raise the unroll depth if this ever trips)
    if rounds > _CC_ORACLE_ROUNDS:
        raise RuntimeError(
            f"cc_labels converged in {rounds} rounds but the SQL oracle "
            f"unrolls only {_CC_ORACLE_ROUNDS} — raise _CC_ORACLE_ROUNDS"
        )
    return ds.rename_columns({"id": "vid"}).map_batches(
        lambda t: pa.table(
            {
                "vid": t.column("vid").cast(pa.int64()),
                "label": t.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def bfs_hops(sf_dir: str) -> ray.data.Dataset:
    """Single-source BFS hop distances over the undirected bipartite graph
    from the smallest vertex id, on the BSP shard actors (min-plus
    propagation over the same static combine structure as CC — two actor
    waves per round, no driver vertex state). Oracle-checked against
    unrolled min-plus SQL; unreached vertices are omitted on both sides."""
    from .bsp import BSPGraph

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    g = BSPGraph(enc, n=n, num_shards=4, symmetric_copy=True)
    # dense vid 0 == smallest original id (the dictionary is sorted)
    ds, rounds = g.bfs(source_vid=0)
    g.shutdown()
    if rounds - 1 > _BFS_ORACLE_ROUNDS:
        raise RuntimeError(
            f"bfs_hops needed {rounds - 1} propagation rounds but the SQL "
            f"oracle unrolls only {_BFS_ORACLE_ROUNDS} — raise "
            "_BFS_ORACLE_ROUNDS"
        )
    ids_int = ids.astype(np.int64)

    def decode(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        dist = t.column("label").to_numpy(zero_copy_only=False)
        reached = dist < n  # sentinel n = unreached
        return pa.table(
            {
                "vid": pa.array(ids_int[vid[reached]], type=pa.int64()),
                "dist": pa.array(dist[reached], type=pa.int64()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def degree_histogram(sf_dir: str) -> ray.data.Dataset:
    """Out-degree histogram (outdeg, n_vertices) of the distinct edge
    graph — the graph-profile pass (power-law check, partitioner input):
    per-batch partial np.bincount over the out-degree table, tiny groupby
    Sum; sinks (no out-edges) absent on both sides."""
    from ray.data.aggregate import Sum

    deg = out_degree(sf_dir)

    def part(t: pa.Table) -> pa.Table:
        d = t.column("outdeg").to_numpy(zero_copy_only=False)
        cnt = np.bincount(d)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "outdeg": pa.array(nz.astype(np.int64)),
                "n_vertices": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return (
        deg.map_batches(part, batch_format="pyarrow")
        .groupby("outdeg")
        .aggregate(Sum("n_vertices", alias_name="n_vertices"))
    )


def bfs_multi3(sf_dir: str) -> ray.data.Dataset:
    """Multi-source BFS (distance to the NEAREST of the 3 smallest vertex
    ids — the landmark-distance primitive) on the BSP shard actors; same
    min-plus machinery and unrolled-SQL oracle shape as bfs_hops,
    unreached vertices omitted on both sides."""
    from .bsp import BSPGraph

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    g = BSPGraph(enc, n=n, num_shards=4, symmetric_copy=True)
    # dense vids 0,1,2 == the 3 smallest original ids (sorted dictionary)
    ds, rounds = g.bfs(source_vid=np.array([0, 1, 2]))
    g.shutdown()
    if rounds - 1 > _BFS_ORACLE_ROUNDS:
        raise RuntimeError(
            f"bfs_multi3 needed {rounds - 1} propagation rounds but the SQL "
            f"oracle unrolls only {_BFS_ORACLE_ROUNDS} — raise "
            "_BFS_ORACLE_ROUNDS"
        )
    ids_int = ids.astype(np.int64)

    def decode(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        dist = t.column("label").to_numpy(zero_copy_only=False)
        reached = dist < n  # sentinel n = unreached
        return pa.table(
            {
                "vid": pa.array(ids_int[vid[reached]], type=pa.int64()),
                "dist": pa.array(dist[reached], type=pa.int64()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def sssp_weighted(sf_dir: str) -> ray.data.Dataset:
    """Single-source WEIGHTED shortest paths (distributed Bellman-Ford on
    the BSP shard actors — min-plus to fixpoint, two actor waves per
    round, no driver vertex state) over the undirected bipartite graph,
    from the smallest vertex id. Per-edge integer weights 1..9 are the
    deterministic symmetric dense-vid derivation of ShardActor.sssp_begin,
    so every distance is an exact integer and the unrolled min-plus SQL
    oracle reproduces it bit-for-bit; unreached vertices are omitted on
    both sides."""
    from .bsp import BSPGraph, SSSP_SENTINEL

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    g = BSPGraph(enc, n=n, num_shards=4, symmetric_copy=True)
    ds, rounds = g.sssp(source_vid=0, wmod=9)
    g.shutdown()
    if rounds - 1 > _SSSP_ORACLE_ROUNDS:
        raise RuntimeError(
            f"sssp_weighted needed {rounds - 1} propagation rounds but the "
            f"SQL oracle unrolls only {_SSSP_ORACLE_ROUNDS} — raise "
            "_SSSP_ORACLE_ROUNDS"
        )
    ids_int = ids.astype(np.int64)

    def decode(t: pa.Table) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        dist = t.column("label").to_numpy(zero_copy_only=False)
        reached = dist < SSSP_SENTINEL
        return pa.table(
            {
                "vid": pa.array(ids_int[vid[reached]], type=pa.int64()),
                "dist": pa.array(dist[reached], type=pa.int64()),
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


def wpr10(sf_dir: str) -> ray.data.Dataset:
    """Weighted PageRank, 10 supersteps: edge weight = lineitem
    multiplicity per (order, part) pair (link strength), mass split
    proportionally to weight. Weighted pairs are built with a per-batch
    packed-key combiner → one groupby (shuffle sees distinct pairs per
    batch, not rows); iterations run on engine/wpr.py's chained-ref
    dense-segment gather. Oracle: unrolled weighted-CTE SQL."""
    from .wpr import weighted_pagerank

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    if (n + 1) ** 2 >= 2**63:
        raise ValueError("packed (src,dst) key overflow guard")
    BASE = np.int64(n + 1)
    ids_ref = ray.put(ids)

    def pack(t: pa.Table) -> pa.Table:
        d = ray.get(ids_ref)
        src = np.searchsorted(
            d, t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        dst = np.searchsorted(
            d,
            t.column("l_partkey").to_numpy(zero_copy_only=False)
            + PART_OFFSET,
        ).astype(np.int64)
        key = src * BASE + dst
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(u), "cnt": pa.array(c.astype(np.int64))}
        )

    from .ntile import grouped_sums_sorted

    pairs = grouped_sums_sorted(
        _li(sf_dir, ["l_orderkey", "l_partkey"]).map_batches(
            pack, batch_format="pyarrow"
        ),
        "key",
        ["cnt"],
        ["w"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(key // BASE),
                "dst": pa.array(key % BASE),
                "w": t.column("w"),
            }
        )

    enc_w = pairs.map_batches(unpack, batch_format="pyarrow")
    rank = weighted_pagerank(enc_w, n, iterations=10)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(np.round(rank, ROUND)),
            }
        )
    )


def hits_3(sf_dir: str) -> ray.data.Dataset:
    """Three unnormalized HITS rounds (hubs & authorities) on the dataset
    engine — integer path-count iterates, so the oracle compare is exact
    BIGINT with no float rounding. auth_k = Σ in-neighbors' hub_{k-1};
    hub_k = Σ out-neighbors' auth_k (classic in-round update order)."""
    from .hits import hits

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    auth, hub = hits(enc, n, iterations=3)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "auth": pa.array(auth.astype(np.int64)),
                "hub": pa.array(hub.astype(np.int64)),
            }
        )
    )


def _tripartite_edges(sf_dir: str) -> ray.data.Dataset:
    """order→part→supplier→order tripartite edge projection (offsets keep
    the three vertex ranges disjoint)."""

    def proj(batch: pa.Table) -> pa.Table:
        o = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
        p = (
            batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
            + PART_OFFSET
        )
        s = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
            + SUPP_OFFSET
        )
        return pa.table(
            {
                "src": pa.array(np.concatenate([o, p, s]), type=pa.int64()),
                "dst": pa.array(np.concatenate([p, s, o]), type=pa.int64()),
            }
        )

    return _li(sf_dir, ["l_orderkey", "l_partkey", "l_suppkey"]).map_batches(
        proj, batch_format="pyarrow"
    )


def triangles_tripartite(sf_dir: str) -> ray.data.Dataset:
    """Triangle count over the order→part→supplier→order tripartite graph
    (N6; SQL-checkable as a 3-way self-join)."""
    from .triangles import triangle_count

    cnt = triangle_count(_tripartite_edges(sf_dir))
    return ray.data.from_arrow(
        pa.table({"n_triangles": pa.array([cnt], type=pa.int64())})
    )


def local_clustering_tri(sf_dir: str) -> ray.data.Dataset:
    """Per-vertex triangle counts + local clustering coefficient on the
    tripartite graph (every triangle is one (order, part, supplier)
    triple, so the SQL oracle is the 3-way self-join credited to each
    corner)."""
    from .triangles import local_clustering

    return local_clustering(_tripartite_edges(sf_dir))


# ---- documents / embeddings queries ------------------------------------


def sha256_documents(sf_dir: str) -> ray.data.Dataset:
    """Per-row sha256 of documents.text (the N2 invariant on this corpus)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text_sha256": sha256_column(batch.column("text")),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_exact(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup survivors: smallest doc_id per distinct text hash, with
    the duplicate count (training-data op; hash-partitioned groupby)."""
    hashed = sha256_documents(sf_dir)
    return hashed.groupby("text_sha256").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="dup_count")
    )


def token_count(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per document (text-analysis op)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def f(batch: pa.Table) -> pa.Table:
        import re

        texts = batch.column("text").to_pylist()
        n = [len(re.split(r"\s+", t.strip())) if t is not None else None for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def doc_stats(sf_dir: str) -> ray.data.Dataset:
    """Simple quality stats: characters and alphabetic characters per doc."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.utf8_length(text)
        import re

        alpha = pa.array(
            [
                len(re.sub(r"[^A-Za-z]", "", t)) if t is not None else None
                for t in text.to_pylist()
            ],
            type=pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_alpha": alpha,
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def ann_topk(sf_dir: str) -> ray.data.Dataset:
    """Brute-force cosine top-10 against the first embedding vector
    (similarity-search baseline; numpy matmul per batch against the
    broadcast query, then a tiny global sort)."""
    from .annsearch import brute_force_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    q_tbl = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .sort("vec_id")
        .limit(1)
        .take_all()
    )
    query = np.asarray(q_tbl[0]["embedding"], dtype=np.float64)
    out = brute_force_topk(ds, query, k=10, round_decimals=6)
    return out


def embedding_centroids(sf_dir: str) -> ray.data.Dataset:
    """Per-label mean embedding (class prototypes): one row per
    (label, dim) with the float64 mean of that component rounded to 6
    decimals — per-batch (label, dim) partial sums, tiny hash groupby,
    O(labels × dim) output."""
    from .annsearch import group_centroids

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return group_centroids(ds, group_col="label", vec_col="embedding")


def embedding_near_dup(sf_dir: str) -> ray.data.Dataset:
    """Cosine near-duplicate pairs (a < b, cos >= 0.35) over the embeddings
    table — SQL-checkable via a self-join (training-data dedup op)."""
    from .dedup import embedding_near_dups

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_near_dups(ds, threshold=0.35).map_batches(
        _round_pairs_6, batch_format="pyarrow"
    )


def _round_pairs_6(t: pa.Table) -> pa.Table:
    """Round cos_sim to 6 decimals for the float-compare contract with the
    DuckDB oracle (list_cosine_similarity evaluates in float32)."""
    return pa.table(
        {
            "a": t.column("a").cast(pa.int64()),
            "b": t.column("b").cast(pa.int64()),
            "cos_sim": pa.compute.round(
                t.column("cos_sim").cast(pa.float64()), ndigits=6
            ),
        }
    )


def embedding_near_dup_ivf(sf_dir: str) -> ray.data.Dataset:
    """Cosine near-duplicate pairs through the IVF-BUCKETED scale path (no
    full-matrix broadcast; per-bucket all-pairs inside groupby.map_groups).
    Multi-probe assignment (top-4 of 16 centroids) — approximate, so
    rows-only here; pytest proves full-probe ≡ brute force."""
    from .dedup import embedding_near_dups_ivf

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_near_dups_ivf(
        ds, threshold=0.35, num_centroids=16, assign_top=4
    ).map_batches(_round_pairs_6, batch_format="pyarrow")


def embedding_near_dup_ivf_full(sf_dir: str) -> ray.data.Dataset:
    """IVF-bucketed near-dup with EXHAUSTIVE probing (assign_top ==
    num_centroids): every vector lands in every bucket, so the bucketed
    machinery must reproduce the brute-force pair set exactly — which
    makes the whole IVF path (centroid fit → multi-probe assignment →
    per-bucket matmul → pair dedup) hard-checkable against the same SQL
    self-join oracle as ``embedding_near_dup``. The approximate default
    (``embedding_near_dup_ivf``) stays rows-only by design."""
    from .dedup import embedding_near_dups_ivf

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_near_dups_ivf(
        ds, threshold=0.35, num_centroids=8, assign_top=8
    ).map_batches(_round_pairs_6, batch_format="pyarrow")


def embedding_near_dup_ivf_planted(sf_dir: str) -> ray.data.Dataset:
    """Hard-checkable IVF near-dup gate with MULTI-PROBE assignment (the
    ``minhash_planted`` trick for the embedding path): a synthetic corpus
    derived closed-form from the embeddings table's vec_ids — group
    ``vec_id // 4``; members with ``vec_id % 4 < 3`` share an IDENTICAL
    two-hot unit vector unique to their group (slots [0, 64)); member 3
    gets a two-hot vector from a DISJOINT slot range ([64, 128)). Identical
    vectors produce identical centroid similarities, hence identical
    multi-probe bucket assignments (stable argsort) — recall 1 for the
    within-group pairs regardless of what the centroid fit does — while
    any two distinct two-hot vectors have cosine ≤ 0.5 < 0.95, so no
    other pair can verify. The true pair table is therefore closed-form:
    every within-group pair of present members with vec_id % 4 < 3, at
    cos_sim 1.0. This gives the APPROXIMATE multi-probe path
    (assign_top=2 of 8 centroids) a deterministic SQL oracle; the
    heuristic-corpus variant ``embedding_near_dup_ivf`` stays rows-only
    by design."""
    from .dedup import embedding_near_dups_ivf

    ids = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    D = 64  # slots per range; capacity C(64,2) = 2016 groups (8064 ids)
    combos = np.array(
        [(a, b) for a in range(D) for b in range(a + 1, D)], dtype=np.int64
    )

    def synth(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        g = vid // 4
        if len(g) and g.max() >= len(combos):
            raise ValueError(
                f"planted corpus capacity exceeded: group {g.max()} needs "
                f"C({D},2) > {len(combos)} two-hot slots — raise D"
            )
        member = vid % 4
        off = np.where(member < 3, 0, D)  # disjoint slot ranges
        dim = 2 * D
        vecs = np.zeros((len(vid), dim))
        r = np.arange(len(vid))
        inv = 1.0 / np.sqrt(2.0)
        vecs[r, combos[g, 0] + off] = inv
        vecs[r, combos[g, 1] + off] = inv
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1)), dim
                ),
            }
        )

    corpus = ids.map_batches(synth, batch_format="pyarrow")
    return embedding_near_dups_ivf(
        corpus, threshold=0.95, num_centroids=8, assign_top=2
    ).map_batches(_round_pairs_6, batch_format="pyarrow")


def simhash_near_dup_pairs(sf_dir: str) -> ray.data.Dataset:
    """SimHash near-dup pairs (Hamming ≤ 3) over documents through the
    full 2-of-6 chunk-pair LSH pipeline — hard-checkable because the
    scheme GUARANTEES recall at h ≤ 4 (every qualifying pair shares a
    bucket) and the in-bucket verify is exact, so the result must equal
    the SQL fingerprint self-join (bit_count of xor). Raises if any
    bucket was dropped (accounting is load-bearing: a dropped bucket
    would make the ≡-SQL claim false)."""
    from .dedup import simhash_near_dups

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    res = simhash_near_dups(ds, max_hamming=3)
    if res["dropped_buckets"]:
        raise RuntimeError(
            f"{res['dropped_buckets']} LSH buckets over max_bucket — the "
            "SQL-equivalence contract of this query does not hold; raise "
            "max_bucket or exact-dedup the corpus first"
        )
    return res["pairs"]


def lpa_labels(sf_dir: str) -> ray.data.Dataset:
    """2 rounds of label propagation on the bipartite lineitem graph
    (rows-only; exactness by pytest vs the sequential oracle)."""
    from .labelprop import label_propagation_dataset

    ds = label_propagation_dataset(edges_project(sf_dir), iterations=2)
    return ds.rename_columns({"id": "vid"}).map_batches(
        lambda t: pa.table(
            {
                "vid": t.column("vid").cast(pa.int64()),
                "label": t.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def lpa_labels_bsp(sf_dir: str) -> ray.data.Dataset:
    """Same 2-round LPA on the shard-actor BSP engine (per-shard
    label-count combine) — must equal lpa_labels exactly (rows-only vs
    driver; exactness by pytest)."""
    from .bsp import bsp_label_propagation

    labels = bsp_label_propagation(edges_project(sf_dir), iterations=2,
                                   num_shards=4)
    ids = sorted(labels)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids, type=pa.int64()),
                "label": pa.array([labels[i] for i in ids], type=pa.int64()),
            }
        )
    )


def minhash_dedup(sf_dir: str) -> ray.data.Dataset:
    """MinHash-LSH near-dup clusters over documents (rows-only; recall
    tested in pytest against planted duplicates)."""
    from .dedup import minhash_lsh_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return minhash_lsh_dedup(ds, threshold=0.8)["clusters"]


def _planted_dup_corpus(ids: ray.data.Dataset) -> ray.data.Dataset:
    """Synthetic near-dup corpus derived CLOSED-FORM from a doc_id
    column: members with ``doc_id % 4 < 3`` of group ``doc_id // 4``
    share an identical 12-token text unique to their group; member 3
    gets a unique text. Identical texts have Jaccard 1 and distinct
    groups share no token, so the true near-dup cluster table is known
    exactly (used by ``minhash_planted`` / ``minhash_dedup_corpus``)."""

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [
            " ".join(f"g{d // 4}w{j}" for j in range(12))
            if d % 4 < 3
            else " ".join(f"u{d}w{j}" for j in range(12))
            for d in did.tolist()
        ]
        return pa.table(
            {"doc_id": pa.array(did), "text": pa.array(texts, type=pa.string())}
        )

    return ids.map_batches(synth, batch_format="pyarrow")


def minhash_planted(sf_dir: str) -> ray.data.Dataset:
    """Hard-checkable MinHash-LSH gate: the planted corpus
    (:func:`_planted_dup_corpus`) run through the FULL
    minhash_lsh_dedup pipeline (signatures → banding → bucket
    groupby → in-group exact verify → union-find). The true cluster
    table is known exactly: every present member with
    ``doc_id % 4 < 3`` whose group has ≥2 such members, cluster = the
    smallest present member id. This gives the approximate-dedup pipeline
    a deterministic SQL oracle (the heuristic-corpus variant
    ``minhash_dedup`` stays rows-only by design)."""
    from .dedup import minhash_lsh_dedup

    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    corpus = _planted_dup_corpus(ids)
    return minhash_lsh_dedup(corpus, threshold=0.8)["clusters"]


def minhash_dedup_corpus(sf_dir: str) -> ray.data.Dataset:
    """End-to-end dedup MATERIALIZATION — the step a training pipeline
    actually consumes: full MinHash-LSH over the planted corpus →
    cluster table → drop list (members that are not their cluster's
    canonical min-id root) → remove it from the corpus key set with the
    distributed sort-based EXCEPT (engine/setops.py). Output: the
    surviving ``doc_id`` keep-list.

    Scale note (100 TB): with a high dup rate the drop list is
    O(corpus), so this must NOT be a broadcast filter (drop list may
    not fit a worker) and must NOT be a Bloom anti-join (false
    positives would silently drop unique documents); the sort-based
    EXCEPT is one all-to-all sort with O(blocks) driver metadata —
    exact, streaming, and key-partitioned. Closed form on the planted
    corpus: drop every non-minimal ``%4<3`` member of a group with ≥2
    such members present."""
    from .dedup import minhash_lsh_dedup
    from .setops import except_keys

    ids = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    clusters = minhash_lsh_dedup(_planted_dup_corpus(ids), threshold=0.8)[
        "clusters"
    ]

    def drops(t: pa.Table) -> pa.Table:
        nonroot = pc.invert(pc.equal(t.column("doc_id"), t.column("cluster")))
        return pa.table({"doc_id": t.filter(nonroot).column("doc_id")})

    drop_ids = clusters.map_batches(drops, batch_format="pyarrow")
    return except_keys(ids, drop_ids, "doc_id")


def simhash_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """64-bit SimHash per document, oracle-checked: token hashes are
    DuckDB's md5_number_lower(), so the fingerprint is reproducible in
    pure SQL (bit-vote unrolled over generate_series(0,63))."""
    from .dedup import SimHasher
    from .util import default_concurrency

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    sh = ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=default_concurrency()
    )

    # one row per doc: the 4 chunk rows all carry the same fingerprint —
    # slice chunk 0 instead of a groupby (Ray's hash aggregate runs
    # full-range uint64 through int64/pickled objects)
    def one_per_doc(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("chunk"), 0)
        f = t.filter(keep)
        return pa.table(
            {"doc_id": f.column("doc_id"), "simhash": f.column("simhash")}
        )

    return sh.map_batches(one_per_doc, batch_format="pyarrow")


def text_analysis(sf_dir: str) -> ray.data.Dataset:
    """Language-ID + quality + token-count columns (rows-only for the
    heuristic columns; n_chars/n_tokens_ws are covered by the SQL-checked
    doc_stats/token_count queries)."""
    from .textstats import analyze

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = analyze(ds)
    return out.select_columns(
        ["doc_id", "lang_id", "n_words", "n_tokens_bpeish", "quality"]
    )


# Planted-language templates: every word is a stopword of EXACTLY ONE
# language (cross-checked by tests/test_trainops.py), so the classifier's
# stopword-ratio argmax has a closed-form answer; "zh" exercises the CJK
# override and "unknown" the below-threshold branch. Order = doc_id % 6.
_LANGID_TEMPLATES = {
    "en": "the and of to that for with was this are",
    "de": "der die das und ist ich nicht ein eine zu",
    "es": "y los las por con para una es se al",
    "fr": "le les et est dans pour qui sur pas au",
    "zh": "一二三四五六七八九十方法",
    "unknown": "zebra quartz nimbus vortex prism raven lumen ember",
}


def langid_planted(sf_dir: str) -> ray.data.Dataset:
    """Hard-checkable language-ID gate (the lang_id analog of
    ``minhash_planted``): a corpus derived CLOSED-FORM from the documents
    table's doc_ids — doc ``d`` gets the template of language
    ``list(_LANGID_TEMPLATES)[d % 6]`` — run through the FULL
    ``textstats.analyze`` actor-pool pipeline. Template words are
    stopwords of exactly one language, so the expected label is a pure
    CASE on doc_id and the heuristic column leaves the rows-only list."""
    from .textstats import analyze

    ids = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    langs = list(_LANGID_TEMPLATES)
    templates = _LANGID_TEMPLATES

    def synth(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [templates[langs[d % 6]] for d in did.tolist()]
        return pa.table(
            {"doc_id": pa.array(did), "text": pa.array(texts, type=pa.string())}
        )

    corpus = ids.map_batches(synth, batch_format="pyarrow")
    return analyze(corpus).select_columns(["doc_id", "lang_id"])


def text_quality(sf_dir: str) -> ray.data.Dataset:
    """The SQL-expressible slice of the text-analysis stage, hard-checked:
    word count (letters-only tokens), punctuation ratio, EN-stopword
    ratio, and the composite quality score — all through the full
    ``textstats.analyze`` actor-pool pipeline. The genuinely heuristic
    columns (lang_id, BPE-ish token count — its regex needs lookahead,
    which DuckDB's RE2 lacks) stay rows-only in ``text_analysis``."""
    from .textstats import analyze

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = analyze(ds).select_columns(
        ["doc_id", "n_words", "punct_ratio", "stopword_ratio", "quality"]
    )

    def rounder(t: pa.Table) -> pa.Table:
        q = t.column("quality").to_numpy(zero_copy_only=False)
        # integer micro-units via floor(x·1e6 + 0.5): a plain ROUND at 9
        # decimals left the two sides one ulp apart at decimal boundaries
        # (0.342 vs 0.34199999999999997) — the half-up floor is identical
        # arithmetic in numpy and DuckDB
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": t.column("n_words"),
                "punct_ratio": pc.round(t.column("punct_ratio"), ROUND),
                "stopword_ratio": pc.round(t.column("stopword_ratio"), ROUND),
                "quality_micro": pa.array(
                    np.floor(q * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return out.map_batches(rounder, batch_format="pyarrow")


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition quality signals (top-token share, top-bigram
    share, duplicated-trigram fraction) per document, through the
    ``textstats.repetition`` actor-pool pipeline. Fractions are integer
    micro-units (floor(x*1e6+0.5)) so the DuckDB compare is exact — same
    arithmetic on both sides (int64 division in float64, half-up floor)."""
    from .textstats import repetition

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return repetition(ds).select_columns(
        [
            "doc_id",
            "n_words",
            "top_token_frac_micro",
            "top_bigram_frac_micro",
            "dup_trigram_frac_micro",
        ]
    )


def pr_superstep1_salted(sf_dir: str) -> ray.data.Dataset:
    """One superstep through the salted two-phase aggregation path
    (north-rule N9) — must equal pr_superstep1 exactly, and shares its SQL
    oracle."""
    from .pagerank import pagerank

    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    res = pagerank(enc, iterations=1, salted=True, heavy_indeg_threshold=8,
                   shuffle_aggregate=True)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(np.round(res.ranks, ROUND)),
            }
        )
    )


def pagerank10_bsp(sf_dir: str) -> ray.data.Dataset:
    """Full 10-superstep PageRank on the shard-actor BSP engine — must be
    bit-identical to the dataset engine (same unrolled-CTE SQL oracle;
    exactness also by pytest)."""
    from .bsp import BSPGraph

    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    g = BSPGraph(enc.materialize(), n=n, num_shards=4)
    ds, _, _ = g.pagerank(iterations=10)
    rank = np.empty(n)
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        rank[vid] = b.column("rank").to_numpy(zero_copy_only=False)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids.astype(np.int64), type=pa.int64()),
                "rank": pa.array(np.round(rank, ROUND)),
            }
        )
    )


def graph_stats(sf_dir: str) -> ray.data.Dataset:
    """R17 stats report: vertex/edge/sink counts + max id of the lineitem
    graph (SQL-checkable)."""
    edges, ids, enc, n, outdeg = _graph_arrays(sf_dir)
    n_edges = enc.count()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_vertices": pa.array([n], type=pa.int64()),
                "n_edges": pa.array([n_edges], type=pa.int64()),
                "n_sinks": pa.array([int((outdeg == 0).sum())], type=pa.int64()),
                "max_id": pa.array([int(ids.max())], type=pa.int64()),
            }
        )
    )


def prepleti_triple(sf_dir: str) -> ray.data.Dataset:
    """R18: one prepleti tripling round over the distinct lineitem graph,
    fully distributed (global max broadcast as a scalar; three shifted
    copies emitted per batch; duplicates kept — multigraph semantics,
    ref: prepleti.cpp:59-74). SQL-checkable as a UNION ALL."""
    edges = edges_project(sf_dir).materialize()
    mx = int(max(edges.max("src"), edges.max("dst")))

    def triple(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([s, mx + d + 1, mx + s + 1]), type=pa.int64()
                ),
                "dst": pa.array(np.concatenate([d, s, mx + d]), type=pa.int64()),
            }
        )

    return edges.map_batches(triple, batch_format="pyarrow")


def vocab_top50(sf_dir: str) -> ray.data.Dataset:
    """Top-50 corpus vocabulary (count DESC, token ASC) — the
    tokenizer-training vocabulary step, SQL-checkable via unnest."""
    from .textstats import vocab_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return vocab_topk(ds, k=50)


def tfidf_scores(sf_dir: str) -> ray.data.Dataset:
    """Inverted index + TF-IDF over the documents table: exact (doc_id,
    token, tf, df) postings plus tfidf = tf·ln(N/df) (rounded 9). tf is
    batch-local (a document lives in one row), df is the one groupby,
    the (token → df) vocabulary is broadcast once — see
    engine/textstats.py:tfidf_scores for the scale contract."""
    from .textstats import tfidf_scores as tfidf

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return tfidf(ds)


def doc_packing(sf_dir: str) -> ray.data.Dataset:
    """Token-budget sequence packing: documents concatenated in doc_id
    order and split into 2048-token chunks — each doc reports its
    whitespace token count, the exact tokens before it (distributed
    running total: one sort + O(blocks) offset chaining, engine/windows.py)
    and the chunk its first token lands in. SQL-checkable as a window
    running sum."""
    from .windows import pack_sequences

    counts = token_count(sf_dir)  # (doc_id, n_tokens), whitespace tokens
    return pack_sequences(counts, chunk_tokens=2048)


def bigram_top100(sf_dir: str) -> ray.data.Dataset:
    """Top-100 corpus bigrams (adjacent word pairs within a document) —
    n-gram language-model counts via the per-batch-combiner groupby."""
    from .textstats import bigram_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return bigram_topk(ds, k=100)


def heavy_hitter_tokens(sf_dir: str) -> ray.data.Dataset:
    """Exact corpus heavy hitters (count·100 > total tokens) through the
    two-pass candidate/verify pipeline — per-batch pigeonhole candidates,
    broadcast-candidate exact recount; the shuffle never sees the
    vocabulary (engine/textstats.py:heavy_hitter_tokens)."""
    from .textstats import heavy_hitter_tokens as hh

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return hh(ds, k=100)


def train_val_test_split(sf_dir: str) -> ray.data.Dataset:
    """Deterministic md5-bucket split assignment per document —
    repartition/reorder-stable, SQL-checkable via md5_number_lower."""
    from .textstats import train_split

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return train_split(ds)


# source-mixture rates (parts per million) for the mixture_sample query:
# exercises keep-all, three partial rates, drop-all, and the default
_MIXTURE_PPM = {
    "src0": 1_000_000,
    "src1": 750_000,
    "src2": 500_000,
    "src3": 250_000,
    "src4": 0,
}


def mixture_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic source-mixture reweighting (Pile/Dolma-style): keep
    each document iff md5-low-64(doc_id) % 1e6 < its source's ppm rate
    (sources outside _MIXTURE_PPM get 100_000 ppm). Stateless md5
    filter, exactly SQL-checkable."""
    from .textstats import mixture_sample as _mix

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return _mix(ds, _MIXTURE_PPM, default_ppm=100_000)


def token_histogram(sf_dir: str) -> ray.data.Dataset:
    """Whitespace-token-count histogram, 50-token bins — corpus length
    profile via per-batch partial bincounts + one tiny groupby Sum."""
    from .textstats import token_histogram as _th

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return _th(ds, bin_width=50)


def token_percentiles_by_source(sf_dir: str) -> ray.data.Dataset:
    """Per-source exact token-count percentiles (p50/p90/p99,
    percentile_disc) — one global (source, n) sort; the driver touches
    only per-block run-length summaries and 3 single-row picks per
    source."""
    from .textstats import grouped_token_percentiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    )
    return grouped_token_percentiles(ds, group_col="source")


def events_json_field_sum(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type SUM of the integer JSON field props.k plus row
    count — semi-structured (JSON string column) extraction: stateless
    per-batch parse emitting O(types) partial rows, tiny groupby Sum."""
    from .jsonops import json_field_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return json_field_sum(ds, json_col="props", field="k", group_col="event_type")


def _events_cents(sf_dir: str) -> ray.data.Dataset:
    """(event_id, user_id, ts_us, cents) projection of events — the
    shared integer-exact shape for the window-function queries."""
    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def events_rolling_sum5(sf_dir: str) -> ray.data.Dataset:
    """Rolling 5-event window sum of value-cents per user (the SQL
    ``SUM(v) OVER (PARTITION BY user ORDER BY ts, id ROWS BETWEEN 4
    PRECEDING AND CURRENT ROW)``): one global sort + per-block
    cumsum-diff with O(blocks × window) driver metadata."""
    from .windows import rolling_sum_per_key

    return rolling_sum_per_key(
        _events_cents(sf_dir),
        key_col="user_id",
        order_col="ts_us",
        value_col="cents",
        window=5,
        out_col="rolling_cents",
        tie_col="event_id",
    )


def events_latest_per_user(sf_dir: str) -> ray.data.Dataset:
    """Latest-record compaction (CDC upsert semantics): per user the
    single most recent event by (ts, event_id) — grouped top-1 via the
    per-batch k-prune combiner, never a per-group materialization."""
    from .topk import topk_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )
    return topk_per_group(ev, key_col="user_id", order_col="ts_us", k=1)


def doc_ntile4(sf_dir: str) -> ray.data.Dataset:
    """Per-source NTILE(4) equi-depth length bands over documents —
    distributed grouped NTILE from sorted-block boundary metadata (no
    per-group materialization; a 100-TB source stays sharded)."""
    from .ntile import ntile_per_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return ntile_per_key(
        docs, key_col="source", order_cols=["n_chars", "doc_id"], k=4,
        out_col="quartile",
    )


def events_daily_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot / conditional aggregation: per day, one count column per
    event type plus the exact purchase value-cents sum — per-batch
    combiner, O(days × blocks) shuffle."""
    from .summarize import pivot_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def day_of(t: pa.Table) -> np.ndarray:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        return us // 86_400_000_000

    return pivot_counts(
        ev,
        day_of,
        type_col="event_type",
        types=("click", "error", "purchase", "signup", "view"),
        group_name="day",
        value_col="value",
        value_type="purchase",
        value_name="purchase_cents",
    )


def winnow_fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Winnowing (SIGMOD-03) rolling-hash document fingerprints: distinct
    (doc_id, pos, hash) of each 4-window's rightmost-minimal md5 4-gram
    hash — stateless map_batches, SQL-exact via md5_number_lower."""
    from .winnow import winnow_fingerprints as _wf

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return _wf(docs, k=4, w=4)


def twohop_counts(sf_dir: str) -> ray.data.Dataset:
    """Distinct 2-hop neighbor count per order on the bipartite graph
    (other orders sharing a part): grouped pair expansion → packed-key
    sort-distinct → per-batch count combiner."""
    from .neighborhood import twohop_counts as _th

    return _th(edges_project(sf_dir))


def adamic_adar_top100(sf_dir: str) -> ray.data.Dataset:
    """Top-100 Adamic-Adar link-prediction scores on the bipartite graph
    (orders weighted by shared-part rarity): grouped pair expansion with
    integer nano-unit weights → exact pair sums → global top-k."""
    from .neighborhood import adamic_adar_topk

    return adamic_adar_topk(edges_project(sf_dir), k=100)


def doc_zscore(sf_dir: str) -> ray.data.Dataset:
    """Per-source z-score standardization of n_chars (feature
    normalization): exact integer moment combiner → tiny broadcast →
    streamed map; float ops mirror the oracle's order exactly."""
    from .textstats import grouped_zscore

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return grouped_zscore(docs, group_col="source", value_col="n_chars")


def documents_profile(sf_dir: str):
    """Data-quality profile of the documents table: row/null/empty
    counts, exact distinct lang/source, n_chars min/max — the ingestion
    validation report, O(metrics) output assembled from scalars."""
    from .profile import table_profile

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return table_profile(
        ds,
        null_cols=["text", "lang", "source"],
        empty_text_cols=["text"],
        distinct_cols=["lang", "source"],
        minmax_cols=["n_chars"],
    )


def user_event_seq(sf_dir: str) -> ray.data.Dataset:
    """Behavioral-sequence feature: per user, the '>'-joined sequence of
    the FIRST five event types in (ts, event_id) order — distributed
    grouped top-5 (per-batch k-prune combiner) bounds the shuffle to
    5 rows/user before the tiny per-group concat."""
    import pandas as pd

    from .topk import topk_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )
    first5 = topk_per_group(
        ev, key_col="user_id", order_col="ts_us", k=5, descending=False
    )

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"])
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "seq": [">".join(g["event_type"])],
            }
        )

    return first5.groupby("user_id").map_groups(concat, batch_format="pandas")


def orders_above_cust_avg(sf_dir: str) -> ray.data.Dataset:
    """Groupwise-comparison filter: orders whose total strictly exceeds
    their customer's average — one sort + O(blocks) boundary-run
    metadata (engine/ntile.py), no per-customer broadcast or join."""
    from .ntile import filter_above_key_mean

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("o_totalprice"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return filter_above_key_mean(orders, key_col="o_custkey", value_col="cents")


def user_growth_curve(sf_dir: str) -> ray.data.Dataset:
    """Retention analytics: per day, new users (first-ever event that
    day) and the cumulative user count — per-batch min combiner → tiny
    per-user Min groupby → day-count combiner → running total."""
    from ray.data.aggregate import Min, Sum

    from .windows import running_total

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def min_partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        usv, uss = u[order], us[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(usv[1:] != usv[:-1]) + 1))
            if len(usv)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(usv[starts] if len(usv) else usv),
                "m": pa.array(
                    np.minimum.reduceat(uss, starts) if len(usv) else uss
                ),
            }
        )

    firsts = (
        ev.map_batches(min_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("m", alias_name="m"))
    )

    def day_counts(t: pa.Table) -> pa.Table:
        day = (
            t.column("m").to_numpy(zero_copy_only=False) // 86_400_000_000
        ).astype(np.int64)
        d, c = np.unique(day, return_counts=True)
        return pa.table(
            {"day": pa.array(d), "new_users": pa.array(c.astype(np.int64))}
        )

    daily = (
        firsts.map_batches(day_counts, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("new_users", alias_name="new_users"))
    )
    return running_total(
        daily, order_col="day", value_col="new_users",
        out_col="cum_users", exclusive=False,
    )


def jaccard_pairs_08(sf_dir: str) -> ray.data.Dataset:
    """Exact set-similarity self-join (AllPairs/PPJoin prefix filter):
    all document pairs with token-set Jaccard >= 0.8 — the exact
    counterpart to the MinHash-LSH path, same tokenization."""
    from .simjoin import jaccard_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return jaccard_join(docs, threshold=0.8)


def docs_cube_counts(sf_dir: str) -> ray.data.Dataset:
    """OLAP CUBE over (lang, source): document counts at every grouping
    granularity with 'ALL' roll-up sentinels — per-batch combiner,
    O(combos × blocks) shuffle."""
    from .summarize import rollup_counts

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    )
    return rollup_counts(docs, ["lang", "source"])


def doc_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """Global PERCENT_RANK of documents by (n_chars, doc_id) — the CDF /
    quantile-normalization transform from one sort + O(blocks) row-count
    metadata."""
    from .windows import global_percent_rank

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return global_percent_rank(docs, ["n_chars", "doc_id"])


def dominant_lang_per_source(sf_dir: str) -> ray.data.Dataset:
    """Most common language per source (grouped argmax / SQL mode with
    count-desc, lang-asc ties) — the data-mixture report a corpus
    pipeline runs before sampling."""
    from .summarize import grouped_mode

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )
    return grouped_mode(docs, "source", "lang", out_n="n")


def distinct_users_per_type(sf_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT user_id) per event type via the packed
    sort-based DISTINCT (no hash aggregate on the big input)."""
    from .summarize import grouped_count_distinct

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return grouped_count_distinct(ev, "event_type", "user_id", "n_users")


def avg_nbr_indeg(sf_dir: str) -> ray.data.Dataset:
    """Average in-degree of each vertex's out-neighbors on the lineitem
    link graph (popularity-of-referenced-parts feature): sorted grouped
    count + one hash join + one sort amortized over both per-src sums."""
    from .neighborhood import avg_neighbor_degree

    return avg_neighbor_degree(edges_project(sf_dir))


def canonical_dedup_docs(sf_dir: str) -> ray.data.Dataset:
    """Case/whitespace-canonicalized exact dedup over documents (the
    dedup tier between byte-exact sha256 and MinHash)."""
    from .dedup import canonical_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return canonical_dedup(docs)


def jsonl_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """JSONL sink → source roundtrip of the documents table: distributed
    per-block write (pandas C serializer) under /tmp, read back with
    pyarrow's C JSON parser — output must equal the parquet original."""
    import hashlib as _hl

    from .jsonl import read_jsonl, write_jsonl

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = f"/tmp/graft_jsonl/{_hl.md5(sf_dir.encode()).hexdigest()[:10]}"
    write_jsonl(docs, out, clean=True)
    return read_jsonl(out)


def events_value_deciles(sf_dir: str) -> ray.data.Dataset:
    """Global equi-depth decile report over event values (NTILE(10) on
    the unique (value, event_id) order): count, min, max per bucket —
    the quantile-bucketing step of a curriculum/binning pipeline. One
    sort + O(blocks) offsets; the 10-group aggregate is a per-batch
    partial → tiny groupby."""
    from ray.data.aggregate import Max, Min
    from ray.data.aggregate import Sum as _Sum

    from .windows import global_ntile

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )
    b = global_ntile(ev, ["value", "event_id"], 10, out_col="decile")

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("decile").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        u, inv = np.unique(d, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        vmin = np.full(len(u), np.inf)
        vmax = np.full(len(u), -np.inf)
        np.minimum.at(vmin, inv, v)
        np.maximum.at(vmax, inv, v)
        return pa.table(
            {
                "decile": pa.array(u),
                "n": pa.array(n),
                "vmin": pa.array(vmin),
                "vmax": pa.array(vmax),
            }
        )

    agg = (
        b.map_batches(partial, batch_format="pyarrow")
        .groupby("decile")
        .aggregate(
            _Sum("n", alias_name="n"),
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"),
        )
    )

    def rounded(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "decile": t.column("decile"),
                "n": t.column("n"),
                "vmin": pa.array(
                    np.round(
                        t.column("vmin").to_numpy(zero_copy_only=False), ROUND
                    )
                ),
                "vmax": pa.array(
                    np.round(
                        t.column("vmax").to_numpy(zero_copy_only=False), ROUND
                    )
                ),
            }
        )

    return agg.map_batches(rounded, batch_format="pyarrow")


_FK_RELATIONS = [
    # (name, left table, left key, right table, right key)
    ("lineitem_to_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders_to_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem_to_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("customer_without_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("part_without_lineitems", "part", "p_partkey", "lineitem", "l_partkey"),
    ("events_to_customer", "events", "user_id", "customer", "c_custkey"),
]


def fk_orphan_report(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit (ingestion validation): for each
    relation, the count of DISTINCT left keys and of distinct left keys
    with no match on the right — FK directions must be 0, the reverse
    directions (customers without orders, unreferenced parts) are the
    coverage report. All counts ride the sort-based set ops
    (engine/setops.py) and sorted DISTINCT — no hash join, no hash
    aggregate, O(metrics) driver assembly."""
    from . import graph as _G
    from .setops import except_keys

    def keyed(table: str, col: str) -> ray.data.Dataset:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def proj(t: pa.Table, c=col) -> pa.Table:
            return pa.table(
                {"k": pa.array(np.unique(t.column(c).to_numpy(zero_copy_only=False)))}
            )

        return ds.map_batches(proj, batch_format="pyarrow")

    names, n_keys, n_orphans = [], [], []
    for name, lt, lk, rt, rk in _FK_RELATIONS:
        # one distinct pass per side: the sorted-distinct blocks give
        # n_keys AND are exactly the already-deduped "a" side the EXCEPT
        # needs (except is distinct-key semantics) — no re-read, no
        # second full-size sort of the left table
        refs, counts = _G._sorted_distinct_refs(keyed(lt, lk), "k")
        names.append(name)
        n_keys.append(int(sum(counts)))
        left_d = (
            ray.data.from_arrow_refs(refs)
            if refs
            else ray.data.from_arrow(
                pa.schema([("k", pa.int64())]).empty_table()
            )
        )
        n_orphans.append(except_keys(left_d, keyed(rt, rk), "k").count())
    return ray.data.from_arrow(
        pa.table(
            {
                "relation": pa.array(names, pa.string()),
                "n_keys": pa.array(n_keys, pa.int64()),
                "n_orphan_keys": pa.array(n_orphans, pa.int64()),
            }
        )
    )


def degree_assortativity(sf_dir: str) -> ray.data.Dataset:
    """Degree-degree correlation of the link graph: Pearson over edges
    between outdeg(src) and indeg(dst) — "do high-degree sources point
    at popular targets". Two sorted grouped counts, two joins to carry
    the V-sized degree tables onto the E-sized edges, then the exact
    integer-moment Pearson (single key)."""
    from .ntile import grouped_sum_sorted
    from .summarize import grouped_pearson

    edges = edges_project(sf_dir)

    def with_ones(t: pa.Table) -> pa.Table:
        return t.append_column("_1", pa.array(np.ones(len(t), np.int64)))

    ones = edges.map_batches(with_ones, batch_format="pyarrow")
    outdeg = grouped_sum_sorted(ones, "src", "_1", out_col="x")
    indeg = grouped_sum_sorted(ones, "dst", "_1", out_col="y")
    parts = G.join_partitions_for(edges)
    e = edges.join(outdeg, join_type="inner", num_partitions=parts, on=("src",))
    e = e.join(indeg, join_type="inner", num_partitions=parts, on=("dst",))

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(["all"] * len(t), pa.string()),
                "x": t.column("x"),
                "y": t.column("y"),
            }
        )

    return grouped_pearson(
        e.map_batches(keyed, batch_format="pyarrow"), "k", "x", "y"
    )


def bfs_depth_histogram(sf_dir: str) -> ray.data.Dataset:
    """BFS reachability profile: vertex count per hop distance from the
    smallest vertex id (composition over the BSP BFS)."""
    from ray.data.aggregate import Sum as _Sum

    b = bfs_hops(sf_dir)

    def part(t: pa.Table) -> pa.Table:
        d, c = np.unique(
            t.column("dist").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {"dist": pa.array(d), "n_vertices": pa.array(c.astype(np.int64))}
        )

    return (
        b.map_batches(part, batch_format="pyarrow")
        .groupby("dist")
        .aggregate(_Sum("n_vertices", alias_name="n_vertices"))
    )


def csv_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """CSV sink → source roundtrip of the documents table (quoted
    multi-line text survives via pyarrow's newlines_in_values; the read
    pins the writer's schema so per-part type inference can't drift)."""
    import hashlib as _hl

    import pyarrow.parquet as pq

    from .csvio import read_csv, write_csv

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = f"/tmp/graft_csv/{_hl.md5(sf_dir.encode()).hexdigest()[:10]}"
    write_csv(docs, out, clean=True)
    return read_csv(out, schema=pq.read_schema(f"{sf_dir}/documents.parquet"))


def value_hour_corr_by_type(sf_dir: str) -> ray.data.Dataset:
    """Grouped Pearson correlation between event value (exact cents)
    and hour-of-day, per event type — exact integer moments, float only
    on the final tiny result."""
    from .summarize import grouped_pearson

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def quantize(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "x": pa.array(np.round(v * 100).astype(np.int64)),
                "y": pa.array((us // 3_600_000_000) % 24),
            }
        )

    return grouped_pearson(
        ev.map_batches(quantize, batch_format="pyarrow"), "event_type", "x", "y"
    )


def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix: users bucketed by first-seen day, then
    per (cohort_day, active day) the distinct-active-user count.
    Distinct (user, day) pairs via the packed sort-based DISTINCT;
    first-seen via the sorted grouped MIN (no hash aggregate on the
    user-sized side); one user-keyed hash join; O(days²) final combos."""
    from . import graph as _G
    from .ntile import grouped_sums_sorted

    _DAY_US = 86_400_000_000
    _PACK = np.int64(1 << 21)  # day < 2^21 (year ~7700), user < 2^42

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def pack(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
            // _DAY_US
        )
        if len(u) and (u.max() >= (1 << 42) or day.max() >= (1 << 21)):
            raise ValueError("cohort_retention: pack range exceeded")
        return pa.table({"k": pa.array(np.unique(u * _PACK + day))})

    refs, _c = _G._sorted_distinct_refs(
        ev.map_batches(pack, batch_format="pyarrow"), "k"
    )
    out_schema = pa.schema(
        [
            ("cohort_day", pa.int64()),
            ("day", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def unpack(tbl: pa.Table) -> pa.Table:
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(k // _PACK),
                "day": pa.array(k % _PACK),
            }
        )

    pairs = ray.data.from_arrow_refs([unpack.remote(r) for r in refs])
    firsts = grouped_sums_sorted(
        pairs, "user_id", ["day"], ["cohort_day"], op="min"
    )
    joined = pairs.join(
        firsts,
        join_type="inner",
        num_partitions=G.join_partitions_for(pairs),
        on=("user_id",),
    )

    def combo(t: pa.Table) -> pa.Table:
        c = t.column("cohort_day").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        key = c * _PACK + d
        u, n = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(u // _PACK),
                "day": pa.array(u % _PACK),
                "n_users": pa.array(n.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    return (
        joined.map_batches(combo, batch_format="pyarrow")
        .groupby(["cohort_day", "day"])
        .aggregate(_Sum("n_users", alias_name="n_users"))
    )


def length_band_docs(sf_dir: str) -> ray.data.Dataset:
    """Per-source length-band curation: docs whose token count is within
    their own source's [p5, p95] (percentile_disc) band — grouped
    percentile profile → tiny broadcast → streamed filter."""
    from .textstats import length_band_filter

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return length_band_filter(ds, group_col="source", lo=0.05, hi=0.95)


def cms_registers_tokens(sf_dir: str) -> ray.data.Dataset:
    """Count-min sketch (depth 4 × width 1024) of document token
    frequencies — the bounded-state frequency sketch; registers are
    exactly SQL-reproducible (md5-low-64 of "r:token" per row)."""
    from .sketch import cms_registers

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return cms_registers(ds, depth=4, width=1024)


def epoch_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Deterministic epoch-shuffle training order (seed 7): global
    0-based pos in md5-low-64("7:"+doc_id)%2^63 order, assigned from
    O(blocks) sorted-block metadata — one sort, bit-reproducible across
    partitionings (unlike Dataset.random_shuffle)."""
    from .textstats import epoch_shuffle as _sh

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )
    return _sh(ds, seed=7)


def token_percentiles(sf_dir: str) -> ray.data.Dataset:
    """Exact p50/p90/p99 whitespace-token-count percentiles via
    distributed sort + block-metadata indexing (percentile_disc
    semantics)."""
    from .textstats import token_count_percentiles

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    return token_count_percentiles(ds)


def events_top3_per_user(sf_dir: str) -> ray.data.Dataset:
    """Top-3 events per user by (value DESC, ts ASC) through the
    distributed grouped-top-k operator (the 'best N rows per key'
    curation primitive) — SQL-checkable via ROW_NUMBER."""
    from .topk import topk_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    top = topk_per_group(ev, key_col="user_id", order_col="value", k=3)

    def conv(t: pa.Table) -> pa.Table:
        sec = pc.divide(pc.cast(t.column("ts"), pa.int64()), 1_000_000)
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("value"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "sec": pc.cast(sec, pa.int64()),
                "value_cents": cents,
            }
        )

    return top.map_batches(conv, batch_format="pyarrow")


def events_tumbling(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window aggregate over the events stream table
    (count + value sum per user per window; SQL-checkable)."""
    from .windows import tumbling_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return tumbling_window(ev, window_sec=3600)


def events_hopping(sf_dir: str) -> ray.data.Dataset:
    """Hopping (sliding) 1-hour window with a 15-min hop: each event lands
    in 4 overlapping windows (vectorized repeat), then the same hash
    groupby as the tumbling case. SQL-checkable via generate_series."""
    from .windows import hopping_window

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return hopping_window(ev, window_sec=3600, hop_sec=900)


def events_sessions(sf_dir: str) -> ray.data.Dataset:
    """Session windows (30-min inactivity gap) over events (rows-only;
    exactness by pytest vs a pandas oracle)."""
    from .windows import session_windows

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return session_windows(ev, gap_sec=1800)


def events_funnel(sf_dir: str) -> ray.data.Dataset:
    """view → click → purchase funnel over the events table
    (engine/windows.py funnel): per user, the number of steps completed
    in order with strictly increasing ts under greedy-earliest matching,
    each step within 1 day of the previous — exactly the chained-MIN
    SQL cascade (the window keeps the synthetic corpus's stage mix
    non-degenerate: ~90/35/25 across stages at sf0.01)."""
    from .windows import funnel

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel(ev, steps=("view", "click", "purchase"), within_sec=86400)


def _pagerank_unrolled_sql(iters: int, decimals: int = ROUND) -> str:
    """DuckDB oracle for ``iters`` full PageRank supersteps, iteration
    unrolled as chained CTEs (DuckDB 1.0 disallows aggregates in recursive
    CTE terms). Mirrors the engine exactly: rank0 = 1/n, then
    rank_k(v) = ((1-d) + d*Σ_sink rank_{k-1})/n + d*Σ_{u→v} rank_{k-1}(u)/outdeg(u).
    Final ranks rounded to ``decimals`` on both sides (summation-order
    insensitivity, see module docstring)."""
    d = "0.85"
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM v)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""s{k} AS MATERIALIZED (SELECT ((1.0 - {d}) + {d} * COALESCE(
                    (SELECT SUM(rank) FROM r{p}
                     WHERE vid NOT IN (SELECT src FROM e)), 0.0))
                    / (SELECT n FROM nn) AS s),
        m{k} AS MATERIALIZED (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS m
                 FROM e JOIN r{p} r ON e.src = r.vid
                 JOIN deg ON e.src = deg.src
                 GROUP BY e.dst),
        r{k} AS MATERIALIZED (SELECT v.vid,
                        (SELECT s FROM s{k}) + {d} * COALESCE(m{k}.m, 0.0)
                            AS rank
                 FROM v LEFT JOIN m{k} ON v.vid = m{k}.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid, ROUND(rank, {decimals}) AS rank FROM r{iters}"
    )


def _ppr_unrolled_sql(iters: int, decimals: int = ROUND) -> str:
    """DuckDB oracle for personalized PageRank (teleport mass entirely on
    the smallest-id vertex), unrolled like ``_pagerank_unrolled_sql`` but
    with base ``coef · t(v)`` where coef = (1-d) + d·Σ_sink rank and
    t = 1 at the seed, 0 elsewhere; rank_0 = t."""
    d = "0.85"
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        seed AS MATERIALIZED (SELECT MIN(vid) AS s FROM v),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS MATERIALIZED (
            SELECT vid,
                   CASE WHEN vid = (SELECT s FROM seed)
                        THEN 1.0 ELSE 0.0 END AS rank
            FROM v)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""s{k} AS MATERIALIZED (
                SELECT (1.0 - {d}) + {d} * COALESCE(
                    (SELECT SUM(rank) FROM r{p}
                     WHERE vid NOT IN (SELECT src FROM e)), 0.0) AS c),
        m{k} AS MATERIALIZED (
                SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS m
                FROM e JOIN r{p} r ON e.src = r.vid
                JOIN deg ON e.src = deg.src
                GROUP BY e.dst),
        r{k} AS MATERIALIZED (
                SELECT v.vid,
                       CASE WHEN v.vid = (SELECT s FROM seed)
                            THEN (SELECT c FROM s{k}) ELSE 0.0 END
                       + {d} * COALESCE(m{k}.m, 0.0) AS rank
                FROM v LEFT JOIN m{k} ON v.vid = m{k}.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid, ROUND(rank, {decimals}) AS rank FROM r{iters}"
    )


def _cc_unrolled_sql(rounds: int) -> str:
    """DuckDB oracle for connected components: ``rounds`` unrolled
    min-label-propagation steps over the symmetrized edge set (label =
    smallest original id reachable within ``rounds`` hops == component min
    once ``rounds`` ≥ the labelling radius; the engine converges in ~9
    rounds at sf0.1, so the unroll depth carries slack)."""
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        l0 AS MATERIALIZED (SELECT vid, vid AS label FROM v)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""l{k} AS MATERIALIZED (SELECT vid, MIN(label) AS label FROM (
                    SELECT vid, label FROM l{p}
                    UNION ALL
                    SELECT ue.dst AS vid, l.label
                    FROM ue JOIN l{p} l ON ue.src = l.vid
                 ) AS t GROUP BY vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid, label FROM l{rounds}"
    )


def _wpr_unrolled_sql(iters: int, decimals: int = ROUND) -> str:
    """DuckDB oracle for weighted PageRank (weights = lineitem pair
    multiplicity). The contribution term is written
    ``r.rank * (e.w * (1.0 / ws.ws))`` — the engine's exact operation
    order (coefficient built once as w·(1/wsum)) — so per-term doubles
    match bit-for-bit and only summation order differs (absorbed by the
    ROUND)."""
    d = "0.85"
    parts = [
        f"""e AS MATERIALIZED (SELECT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst,
                 CAST(COUNT(*) AS DOUBLE) AS w
                 FROM lineitem GROUP BY 1, 2),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
        ws AS MATERIALIZED (SELECT src, SUM(w) AS ws FROM e GROUP BY src),
        r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM v)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""s{k} AS MATERIALIZED (SELECT ((1.0 - {d}) + {d} * COALESCE(
                    (SELECT SUM(rank) FROM r{p}
                     WHERE vid NOT IN (SELECT src FROM e)), 0.0))
                    / (SELECT n FROM nn) AS s),
        m{k} AS MATERIALIZED (SELECT e.dst AS vid,
                 SUM(r.rank * (e.w * (1.0 / ws.ws))) AS m
                 FROM e JOIN r{p} r ON e.src = r.vid
                 JOIN ws ON e.src = ws.src
                 GROUP BY e.dst),
        r{k} AS MATERIALIZED (SELECT v.vid,
                        (SELECT s FROM s{k}) + {d} * COALESCE(m{k}.m, 0.0)
                            AS rank
                 FROM v LEFT JOIN m{k} ON v.vid = m{k}.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid, ROUND(rank, {decimals}) AS rank FROM r{iters}"
    )


def _hits_unrolled_sql(iters: int) -> str:
    """DuckDB oracle for unnormalized HITS: exact-integer iterates (init
    1), auth-then-hub update order, vertices with no contributing edges
    get 0. SUM over BIGINT returns HUGEINT in DuckDB — cast back so the
    schema matches the engine's int64."""
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        h0 AS MATERIALIZED (SELECT vid, CAST(1 AS BIGINT) AS h FROM v)"""
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"""a{k} AS MATERIALIZED (
                 SELECT v.vid, CAST(COALESCE(s.x, 0) AS BIGINT) AS a
                 FROM v LEFT JOIN (
                     SELECT e.dst AS vid, SUM(h.h) AS x
                     FROM e JOIN h{p} h ON e.src = h.vid GROUP BY e.dst
                 ) s ON v.vid = s.vid),
        h{k} AS MATERIALIZED (
                 SELECT v.vid, CAST(COALESCE(s.x, 0) AS BIGINT) AS h
                 FROM v LEFT JOIN (
                     SELECT e.src AS vid, SUM(a.a) AS x
                     FROM e JOIN a{k} a ON e.dst = a.vid GROUP BY e.src
                 ) s ON v.vid = s.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"""
        SELECT v.vid, a.a AS auth, h.h AS hub
        FROM v JOIN a{iters} a ON v.vid = a.vid
               JOIN h{iters} h ON v.vid = h.vid"""
    )


def _bfs_unrolled_sql(rounds: int, source_pred: str | None = None) -> str:
    """DuckDB oracle for BFS from the smallest vertex id (default) or any
    SQL source predicate over ``vid`` (multi-source = distance to the
    nearest matching source): ``rounds`` unrolled min-plus steps
    (dist_{k} = min(dist_{k-1}, 1 + min over in-neighbors' dist_{k-1}))
    over the symmetrized edge set. NULL = unreached (MIN ignores NULLs;
    an all-NULL group stays NULL), so the final projection drops
    unreached vertices — matching the engine's sentinel filter. Fixpoints
    are stable, so extra rounds are no-ops whenever the true eccentricity
    ≤ ``rounds`` (guarded at query time in bfs_hops / bfs_multi3)."""
    if source_pred is None:
        source_pred = "vid = (SELECT MIN(vid) FROM v)"
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        d0 AS MATERIALIZED (SELECT vid,
                 CASE WHEN {source_pred} THEN 0 END AS dist
                 FROM v)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""d{k} AS MATERIALIZED (SELECT vid, MIN(dist) AS dist FROM (
                    SELECT vid, dist FROM d{p}
                    UNION ALL
                    SELECT ue.dst AS vid, d.dist + 1
                    FROM ue JOIN d{p} d ON ue.src = d.vid
                    WHERE d.dist IS NOT NULL
                 ) AS t GROUP BY vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"""
        SELECT vid, CAST(dist AS BIGINT) AS dist
        FROM d{rounds} WHERE dist IS NOT NULL"""
    )


def _sssp_unrolled_sql(rounds: int) -> str:
    """DuckDB oracle for single-source WEIGHTED shortest paths from the
    smallest vertex id: ``rounds`` unrolled min-plus steps (dist_k =
    min(dist_{k-1}, min over in-neighbors of dist_{k-1} + w)) over the
    symmetrized edge set. Weights reproduce the engine's in-shard
    derivation exactly: dense vid = 0-based rank of the original id
    (ROW_NUMBER over ORDER BY vid — the engine's dictionary is sorted),
    then w = 1 + ((min(dv) % 97) * 31 + max(dv) % 89) % 9 per unordered
    pair. NULL = unreached; fixpoints are stable so extra rounds are
    no-ops (depth guarded at query time in sssp_weighted)."""
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        ue AS MATERIALIZED (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        vm AS MATERIALIZED (SELECT vid,
                 ROW_NUMBER() OVER (ORDER BY vid) - 1 AS dv FROM v),
        we AS MATERIALIZED (SELECT ue.src, ue.dst,
                 1 + ((LEAST(s.dv, t.dv) % 97) * 31
                      + GREATEST(s.dv, t.dv) % 89) % 9 AS w
                 FROM ue JOIN vm s ON ue.src = s.vid
                         JOIN vm t ON ue.dst = t.vid),
        d0 AS MATERIALIZED (SELECT vid,
                 CASE WHEN vid = (SELECT MIN(vid) FROM v) THEN 0 END AS dist
                 FROM v)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""d{k} AS MATERIALIZED (SELECT vid, MIN(dist) AS dist FROM (
                    SELECT vid, dist FROM d{p}
                    UNION ALL
                    SELECT we.dst AS vid, d.dist + we.w
                    FROM we JOIN d{p} d ON we.src = d.vid
                    WHERE d.dist IS NOT NULL
                 ) AS t GROUP BY vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"""
        SELECT vid, CAST(dist AS BIGINT) AS dist
        FROM d{rounds} WHERE dist IS NOT NULL"""
    )


def _lpa_unrolled_sql(rounds: int) -> str:
    """DuckDB oracle for synchronous label propagation, ``rounds`` unrolled
    steps. Mirrors engine/labelprop.py exactly: each round every vertex
    takes the most frequent label among its neighbors' previous-round
    labels over the symmetrized simple graph, ties broken by the SMALLEST
    label (the engine's packed-score argmax picks (max count, min dense
    label); dense vids are order-isomorphic to original ids, so ORDER BY
    c DESC, label ASC selects the same winner)."""
    parts = [
        f"""e AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem),
        ue AS MATERIALIZED (SELECT src, dst FROM e
                            UNION ALL SELECT dst, src FROM e),
        v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        l0 AS MATERIALIZED (SELECT vid, vid AS label FROM v)"""
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""b{k} AS MATERIALIZED (
                 SELECT vid, label FROM (
                     SELECT dst AS vid, label, ROW_NUMBER() OVER (
                         PARTITION BY dst ORDER BY c DESC, label ASC) AS rn
                     FROM (SELECT ue.dst, l.label, COUNT(*) AS c
                           FROM ue JOIN l{p} l ON ue.src = l.vid
                           GROUP BY ue.dst, l.label) AS t
                 ) AS r WHERE rn = 1),
        l{k} AS MATERIALIZED (
                 SELECT l.vid, COALESCE(b{k}.label, l.label) AS label
                 FROM l{p} l LEFT JOIN b{k} ON l.vid = b{k}.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid, label FROM l{rounds}"
    )


def _events_stream(sf_dir: str, etype: str) -> ray.data.Dataset:
    """One event-type slice of the events table as a keyed, timestamped
    stream: (event_id, user_id, ts_us int64 epoch-microseconds)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), etype))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        )

    return ev.map_batches(f, batch_format="pyarrow")


def events_asof_join(sf_dir: str) -> ray.data.Dataset:
    """Backward as-of join: each purchase event matched to the user's
    most recent click at-or-before it (ties by largest click event_id)
    through the sorted-block distributed as-of operator — SQL-checkable
    via a ROW_NUMBER formulation (equivalently DuckDB's ASOF JOIN, which
    leaves equal-timestamp winners unspecified; the ROW_NUMBER oracle
    pins them)."""
    from .joins import asof_join

    return asof_join(
        _events_stream(sf_dir, "purchase"),
        _events_stream(sf_dir, "click"),
        key_col="user_id",
        on_col="ts_us",
        left_cols=["user_id", "ts_us", "event_id"],
        right_cols=["user_id", "ts_us", "event_id"],
        tie_col="event_id",
    )


def events_range_join(sf_dir: str) -> ray.data.Dataset:
    """Banded range join: all (purchase, click) pairs of the same user
    within ±6 hours, via bucket-replicated co-grouping (right side
    replicated to bucket ±1; every qualifying pair meets exactly once)."""
    from .joins import range_join

    return range_join(
        _events_stream(sf_dir, "purchase"),
        _events_stream(sf_dir, "click"),
        key_col="user_id",
        on_col="ts_us",
        window=6 * 3600 * 1_000_000,
        left_cols=["user_id", "ts_us", "event_id"],
        right_cols=["user_id", "ts_us", "event_id"],
    )


def events_user_sample_5(sf_dir: str) -> ray.data.Dataset:
    """Deterministic per-key capped sample (reservoir-style): up to 5
    events per user, chosen by the smallest md5-low-63 of event_id — the
    stratified 'N examples per key' curation primitive. Stateless and
    reorder/repartition-stable (same hash family as the split/sample
    ops); the cap itself runs through the distributed grouped-top-k
    operator, so no per-key volume ever concentrates on one task."""
    import hashlib

    from .topk import topk_per_group

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id"]
    )

    def add_h(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[8:], "little"
                )
                % (1 << 63)
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return t.append_column("h63", pa.array(h))

    withh = ev.map_batches(add_h, batch_format="pyarrow")
    return topk_per_group(
        withh, key_col="user_id", order_col="h63", k=5, descending=False
    )


def events_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 10% Bernoulli sample of events: keep rows where
    md5-low-64(str(event_id)) % 10 == 0 (== DuckDB md5_number_lower).
    Reorder/repartition-stable — the resumable-sampling property a 100-TB
    pipeline needs (no RNG state, no global pass); same hash family as
    the train/val/test split (engine/textstats.train_split)."""
    import hashlib

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def f(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[8:], "little"
                )
                % 10
                for i in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        t = t.filter(pa.array(h == 0))
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("value"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "value_cents": cents,
            }
        )

    return ev.map_batches(f, batch_format="pyarrow")


def kcore_3(sf_dir: str) -> ray.data.Dataset:
    """Vertices of the 3-core of the bipartite lineitem graph (iterative
    degree peeling, engine/kcore.py) — oracle-checked against unrolled
    peel-round SQL with the same convergence-depth guard as cc_labels."""
    from .kcore import kcore_vertices_dataset

    ds, rounds = kcore_vertices_dataset(edges_project(sf_dir), k=3)
    # rounds counts the final no-change pass; effective peels = rounds - 1
    if rounds - 1 > _KCORE_ORACLE_ROUNDS:
        raise RuntimeError(
            f"kcore_3 peeled {rounds - 1} rounds but the SQL oracle "
            f"unrolls only {_KCORE_ORACLE_ROUNDS} — raise "
            "_KCORE_ORACLE_ROUNDS"
        )
    return ds


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """Unrolled peeling: d_r = vertices with undirected degree >= k in
    e_{r-1}; e_r = edges of e_{r-1} with both endpoints in d_r. Stable
    sets are fixpoints, so extra unrolled rounds are no-ops and the final
    d_R is the k-core whenever the true peel depth <= R (guarded at query
    time in kcore_3)."""
    parts = [
        f"""e0 AS MATERIALIZED (SELECT DISTINCT l_orderkey AS src,
                 l_partkey + {PART_OFFSET} AS dst FROM lineitem)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""d{r} AS MATERIALIZED (
                 SELECT vid FROM (SELECT src AS vid FROM e{p}
                                  UNION ALL SELECT dst FROM e{p}) AS u
                 GROUP BY vid HAVING COUNT(*) >= {k}),
        e{r} AS MATERIALIZED (
                 SELECT e.src, e.dst FROM e{p} e
                 JOIN d{r} a ON e.src = a.vid
                 JOIN d{r} b ON e.dst = b.vid)"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT vid FROM d{rounds}"
    )


def orders_enriched(sf_dir: str) -> ray.data.Dataset:
    """Orders joined to customer attributes through the broadcast hash
    join (small side shipped once via ray.put, per-batch C++ hash join —
    no shuffle of the big side)."""
    from .joins import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_mktsegment"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.column("c_custkey"),
                "c_nationkey": t.column("c_nationkey"),
                "c_mktsegment": t.column("c_mktsegment"),
            }
        ),
        batch_format="pyarrow",
    )
    return broadcast_join(
        orders, cust, on="o_custkey",
        right_cols=["c_nationkey", "c_mktsegment"],
    )


def events_lag(sf_dir: str) -> ray.data.Dataset:
    """Distributed LAG window function: each event paired with the user's
    previous event timestamp (order ts, ties by event_id; first event per
    user dropped — inner-lag). SQL-checkable via LAG ... OVER."""
    from .joins import lag_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return lag_per_key(
        ev, key_col="user_id", order_col="ts_us", value_col="ts_us",
        out_col="prev_ts_us", tie_col="event_id",
    )


def hll_registers_parts(sf_dir: str) -> ray.data.Dataset:
    """HyperLogLog register table (p=12) over lineitem.l_partkey — pure
    integers, so the sketch state itself is hash-checkable against the
    DuckDB md5_number_lower reproduction (engine/sketch.py)."""
    from .sketch import hll_registers

    li = _li(sf_dir, ["l_partkey"])
    return hll_registers(li, "l_partkey", p=12)


def approx_distinct_parts(sf_dir: str) -> ray.data.Dataset:
    """HLL approximate distinct count of l_partkey (p=12, ~1.6% rel.
    error): (est_micro = floor(estimate·1e6 + 0.5), nz nonzero
    registers). The estimator keeps the register sum in exact integer
    arithmetic so the SQL oracle computes the bit-identical float."""
    from .sketch import approx_distinct

    li = _li(sf_dir, ["l_partkey"])
    est, nz = approx_distinct(li, "l_partkey", p=12)
    return ray.data.from_arrow(
        pa.table(
            {
                "est_micro": pa.array(
                    [int(np.floor(est * 1e6 + 0.5))], type=pa.int64()
                ),
                "nz": pa.array([nz], type=pa.int64()),
            }
        )
    )


def orders_without_lineitems(sf_dir: str) -> ray.data.Dataset:
    """Distinct orderkeys in orders but in no lineitem row — the
    distributed sort-based EXCEPT (engine/setops.py; one sort, no hash
    aggregate, driver sees per-block metadata only)."""
    from .setops import except_keys

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(
        lambda t: pa.table({"orderkey": t.column("o_orderkey")}),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).map_batches(
        lambda t: pa.table({"orderkey": t.column("l_orderkey")}),
        batch_format="pyarrow",
    )
    return except_keys(ords, li, "orderkey")


def parts_with_lineitems(sf_dir: str) -> ray.data.Dataset:
    """Distinct partkeys present in both part and lineitem — the
    distributed sort-based INTERSECT (engine/setops.py)."""
    from .setops import intersect_keys

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]
    ).map_batches(
        lambda t: pa.table({"partkey": t.column("p_partkey")}),
        batch_format="pyarrow",
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
    ).map_batches(
        lambda t: pa.table({"partkey": t.column("l_partkey")}),
        batch_format="pyarrow",
    )
    return intersect_keys(parts, li, "partkey")


def lineitem_enriched_merge(sf_dir: str) -> ray.data.Dataset:
    """Large-large dim⋈fact equi-join through the sorted lookup join
    (engine/joins.py:lookup_join_sorted): every lineitem row picks up its
    order's customer and total price with NO broadcast and NO hash
    shuffle — one sort per side + range-overlap block zips. Dim-key
    uniqueness is validated, not assumed."""
    from .joins import lookup_join_sorted

    def conv_f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey").cast(pa.int64()),
                "l_linenumber": t.column("l_linenumber").cast(pa.int64()),
                "qty": pc.cast(
                    pc.round(t.column("l_quantity")), pa.int64()
                ),
            }
        )

    def conv_d(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(t.column("o_totalprice"), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "o_totalprice_cents": cents,
            }
        )

    facts = _li(
        sf_dir, ["l_orderkey", "l_linenumber", "l_quantity"]
    ).map_batches(conv_f, batch_format="pyarrow")
    dims = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(conv_d, batch_format="pyarrow")
    return lookup_join_sorted(facts, dims, on="l_orderkey", dim_on="o_orderkey")


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H-Q1-shaped multi-metric report by (returnflag, linestatus)
    with a per-batch combiner (engine/summarize.py): the shuffle carries
    O(keys × blocks) pre-aggregated rows, never O(rows). Money rides as
    exact integer cents/1e-4/1e-6 units; averages are rounded doubles."""
    from .summarize import pricing_summary as ps

    li = _li(
        sf_dir,
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    return ps(li, ship_cutoff=np.datetime64("2000-09-02"))


def orders_with_lineitems_bloom(sf_dir: str) -> ray.data.Dataset:
    """EXACT semi-join through the Bloom-prefilter pipeline
    (engine/bloom.py): orders rows whose o_orderkey appears in lineitem —
    broadcast m/8 filter bytes once, prefilter inside map_batches, then
    sort-based intersect of the SURVIVING keys + verified-set broadcast.
    Output identical to a plain semi-join (the Bloom pass only prunes)."""
    from .bloom import bloom_semi_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    return bloom_semi_join(
        orders, li, on="o_orderkey", right_on="l_orderkey", num_bits=1 << 20
    )


def decontam_3gram(sf_dir: str) -> ray.data.Dataset:
    """Test-set decontamination (engine/decontam.py): the held-out set is
    the deterministic slice ``doc_id % 37 == 0`` of the documents table;
    every other doc is train. Output = (doc_id, n_contaminated_grams) for
    train docs sharing ≥ 1 whitespace 3-gram with the held-out slice (the
    operator's production default is 5+; 3 keeps the synthetic word-salad
    corpus's overlap signal dense enough to check hundreds of rows) —
    held-out grams broadcast once, train side a shuffle-free actor scan.
    The tokenizer is the literal single-space split so the SQL oracle is
    the SAME computation (string_split + lead-window grams + join)."""
    from .decontam import decontaminate

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def split(t: pa.Table, held: bool) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % 37 == 0) if held else (ids % 37 != 0)
        return t.filter(pa.array(m))

    heldout = docs.map_batches(
        lambda t: split(t, True), batch_format="pyarrow"
    )
    train = docs.map_batches(lambda t: split(t, False), batch_format="pyarrow")
    return decontaminate(train, heldout, n=3)


def pii_planted(sf_dir: str) -> ray.data.Dataset:
    """Hard-checkable PII scrubbing gate (the pii analog of
    ``langid_planted``): emails/phones are planted CLOSED-FORM from
    doc_id onto each document's real text (docs ``d % 3 == 0`` gain an
    email, ``d % 4 == 0`` a phone; the base word-salad text exercises the
    negative path), then the full ``engine.pii`` actor-pool scanner runs.
    Counts AND the redacted string length are exact — the patterns are
    RE2-compatible, so the oracle runs the identical regexes in DuckDB."""
    from .pii import scan_pii

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out = []
        for d, txt in zip(ids.tolist(), texts):
            s = txt or ""
            if d % 3 == 0:
                s += f" reach me at user{d}@mail{d % 7}.example.com now"
            if d % 4 == 0:
                s += f" or call +1-555-{1000 + d % 9000} today"
            out.append(s)
        return pa.table(
            {"doc_id": pa.array(ids), "text": pa.array(out, type=pa.string())}
        )

    scanned = scan_pii(docs.map_batches(plant, batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_emails": t.column("n_emails"),
                "n_phones": t.column("n_phones"),
                "redacted_len": pc.cast(
                    pc.utf8_length(t.column("redacted")), pa.int64()
                ),
            }
        )

    return scanned.map_batches(finish, batch_format="pyarrow")


def bpeish_planted(sf_dir: str) -> ray.data.Dataset:
    """Closed-form gate for the BPE-ish pre-tokenizer — the one analyze()
    column whose regex needs lookahead (``\\s+(?!\\S)``), which DuckDB's
    RE2 lacks, so ``text_analysis`` stays rows-only. Doc ``d`` gets the
    fixed template (contractions + number + punct + double space,
    exercising every alternation branch) repeated ``1 + d % 5`` times,
    space-joined; the count is exactly ``9 * (1 + d % 5)`` tokens
    (verified linear in tests), making the oracle a pure expression on
    doc_id while the measurement runs the FULL actor-pool pipeline."""
    from .textstats import analyze

    ids = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    template = "it's rock 42 ok!!  end."

    def synth(t: pa.Table) -> pa.Table:
        ids_np = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = [" ".join([template] * (1 + d % 5)) for d in ids_np.tolist()]
        return pa.table(
            {"doc_id": pa.array(ids_np), "text": pa.array(texts, type=pa.string())}
        )

    corpus = ids.map_batches(synth, batch_format="pyarrow")
    return analyze(corpus).select_columns(["doc_id", "n_tokens_bpeish"])


def doc_chunks(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window chunking (engine/textstats.py chunk_documents):
    120-char chunks every 60 chars over the documents table — exact
    string compare against the substr/generate_series SQL oracle."""
    from .textstats import chunk_documents

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return chunk_documents(docs, size=120, stride=60)


def events_running_total(sf_dir: str) -> ray.data.Dataset:
    """Per-user UNBOUNDED running total of value-cents over time (the
    window SQL ``SUM(v) OVER (PARTITION BY user ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)``) — distributed prefix scan: one sort, then a
    scalar-per-block-boundary carry chain (engine/windows.py
    cumsum_per_key), never a per-group materialization."""
    from .windows import cumsum_per_key

    return cumsum_per_key(
        _events_cents(sf_dir),
        key_col="user_id",
        order_col="ts_us",
        value_col="cents",
        out_col="running_cents",
        tie_col="event_id",
    )


def user_event_path(sf_dir: str) -> ray.data.Dataset:
    """Full behavioral path per user: the '>'-joined sequence of ALL
    event types in (ts, event_id) order plus its length — grouped
    ORDERED string_agg via per-block partial concats (the combiner)
    stitched by block index (engine/windows.py ordered_concat_per_key).
    Contrast user_event_seq, which keeps only the first five."""
    from .windows import ordered_concat_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "event_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )
    return ordered_concat_per_key(
        ev,
        key_col="user_id",
        order_cols=["ts_us", "event_id"],
        value_col="event_type",
        sep=">",
        out_col="path",
        count_col="n",
    )


def ipc_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """Arrow-IPC (Feather V2) sink → source roundtrip of the events
    table: per-block distributed write under /tmp, zero-parse decode on
    read — unlike the JSONL/CSV roundtrips this one is BIT-exact for
    timestamp[us] and float64, which is why it runs over events (the
    table the text formats can only approximate)."""
    import hashlib as _hl

    from .ipcio import read_ipc, write_ipc

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    out = f"/tmp/graft_ipc/{_hl.md5(sf_dir.encode()).hexdigest()[:10]}"
    write_ipc(ev, out, clean=True)
    return read_ipc(out)


def dedup_keep_best_docs(sf_dir: str) -> ray.data.Dataset:
    """Keep-best canonical dedup over documents: per case/whitespace-
    canonical group survive the LONGEST original (ties → smallest
    doc_id) — the curation-grade keep rule, run as one sort-based
    grouped MAX over a packed (n_chars, doc_id) int64."""
    from .dedup import dedup_keep_best

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return dedup_keep_best(docs)


def part_pair_top100(sf_dir: str) -> ray.data.Dataset:
    """Market-basket co-occurrence: the 100 part pairs most often bought
    together (distinct per order) — the all-pairs self-join done by ONE
    sort + boundary-carried vectorized pair emission (engine/basket.py),
    no join operator, per-block combiner before the sorted grouped SUM.
    Ties at the cut broken by (part_a, part_b) to stay deterministic."""
    from .basket import pair_counts

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pairs = pair_counts(
        li, group_col="l_orderkey", item_col="l_partkey",
        a_col="part_a", b_col="part_b", n_col="n_orders",
    )
    return pairs.sort(
        ["n_orders", "part_a", "part_b"], descending=[True, False, False]
    ).limit(100)


def doc_len_minmax_scaled(sf_dir: str) -> ray.data.Dataset:
    """Per-source min-max scaled document length — the feature
    normalization pass before cross-source mixing: grouped extent
    (sorted min/max reduce, O(sources) rows) broadcast once, then a
    stateless streamed apply."""
    from .summarize import minmax_scale_per_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return minmax_scale_per_key(docs, "source", "n_chars", out_col="scaled")


def event_value_mad_outliers(sf_dir: str) -> ray.data.Dataset:
    """Robust anomaly screen per event type: median, MAD and the count
    of events with |cents − median| > 3·MAD — two sorted grouped
    percentile-pick passes + a combiner count (engine/summarize.py
    grouped_median_mad); all integer-exact."""
    from .summarize import grouped_median_mad

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_median_mad(ev, "event_type", "cents", k=3.0)


def tri_edge_support(sf_dir: str) -> ray.data.Dataset:
    """Per-EDGE triangle support on the tripartite graph — the k-truss
    building block (engine/triangles.py edge_support): every
    (order, part, supplier) triangle credits its three undirected
    edges, partials settle through the sort-based grouped SUM. SQL
    oracle: the 3-way self-join crediting LEAST/GREATEST canonical
    pairs."""
    from .triangles import edge_support

    return edge_support(_tripartite_edges(sf_dir))


def order_trend_by_priority(sf_dir: str) -> ray.data.Dataset:
    """Per-priority linear trend of order value (whole dollars) against
    order date (epoch days) — grouped simple OLS from exact integer
    moment sums (engine/summarize.py grouped_ols, one O(keys × blocks)
    partial shuffle). Dollars, not cents, so Σy² stays orders of
    magnitude under 2⁶³ at large SF."""
    from .summarize import grouped_ols

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    )

    def quantize(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "x": pa.array(us // 86_400_000_000),
                "y": pc.cast(
                    pc.round(
                        t.column("o_totalprice"),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return grouped_ols(
        ords.map_batches(quantize, batch_format="pyarrow"),
        "o_orderpriority",
        "x",
        "y",
    )


def order_price_winsorized(sf_dir: str) -> ray.data.Dataset:
    """Per-priority winsorized order value (cents): clip each order into
    its priority's own [p05, p95] percentile_disc band
    (engine/summarize.py winsorize_per_key) — one sorted percentile
    pass, one broadcast, stateless streamed clip; the input never
    shuffles."""
    from .summarize import winsorize_per_key

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_orderpriority": t.column("o_orderpriority"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("o_totalprice"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return winsorize_per_key(ords, "o_orderpriority", "cents", 0.05, 0.95)


_KTRUSS_ORACLE_ROUNDS = 18  # unroll depth of the ktruss_4 SQL oracle


def _ktruss_unrolled_sql(k: int, rounds: int) -> str:
    """Unrolled truss peel: t_r enumerates each triangle x<y<z of
    e_{r-1} once, s_r credits its three edges, e_r keeps edges with
    support >= k-2. E_r is a subset of E_{r-1}, so stable sets are
    fixpoints and extra unrolled rounds are no-ops — e_R is the k-truss
    whenever the true peel depth <= R (guarded at query time in
    ktruss_4). Orientation note: o < p+PART_OFFSET < s+SUPP_OFFSET by
    the id-range construction, so every edge is already canonical."""
    parts = [
        f"""e0 AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS a, l_partkey + {PART_OFFSET} AS b
        FROM lineitem
        UNION SELECT DISTINCT l_partkey + {PART_OFFSET},
              l_suppkey + {SUPP_OFFSET} FROM lineitem
        UNION SELECT DISTINCT l_orderkey, l_suppkey + {SUPP_OFFSET}
              FROM lineitem)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f"""t{r} AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e{p} e1 JOIN e{p} e2 ON e2.a = e1.a AND e2.b > e1.b
                 JOIN e{p} e3 ON e3.a = e1.b AND e3.b = e2.b),
        s{r} AS MATERIALIZED (
            SELECT a, b, COUNT(*) AS c FROM (
                SELECT x AS a, y AS b FROM t{r}
                UNION ALL SELECT x, z FROM t{r}
                UNION ALL SELECT y, z FROM t{r}) AS cr
            GROUP BY a, b),
        e{r} AS MATERIALIZED (
            SELECT a, b FROM s{r} WHERE c >= {k - 2})"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT a, b FROM e{rounds}"


def ktruss_4(sf_dir: str) -> ray.data.Dataset:
    """4-truss of the tripartite graph — every surviving edge lies in
    >= 2 triangles among the survivors (engine/triangles.py k_truss:
    iterated edge_support peel), with the same convergence-depth guard
    against the unrolled SQL oracle as kcore_3."""
    from .triangles import k_truss

    ds, rounds = k_truss(_tripartite_edges(sf_dir), k=4)
    # rounds counts the final no-change pass; effective peels = rounds - 1
    if rounds - 1 > _KTRUSS_ORACLE_ROUNDS:
        raise RuntimeError(
            f"ktruss_4 peeled {rounds - 1} rounds but the SQL oracle "
            f"unrolls only {_KTRUSS_ORACLE_ROUNDS} — raise "
            "_KTRUSS_ORACLE_ROUNDS"
        )
    return ds


def docs_weighted_sample_100(sf_dir: str) -> ray.data.Dataset:
    """Deterministic length-weighted document sample: 100 docs drawn
    without replacement with P ∝ n_chars — Efraimidis–Spirakis
    exponential keys from md5-low-64(doc_id) (engine/topk.py
    weighted_sample); stateless, resume-stable, SQL-exact."""
    from .topk import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_sample(docs, "n_chars", "doc_id", 100)


def events_user_weighted_2(sf_dir: str) -> ray.data.Dataset:
    """Per-user deterministic weighted event sample: 2 events per user
    drawn without replacement with P ∝ value — the per-domain
    importance draw (engine/topk.py weighted_sample_per_key: stateless
    A-ES keys through the grouped top-k operator, no per-group
    shuffle)."""
    from .topk import weighted_sample_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return weighted_sample_per_key(ev, "user_id", "cents", "event_id", 2)


def lang_entropy_per_source(sf_dir: str) -> ray.data.Dataset:
    """Language-distribution Shannon entropy (nats) per source — the
    mixture-balance report (engine/summarize.py grouped_entropy): exact
    integer (source, lang) counts through the sorted grouped SUM, floats
    only on the final O(sources) rows."""
    from .summarize import grouped_entropy

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )
    return grouped_entropy(docs, "source", "lang")


def daily_active_users(sf_dir: str) -> ray.data.Dataset:
    """Windowed COUNT(DISTINCT): unique users per UTC day — the
    telemetry-dashboard primitive. (day, user) packs into one int64 and
    runs the sort-based distributed DISTINCT (never Ray's hash
    aggregate); per-day counts settle through per-block np.unique
    partials into the sorted grouped SUM."""
    from .graph import _sorted_distinct_refs
    from .ntile import grouped_sums_sorted

    DAY_US = np.int64(86_400_000_000)
    SHIFT = np.int64(33)  # user_id < 2^33; epoch-day < 2^29

    def pack(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts")
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        user = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(user) and (user.max() >= (1 << 33) or user.min() < 0):
            raise ValueError("user_id outside packed range [0, 2^33)")
        day = ts // DAY_US  # floor division == SQL floor(epoch/86400)
        return pa.table({"key": pa.array(np.unique((day << SHIFT) | user))})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    ).map_batches(pack, batch_format="pyarrow")
    refs, _counts = _sorted_distinct_refs(ev, "key")

    def day_counts(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        d, c = np.unique(key >> SHIFT, return_counts=True)
        return pa.table(
            {"day": pa.array(d.astype(np.int64)),
             "cnt": pa.array(c.astype(np.int64))}
        )

    partials = ray.data.from_arrow_refs(refs).map_batches(
        day_counts, batch_format="pyarrow"
    )
    return grouped_sums_sorted(partials, "day", ["cnt"], ["dau"])


def event_transitions_top20(sf_dir: str) -> ray.data.Dataset:
    """Top-20 event-type transitions (Markov bigrams over per-user
    behavioral sequences in (ts, event_id) order) — the session-flow
    feature (engine/windows.py transition_counts: one global sort,
    O(blocks) boundary metadata, pairs through the sorted grouped SUM).
    Total output order (n DESC, prev, next) so the LIMIT is
    deterministic on both sides."""
    from .windows import transition_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(
                    t.column("ts").cast(pa.timestamp("us")), pa.int64()
                ),
                "event_id": t.column("event_id"),
                "event_type": t.column("event_type"),
            }
        ),
        batch_format="pyarrow",
    )
    counts = transition_counts(
        ev, key_col="user_id", order_col="ts_us",
        label_col="event_type", tie_col="event_id",
    ).map_batches(
        lambda t: pa.table(
            {"prev_type": t.column("prev"),
             "next_type": t.column("next"),
             "n": t.column("n")}
        ),
        batch_format="pyarrow",
    )
    return counts.sort(
        ["n", "prev_type", "next_type"], descending=[True, False, False]
    ).limit(20)


def top_parts_per_nation(sf_dir: str) -> ray.data.Dataset:
    """Aggregate-then-rank report: the top-3 parts per supplier nation by
    total discounted revenue. Exact integers end-to-end (revenue in the
    e4 fixed-point of pricing_summary); supplier/nation dimensions ship
    once as broadcasts; the (nation, part) revenue settles through a
    per-batch packed-key combiner → sorted grouped SUM; the rank is the
    grouped top-k with (revenue DESC, partkey ASC) ties packed into one
    orderable int64 — no window shuffle anywhere."""
    from .joins import broadcast_join
    from .ntile import grouped_sums_sorted
    from .topk import topk_per_group

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    skey = sup["s_suppkey"].to_numpy()
    snat = sup["s_nationkey"].to_numpy().astype(np.int64)
    order = np.argsort(skey)
    skey_ref = ray.put(skey[order])
    snat_ref = ray.put(snat[order])

    PART_SHIFT = np.int64(38)  # l_partkey < 2^38; nationkey < 2^25

    def pack(t: pa.Table) -> pa.Table:
        sk = ray.get(skey_ref)
        sn = ray.get(snat_ref)
        supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        part = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(part) and part.max() >= (1 << 38):
            raise ValueError("l_partkey outside packed range [0, 2^38)")
        nation = sn[np.searchsorted(sk, supp)]
        price_c = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rev = price_c * (100 - disc_c)
        key = (nation << PART_SHIFT) | part
        u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(u),
                "rev": pa.array(np.bincount(inv, weights=rev).astype(np.int64)),
            }
        )

    li = _li(
        sf_dir, ["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"]
    ).map_batches(pack, batch_format="pyarrow")
    summed = grouped_sums_sorted(li, "key", ["rev"], ["sum_rev_e4"])

    def unpack(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        rev = t.column("sum_rev_e4").to_numpy(zero_copy_only=False)
        part = key & ((np.int64(1) << PART_SHIFT) - 1)
        # (rev DESC, part ASC) as ONE descending-orderable key: zero-padded
        # decimal strings (rev to 19 digits = full int64 range, part
        # complemented against 2^38) — exact at any magnitude, unlike an
        # int64 pack which overflows once rev_e4 * 2^part_bits > 2^63
        inv_part = (np.int64(1) << PART_SHIFT) - 1 - part
        ordkey = np.char.add(
            np.char.zfill(rev.astype("U19"), 19),
            np.char.zfill(inv_part.astype("U12"), 12),
        )
        return pa.table(
            {
                "nationkey": pa.array((key >> PART_SHIFT).astype(np.int64)),
                "l_partkey": pa.array(part.astype(np.int64)),
                "sum_rev_e4": t.column("sum_rev_e4"),
                "ordkey": pa.array(ordkey.tolist(), pa.string()),
            }
        )

    ranked = topk_per_group(
        summed.map_batches(unpack, batch_format="pyarrow"),
        key_col="nationkey", order_col="ordkey", k=3, descending=True,
    ).select_columns(["nationkey", "l_partkey", "sum_rev_e4"])
    return broadcast_join(
        ranked, nat.map_batches(
            lambda t: pa.table(
                {"nationkey": t.column("n_nationkey").cast(pa.int64()),
                 "n_name": t.column("n_name")}
            ),
            batch_format="pyarrow",
        ),
        on="nationkey", right_cols=["n_name"],
    ).select_columns(["n_name", "l_partkey", "sum_rev_e4"])


def doc_len_percent_rank(sf_dir: str) -> ray.data.Dataset:
    """Within-source quantile normalization of document length — the
    cross-source score-calibration pass (engine/ntile.py
    percent_rank_per_key: input never shuffles; the distinct
    (source, n_chars) frequency table settles through the sorted grouped
    SUM and ships once as a broadcast lookup)."""
    from .ntile import percent_rank_per_key

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return percent_rank_per_key(docs, "source", "n_chars", out_col="pr")


def events_user_sum_7d(sf_dir: str) -> ray.data.Dataset:
    """Trailing-7-day spend per user at every event — the RANGE-frame
    window (time horizon, peers included) vs the ROWS-frame rolling sum
    (engine/windows.py rolling_sum_time_per_key: one sort, time-bounded
    tail carry — O(blocks × events-per-horizon) metadata)."""
    from .windows import rolling_sum_time_per_key

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda t: pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(
                    t.column("ts").cast(pa.timestamp("us")), pa.int64()
                ),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("value"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = rolling_sum_time_per_key(
        ev, "user_id", "ts_us", "cents",
        horizon=7 * 86_400_000_000, out_col="cents_7d",
    )
    return out.select_columns(["event_id", "user_id", "cents_7d"])


def cc_size_histogram(sf_dir: str) -> ray.data.Dataset:
    """Component-size distribution of the bipartite graph — the
    cluster-size report a CC-based dedup pass reads (how many duplicate
    clusters of each size): CC labels (distributed min-label
    propagation) → per-block label-count partials → sorted grouped SUM
    (component sizes) → per-block size-count partials → second tiny
    grouped SUM. Output is O(distinct sizes) rows."""
    from .ntile import grouped_sums_sorted

    labels = cc_labels(sf_dir)

    def label_partial(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_numpy(zero_copy_only=False)
        u, c = np.unique(lab, return_counts=True)
        return pa.table(
            {"label": pa.array(u), "cnt": pa.array(c.astype(np.int64))}
        )

    sizes = grouped_sums_sorted(
        labels.map_batches(label_partial, batch_format="pyarrow"),
        "label", ["cnt"], ["sz"],
    )

    def size_partial(t: pa.Table) -> pa.Table:
        sz = t.column("sz").to_numpy(zero_copy_only=False)
        u, c = np.unique(sz, return_counts=True)
        return pa.table(
            {"component_size": pa.array(u.astype(np.int64)),
             "c": pa.array(c.astype(np.int64))}
        )

    return grouped_sums_sorted(
        sizes.map_batches(size_partial, batch_format="pyarrow"),
        "component_size", ["c"], ["n_components"],
    )


def part_customer_breadth_top25(sf_dir: str) -> ray.data.Dataset:
    """Demand breadth: the 25 parts bought by the most DISTINCT
    customers — the popularity-dedup composition (COUNT(DISTINCT) per
    key over a large-large join): lineitem acquires o_custkey through
    the sorted lookup join (both sides big, neither broadcast), the
    (part, customer) pair dedups through the packed sort-based DISTINCT,
    per-block part counts settle through the sorted grouped SUM, and the
    total (n DESC, partkey) order makes the LIMIT deterministic."""
    from .graph import _sorted_distinct_refs
    from .joins import lookup_join_sorted
    from .ntile import grouped_sums_sorted

    li = _li(sf_dir, ["l_orderkey", "l_partkey"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = lookup_join_sorted(li, orders, on="l_orderkey", dim_on="o_orderkey")

    CUST_BITS = np.int64(26)

    def pack(t: pa.Table) -> pa.Table:
        part = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cust) and (cust.max() >= (1 << 26) or part.max() >= (1 << 37)):
            raise ValueError("key outside packed range — widen CUST_BITS")
        return pa.table(
            {"key": pa.array(np.unique((part << CUST_BITS) | cust))}
        )

    refs, _counts = _sorted_distinct_refs(
        joined.map_batches(pack, batch_format="pyarrow"), "key"
    )

    def part_counts(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        p, c = np.unique(key >> CUST_BITS, return_counts=True)
        return pa.table(
            {"l_partkey": pa.array(p.astype(np.int64)),
             "cnt": pa.array(c.astype(np.int64))}
        )

    summed = grouped_sums_sorted(
        ray.data.from_arrow_refs(refs).map_batches(
            part_counts, batch_format="pyarrow"
        ),
        "l_partkey", ["cnt"], ["n_customers"],
    )
    return summed.sort(
        ["n_customers", "l_partkey"], descending=[True, False]
    ).limit(25)


def docs_above_source_p75(sf_dir: str) -> ray.data.Dataset:
    """Percentile-threshold curation filter: keep documents STRICTLY
    longer than their own source's 75th-percentile length — the
    per-domain tail-keep rule (contrast T-length-band's global band and
    T-winsorize's clip): per-key percentile_disc via the sorted
    single-row picks (engine/ntile.py grouped_pdisc, O(keys) driver
    state), thresholds broadcast once via ray.put, stateless streamed
    filter — the corpus itself never shuffles."""
    from .ntile import grouped_pdisc

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    p75 = grouped_pdisc(docs, "source", "n_chars", qs=(0.75,))
    thr = {k: v[0.75] for k, v in p75.items()}
    thr_ref = ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        src = t.column("source").to_numpy(zero_copy_only=False)
        nch = t.column("n_chars").to_numpy(zero_copy_only=False)
        cut = np.asarray([th[s] for s in src], dtype=np.int64)
        return t.filter(pa.array(nch > cut))

    return docs.map_batches(keep, batch_format="pyarrow")


def wmedian_price_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Quantity-weighted median line price per return flag — the
    importance-weighted center where the plain median over-counts
    low-volume lines (engine/summarize.py weighted_median_per_key:
    input never shuffles, distinct (flag, cents) weight sums through
    the sorted grouped SUM, exact-integer 2·cumw ≥ total crossing)."""
    from .summarize import weighted_median_per_key

    li = _li(sf_dir, ["l_returnflag", "l_extendedprice", "l_quantity"]).map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(t.column("l_extendedprice"), 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
                "qty": pc.cast(
                    pc.round(
                        t.column("l_quantity"),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return weighted_median_per_key(
        li, "l_returnflag", "cents", "qty", out_col="wmedian_cents"
    )


def user_diversity_histogram(sf_dir: str) -> ray.data.Dataset:
    """Behavioral-diversity profile: how many users touch exactly k
    distinct event types — the engagement-mix report (the T97/T101
    composition over a DISTINCT base: separator-joined (user, type)
    string pairs through the sort-based DISTINCT, then per-user counts
    and the count histogram through two tiny sorted grouped SUMs)."""
    from .graph import _sorted_distinct_refs
    from .ntile import grouped_sums_sorted

    sep = "\x1f"

    def pack(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(str)
        ty = t.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        pair = np.char.add(np.char.add(u, sep), ty)
        return pa.table({"key": pa.array(np.unique(pair).tolist(), pa.string())})

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(pack, batch_format="pyarrow")
    refs, _counts = _sorted_distinct_refs(ev, "key")

    def user_counts(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        users = np.asarray([k.split(sep, 1)[0] for k in key], dtype=object)
        u, c = np.unique(users, return_counts=True)
        return pa.table(
            {"user": pa.array(u.tolist(), pa.string()),
             "cnt": pa.array(c.astype(np.int64))}
        )

    per_user = grouped_sums_sorted(
        ray.data.from_arrow_refs(refs).map_batches(
            user_counts, batch_format="pyarrow"
        ),
        "user", ["cnt"], ["k"],
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table(
            {"n_types": pa.array(u.astype(np.int64)),
             "c": pa.array(c.astype(np.int64))}
        )

    return grouped_sums_sorted(
        per_user.map_batches(hist_partial, batch_format="pyarrow"),
        "n_types", ["c"], ["n_users"],
    )


_HARMONIC_LCM = 720720  # LCM(1..16): 720720//d is EXACT for d ≤ 16


def harmonic_centrality_3(sf_dir: str) -> ray.data.Dataset:
    """Harmonic (closeness-family) centrality from the 3 smallest-id
    landmark sources: h(v) = Σ_s 1/d(s,v) over reached pairs with
    d > 0 — three BSP BFS waves over the shard actors, combined on the
    contract-graph dense tier. Exactness trick: distances are ≤ the
    16-round oracle unroll, so h is reported ×LCM(1..16) = 720720 as an
    exact BIGINT — no float summation order to disagree with SQL."""
    from .bsp import BSPGraph

    edges, ids, enc, n, _ = _graph_arrays(sf_dir)
    total = np.zeros(n, np.int64)
    reached_any = np.zeros(n, bool)
    g = BSPGraph(enc, n=n, num_shards=4, symmetric_copy=True)
    try:
        for src in (0, 1, 2):  # dense vids 0..2 == 3 smallest original ids
            ds, rounds = g.bfs(source_vid=src)
            if rounds - 1 > _BFS_ORACLE_ROUNDS:
                raise RuntimeError(
                    f"harmonic_centrality_3 needed {rounds - 1} rounds; "
                    f"oracle unrolls {_BFS_ORACLE_ROUNDS}"
                )
            dist = np.full(n, n, np.int64)
            for b in ds.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
                vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
                dist[vid] = b.column("label").to_numpy(zero_copy_only=False)
            reached = dist < n
            reached_any |= reached
            pos = reached & (dist > 0)
            if pos.any() and int(dist[pos].max()) > 16:
                raise RuntimeError("distance > 16 breaks the exact LCM encoding")
            total[pos] += _HARMONIC_LCM // dist[pos]
    finally:
        g.shutdown()
    ids_int = ids.astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(ids_int[reached_any]),
                "h_x720720": pa.array(total[reached_any]),
            }
        )
    )


def _harmonic_oracle_sql(rounds: int) -> str:
    """Three single-source unrolled BFS blocks (each subquery carries its
    own WITH, so CTE names never collide) unioned into the exact-integer
    harmonic sum."""
    blocks = []
    for k in range(3):
        pred = f"vid = (SELECT vid FROM v ORDER BY vid LIMIT 1 OFFSET {k})"
        blocks.append(f"b{k} AS MATERIALIZED ({_bfs_unrolled_sql(rounds, source_pred=pred)})")
    return (
        "WITH "
        + ",\n    ".join(blocks)
        + """,
    u AS (SELECT vid, dist FROM b0
          UNION ALL SELECT vid, dist FROM b1
          UNION ALL SELECT vid, dist FROM b2)
    SELECT vid,
           CAST(SUM(CASE WHEN dist > 0 THEN 720720 // dist ELSE 0 END)
                AS BIGINT) AS h_x720720
    FROM u GROUP BY vid"""
    )


ORACLE_SQL: dict[str, str] = {

    "edges_project": f"""
        SELECT DISTINCT l_orderkey AS src,
               l_partkey + {PART_OFFSET} AS dst
        FROM lineitem
    """,
    "out_degree": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem)
        SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src
    """,
    "degree_histogram": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem),
             d AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src)
        SELECT CAST(outdeg AS BIGINT) AS outdeg,
               CAST(COUNT(*) AS BIGINT) AS n_vertices
        FROM d GROUP BY 1
    """,
    "sinks": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem),
             v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e)
        SELECT vid FROM v WHERE vid NOT IN (SELECT src FROM e)
    """,
    "pr_superstep1": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem),
             v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),
             n AS (SELECT COUNT(*) AS n FROM v),
             deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
             sink_sum AS (
                SELECT ((1.0 - 0.85) + 0.85 * (
                    SELECT COUNT(*) FROM v
                    WHERE vid NOT IN (SELECT src FROM e)
                ) * (1.0 / n.n)) / n.n AS s
                FROM n
             ),
             mass AS (
                SELECT e.dst AS vid, SUM((1.0 / n.n) / deg.outdeg) AS m
                FROM e JOIN deg ON e.src = deg.src CROSS JOIN n
                GROUP BY e.dst
             )
        SELECT v.vid,
               ROUND((SELECT s FROM sink_sum)
                     + 0.85 * COALESCE(mass.m, 0.0), {ROUND}) AS rank
        FROM v LEFT JOIN mass ON v.vid = mass.vid
    """,
    "toprank_superstep": None,  # filled below (reuses pr_superstep1 SQL)
    "ranksum_superstep": None,
    "pagerank10": _pagerank_unrolled_sql(10),
    "ppr10": _ppr_unrolled_sql(10),
    "cc_labels": _cc_unrolled_sql(14),  # depth guarded in cc_labels()
    "bfs_hops": _bfs_unrolled_sql(_BFS_ORACLE_ROUNDS),  # depth guarded
    "sssp_weighted": _sssp_unrolled_sql(_SSSP_ORACLE_ROUNDS),  # depth guarded
    "bfs_multi3": _bfs_unrolled_sql(
        _BFS_ORACLE_ROUNDS,
        source_pred="vid IN (SELECT vid FROM v ORDER BY vid LIMIT 3)",
    ),  # depth guarded in bfs_multi3
    "hits_3": _hits_unrolled_sql(3),
    "wpr10": _wpr_unrolled_sql(10),
    "triangles_tripartite": f"""
        WITH e1 AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             e2 AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
             e3 AS (SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem)
        SELECT COUNT(*) AS n_triangles
        FROM e1 JOIN e2 ON e1.p = e2.p JOIN e3 ON e2.s = e3.s AND e3.o = e1.o
    """,
    "sha256_documents": """
        SELECT doc_id, sha256(text) AS text_sha256 FROM documents
    """,
    "dedup_exact": """
        SELECT sha256(text) AS text_sha256,
               MIN(doc_id) AS doc_id,
               COUNT(*) AS dup_count
        FROM documents GROUP BY sha256(text)
    """,
    "token_count": r"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    """,
    "doc_stats": """
        SELECT doc_id,
               length(text) AS n_chars,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
        FROM documents
    """,
    "embedding_near_dup": """
        SELECT e1.vec_id AS a, e2.vec_id AS b,
               ROUND(CAST(list_cosine_similarity(
                     CAST(e1.embedding AS DOUBLE[]),
                     CAST(e2.embedding AS DOUBLE[])) AS DOUBLE), 6) AS cos_sim
        FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id < e2.vec_id
        WHERE list_cosine_similarity(CAST(e1.embedding AS DOUBLE[]),
                                     CAST(e2.embedding AS DOUBLE[])) >= 0.35
    """,
    "lpa_labels": _lpa_unrolled_sql(2),
    # BSP LPA is pytest-identical to the dataset engine — same oracle
    "lpa_labels_bsp": _lpa_unrolled_sql(2),
    "events_sessions": """
        WITH t AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec
            FROM events),
        g AS (
            SELECT user_id, sec,
                   CASE WHEN sec - LAG(sec) OVER w > 1800 THEN 1 ELSE 0 END
                       AS new_s
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
        s AS (
            SELECT user_id, sec,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY sec
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
        SELECT user_id,
               MIN(sec) AS session_start,
               COUNT(*) AS n_events,
               CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_sec
        FROM s GROUP BY user_id, sid
    """,
    "graph_stats": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem),
             v AS (SELECT src AS vid FROM e UNION SELECT dst FROM e)
        SELECT (SELECT COUNT(*) FROM v) AS n_vertices,
               (SELECT COUNT(*) FROM e) AS n_edges,
               (SELECT COUNT(*) FROM v
                WHERE vid NOT IN (SELECT src FROM e)) AS n_sinks,
               (SELECT MAX(vid) FROM v) AS max_id
    """,
    "prepleti_triple": f"""
        WITH e AS (SELECT DISTINCT l_orderkey AS src,
                        l_partkey + {PART_OFFSET} AS dst FROM lineitem),
             m AS (SELECT MAX(GREATEST(src, dst)) AS mx FROM e)
        SELECT src, dst FROM e
        UNION ALL SELECT m.mx + e.dst + 1 AS src, e.src AS dst FROM e, m
        UNION ALL SELECT m.mx + e.src + 1 AS src, m.mx + e.dst AS dst FROM e, m
    """,
    "events_tumbling": """
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
               COUNT(*) AS n_events,
               -- CAST the SUM: duckdb SUM(BIGINT) yields HUGEINT/decimal128
               -- while the engine emits int64 -> value-hash mismatch otherwise
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events
        GROUP BY 1, 2
    """,
    "minhash_dedup": None,
    "minhash_planted": """
        -- closed-form truth for the planted-dup corpus built by
        -- queries.minhash_planted: members doc_id % 4 < 3 of group
        -- doc_id // 4 share identical text; cluster root = smallest
        -- present member (union-find root); groups need >= 2 members
        WITH m AS MATERIALIZED (SELECT doc_id, doc_id // 4 AS grp
                   FROM documents WHERE doc_id % 4 < 3),
             g AS (SELECT grp, MIN(doc_id) AS root, COUNT(*) AS c
                   FROM m GROUP BY grp)
        SELECT m.doc_id, g.root AS cluster
        FROM m JOIN g USING (grp) WHERE g.c >= 2
    """,
    "minhash_dedup_corpus": """
        -- closed-form keep-list for the planted-dup corpus
        -- (queries._planted_dup_corpus): drop every non-minimal
        -- doc_id % 4 < 3 member of a group (doc_id // 4) that has >= 2
        -- such members present; everything else survives
        WITH m AS MATERIALIZED (SELECT doc_id, doc_id // 4 AS grp
                   FROM documents WHERE doc_id % 4 < 3),
             g AS (SELECT grp, MIN(doc_id) AS root, COUNT(*) AS c
                   FROM m GROUP BY grp),
             drops AS (SELECT m.doc_id FROM m JOIN g USING (grp)
                       WHERE g.c >= 2 AND m.doc_id <> g.root)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    """,
    "mixture_sample": """
        -- queries._MIXTURE_PPM rates; sources outside the dict get the
        -- 100_000 ppm default
        SELECT doc_id, source FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 <
              CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 750000
                          WHEN 'src2' THEN 500000
                          WHEN 'src3' THEN 250000
                          WHEN 'src4' THEN 0
                          ELSE 100000 END
    """,
    "events_json_field_sum": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events WHERE props IS NOT NULL
        GROUP BY 1
    """,
    "length_band_docs": r"""
        WITH n AS MATERIALIZED (
            SELECT doc_id, source,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n
            FROM documents WHERE text IS NOT NULL),
        b AS MATERIALIZED (
            SELECT source,
                   percentile_disc(0.05) WITHIN GROUP (ORDER BY n) AS lo,
                   percentile_disc(0.95) WITHIN GROUP (ORDER BY n) AS hi
            FROM n GROUP BY source)
        SELECT n.doc_id, CAST(n.n AS BIGINT) AS n_tokens
        FROM n JOIN b USING (source)
        WHERE n.n BETWEEN b.lo AND b.hi
    """,
    "token_percentiles_by_source": r"""
        WITH n AS (SELECT source,
                        len(regexp_split_to_array(trim(text), '\s+')) AS n
                   FROM documents)
        SELECT source,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n)
                    AS BIGINT) AS p50,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n)
                    AS BIGINT) AS p90,
               CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n)
                    AS BIGINT) AS p99
        FROM n GROUP BY source
    """,
    "cms_registers_tokens": r"""
        WITH tok AS MATERIALIZED (
            SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents WHERE text IS NOT NULL
        ),
        tc AS MATERIALIZED (SELECT t, COUNT(*) AS cnt FROM tok GROUP BY 1)
        SELECT CAST(u.r AS BIGINT) AS r,
               CAST(md5_number_lower(CAST(u.r AS VARCHAR) || ':' || tc.t)
                    % 1024 AS BIGINT) AS c,
               CAST(SUM(tc.cnt) AS BIGINT) AS cnt
        FROM tc, range(4) AS u(r)
        GROUP BY 1, 2
    """,
    "embedding_centroids": """
        SELECT label, dim, ROUND(SUM(x) / COUNT(*), 6) AS c
        FROM (SELECT CAST(label AS BIGINT) AS label,
                     unnest(generate_series(1, len(embedding))) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings)
        GROUP BY 1, 2
    """,
    "token_histogram": r"""
        SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) // 50
                    AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        WHERE text IS NOT NULL
        GROUP BY 1
    """,
    "epoch_shuffle": """
        -- engine masks the 64-bit md5-low hash to 63 bits == % 2^63
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY md5_number_lower('7:' || CAST(doc_id AS VARCHAR))
                            % 9223372036854775808,
                            doc_id) - 1 AS pos
        FROM documents
    """,
    "embedding_near_dup_ivf": None,
    "embedding_near_dup_ivf_planted": """
        -- closed-form truth for the planted-clusters corpus built by
        -- queries.embedding_near_dup_ivf_planted: members vec_id % 4 < 3
        -- of group vec_id // 4 share an identical unit vector (cos 1.0);
        -- every other pair has cosine <= 0.5 < 0.95 by the disjoint
        -- two-hot construction, so the IVF pipeline's verified pair set
        -- is exactly the within-group member pairs
        WITH m AS MATERIALIZED (SELECT vec_id, vec_id // 4 AS grp
                   FROM embeddings WHERE vec_id % 4 < 3)
        SELECT x.vec_id AS a, y.vec_id AS b, CAST(1.0 AS DOUBLE) AS cos_sim
        FROM m x JOIN m y ON x.grp = y.grp AND x.vec_id < y.vec_id
    """,
    "events_hopping": """
        SELECT user_id,
               (CAST(floor(epoch(ts) / 900) AS BIGINT) - g.i) * 900
                   AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events CROSS JOIN generate_series(0, 3) AS g(i)
        GROUP BY 1, 2
    """,
    "events_top3_per_user": """
        SELECT user_id, sec, value_cents FROM (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY value DESC, ts ASC
                   ) AS rn
            FROM events) AS t
        WHERE rn <= 3
    """,
    "vocab_top50": r"""
        SELECT tok AS token, COUNT(*) AS cnt
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents) AS t
        GROUP BY tok
        ORDER BY cnt DESC, token ASC
        LIMIT 50
    """,
    "tfidf_scores": rf"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '\w+')) AS token
            FROM documents),
        tf AS MATERIALIZED (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token),
        df AS MATERIALIZED (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY token),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
        SELECT tf.doc_id, tf.token, tf.tf, df.df,
               ROUND(tf.tf * LN((SELECT n FROM n) / df.df), {ROUND}) AS tfidf
        FROM tf JOIN df USING (token)
    """,
    "doc_packing": r"""
        WITH c AS MATERIALIZED (
            SELECT doc_id,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
            FROM documents)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tokens_before,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) // 2048 AS BIGINT) AS chunk_id
        FROM c
    """,
    "bigram_top100": r"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
            FROM documents),
        tok AS MATERIALIZED (
            SELECT doc_id, unnest(t) AS w, unnest(range(1, len(t) + 1)) AS i
            FROM toks),
        bi AS MATERIALIZED (
            SELECT a.w || ' ' || b.w AS bigram
            FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bi GROUP BY bigram
        ORDER BY cnt DESC, bigram ASC
        LIMIT 100
    """,
    "heavy_hitter_tokens": r"""
        WITH tok AS MATERIALIZED (
            SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token
            FROM documents)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok GROUP BY token
        HAVING COUNT(*) * 100 > (SELECT COUNT(*) FROM tok)
    """,
    "train_val_test_split": """
        SELECT doc_id,
               CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 800
                        THEN 'train'
                    WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < 900
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "token_percentiles": r"""
        WITH n AS (SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n
                   FROM documents)
        SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS BIGINT)
                   AS p50,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY n) AS BIGINT)
                   AS p90,
               CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY n) AS BIGINT)
                   AS p99
        FROM n
    """,
    "simhash_fingerprints": r"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '\w+')) AS tok
            FROM documents),
        h AS MATERIALIZED (
            SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
        votes AS MATERIALIZED (
            SELECT doc_id, g.i,
                   SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN generate_series(0, 63) AS g(i)
            GROUP BY doc_id, g.i),
        fp AS (
            SELECT doc_id,
                   SUM(CASE WHEN v > 0
                       THEN (CAST(1 AS UBIGINT) << i)
                       ELSE CAST(0 AS UBIGINT) END) AS simhash
            FROM votes GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(COALESCE(fp.simhash, 0) AS UBIGINT) AS simhash
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN fp USING (doc_id)
    """,
    "text_analysis": None,
    "langid_planted": """
        -- closed-form truth for the planted-language corpus built by
        -- queries.langid_planted: doc d carries the template of language
        -- (d % 6) in _LANGID_TEMPLATES order; every template word is a
        -- stopword of exactly one language
        SELECT doc_id,
               CASE doc_id % 6 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                    WHEN 2 THEN 'es' WHEN 3 THEN 'fr' WHEN 4 THEN 'zh'
                    ELSE 'unknown' END AS lang_id
        FROM documents
    """,
    "text_quality": None,  # filled below (needs the stopword list)
    # BSP engine is pytest-bit-identical to the dataset engine, so the same
    # unrolled SQL is its oracle
    "pagerank10_bsp": _pagerank_unrolled_sql(10),
    "ann_topk": """
        -- CAST to DOUBLE[]: duckdb otherwise evaluates in float32 while the
        -- engine computes in float64, and rounded values can disagree
        WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS e
                   FROM embeddings ORDER BY vec_id LIMIT 1)
        SELECT vec_id,
               ROUND(CAST(list_cosine_similarity(
                     CAST(embedding AS DOUBLE[]),
                     (SELECT e FROM q)) AS DOUBLE), 6) AS cos_sim
        FROM embeddings
        ORDER BY cos_sim DESC, vec_id
        LIMIT 10
    """,
}

def _text_quality_sql() -> str:
    """Mirror of textstats.TextAnalyzer for the SQL-expressible columns:
    tokens = ``[^\\W\\d_]+`` on lowercased text (RE2-compatible; corpus is
    ASCII so Python-unicode vs RE2-ASCII classes agree), punct =
    ``[^\\w\\s]``, quality = the engine's exact clip-arithmetic (LEAST ==
    np.clip here since every term is non-negative)."""
    from .textstats import _STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS["en"]))
    return rf"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[^\W\d_]+')) AS tok
            FROM documents),
        w AS MATERIALIZED (
            SELECT doc_id, COUNT(*) AS n_words,
                   SUM(CASE WHEN tok IN ({stoplist}) THEN 1 ELSE 0 END)
                       AS stop_cnt
            FROM toks GROUP BY doc_id),
        c AS MATERIALIZED (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
            FROM documents)
        SELECT c.doc_id,
               COALESCE(w.n_words, 0) AS n_words,
               ROUND(c.n_punct / GREATEST(c.n_chars, 1), {ROUND})
                   AS punct_ratio,
               ROUND(COALESCE(w.stop_cnt, 0)
                     / GREATEST(COALESCE(w.n_words, 0), 1), {ROUND})
                   AS stopword_ratio,
               CAST(FLOOR((
                   LEAST(COALESCE(w.n_words, 0), 200) / 200.0 * 0.4
                 + (1.0 - LEAST(c.n_punct / GREATEST(c.n_chars, 1), 0.5)
                          * 2) * 0.3
                 + LEAST(COALESCE(w.stop_cnt, 0)
                         / GREATEST(COALESCE(w.n_words, 0), 1), 0.5)
                   * 2 * 0.3) * 1000000 + 0.5) AS BIGINT) AS quality_micro
        FROM c LEFT JOIN w USING (doc_id)
    """


ORACLE_SQL["text_quality"] = _text_quality_sql()
# Mirror of textstats.RepetitionStats: same [^\W\d_]+ lowercased tokens,
# zipped-unnest positions, LEAD-built bigrams/trigrams, and the identical
# floor(num/den * 1e6 + 0.5) micro-unit arithmetic (int64 ratios divided in
# float64 are bit-identical between numpy and DuckDB).
ORACLE_SQL["repetition_stats"] = r"""
    WITH base AS MATERIALIZED (
        SELECT doc_id, regexp_extract_all(lower(text), '[^\W\d_]+') AS l
        FROM documents),
    toks AS MATERIALIZED (
        SELECT doc_id, unnest(l) AS tok, unnest(range(len(l))) AS pos
        FROM base),
    seq AS MATERIALIZED (
        SELECT doc_id, tok,
               LEAD(tok, 1) OVER w AS t2,
               LEAD(tok, 2) OVER w AS t3
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    uni AS MATERIALIZED (
        SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS total
        FROM (SELECT doc_id, tok, COUNT(*) AS c FROM seq
              GROUP BY doc_id, tok)
        GROUP BY doc_id),
    bi AS MATERIALIZED (
        SELECT doc_id, MAX(c) AS top_cnt, SUM(c) AS total
        FROM (SELECT doc_id, tok, t2, COUNT(*) AS c FROM seq
              WHERE t2 IS NOT NULL GROUP BY doc_id, tok, t2)
        GROUP BY doc_id),
    tri AS MATERIALIZED (
        SELECT doc_id, SUM(c) - COUNT(*) AS dup_cnt, SUM(c) AS total
        FROM (SELECT doc_id, tok, t2, t3, COUNT(*) AS c FROM seq
              WHERE t3 IS NOT NULL GROUP BY doc_id, tok, t2, t3)
        GROUP BY doc_id)
    SELECT d.doc_id,
           -- SUM() is HUGEINT in DuckDB; surface as BIGINT so the driver's
           -- dtype-sensitive hash compare sees int64 on both sides
           CAST(COALESCE(uni.total, 0) AS BIGINT) AS n_words,
           CAST(FLOOR(COALESCE(uni.top_cnt, 0)
                / GREATEST(COALESCE(uni.total, 0), 1) * 1000000 + 0.5)
                AS BIGINT) AS top_token_frac_micro,
           CAST(FLOOR(COALESCE(bi.top_cnt, 0)
                / GREATEST(COALESCE(bi.total, 0), 1) * 1000000 + 0.5)
                AS BIGINT) AS top_bigram_frac_micro,
           CAST(FLOOR(COALESCE(tri.dup_cnt, 0)
                / GREATEST(COALESCE(tri.total, 0), 1) * 1000000 + 0.5)
                AS BIGINT) AS dup_trigram_frac_micro
    FROM documents d
    LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
    LEFT JOIN tri USING (doc_id)
"""
ORACLE_SQL["embedding_near_dup_ivf_full"] = ORACLE_SQL["embedding_near_dup"]
_SH_FP = ORACLE_SQL["simhash_fingerprints"]
ORACLE_SQL["simhash_near_dup_pairs"] = f"""
    WITH base AS MATERIALIZED ({_SH_FP})
    SELECT f1.doc_id AS a, f2.doc_id AS b,
           CAST(bit_count(xor(f1.simhash, f2.simhash)) AS BIGINT) AS hamming
    FROM base f1 JOIN base f2 ON f1.doc_id < f2.doc_id
    WHERE bit_count(xor(f1.simhash, f2.simhash)) <= 3
"""
ORACLE_SQL["events_asof_join"] = """
    WITH l AS MATERIALIZED (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'purchase'),
         r AS MATERIALIZED (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'click'),
         j AS (
            SELECT l.user_id, l.ts_us, r.ts_us AS ts_us_r,
                   l.event_id, r.event_id AS event_id_r,
                   ROW_NUMBER() OVER (
                       PARTITION BY l.event_id
                       ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
            FROM l JOIN r
              ON l.user_id = r.user_id AND r.ts_us <= l.ts_us)
    SELECT user_id, ts_us, ts_us_r, event_id, event_id_r
    FROM j WHERE rn = 1
"""
ORACLE_SQL["events_range_join"] = """
    WITH l AS MATERIALIZED (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'purchase'),
         r AS MATERIALIZED (
            SELECT event_id, user_id, epoch_us(ts) AS ts_us
            FROM events WHERE event_type = 'click')
    SELECT l.user_id, l.ts_us, r.ts_us AS ts_us_r,
           l.event_id, r.event_id AS event_id_r
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND abs(l.ts_us - r.ts_us) <= 21600000000
"""
ORACLE_SQL["events_sample"] = """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events
    WHERE md5_number_lower(CAST(event_id AS VARCHAR)) % 10 = 0
"""
ORACLE_SQL["kcore_3"] = _kcore_unrolled_sql(3, _KCORE_ORACLE_ROUNDS)
ORACLE_SQL["orders_enriched"] = """
    SELECT o_orderkey, o_custkey, c_nationkey, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
"""
ORACLE_SQL["events_lag"] = """
    SELECT event_id, user_id, ts_us, prev_ts_us FROM (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev_ts_us
        FROM events) AS t
    WHERE prev_ts_us IS NOT NULL
"""
ORACLE_SQL["hll_registers_parts"] = """
    SELECT hv % 4096 AS idx,
           MAX(52 - length(ltrim(bin((hv // 4096)::UBIGINT), '0')) + 1)
               AS rho
    FROM (SELECT md5_number_lower(CAST(l_partkey AS VARCHAR)) AS hv
          FROM lineitem) AS h
    GROUP BY idx
"""
ORACLE_SQL["approx_distinct_parts"] = """
    WITH h AS MATERIALIZED (
        SELECT md5_number_lower(CAST(l_partkey AS VARCHAR)) AS hv
        FROM lineitem),
    r AS MATERIALIZED (
        SELECT hv % 4096 AS idx,
               MAX(52 - length(ltrim(bin((hv // 4096)::UBIGINT), '0')) + 1)
                   AS rho
        FROM h GROUP BY idx),
    s AS (SELECT COUNT(*) AS nz,
                 SUM((1::UBIGINT << (53 - rho))::HUGEINT) AS sp FROM r),
    e AS (SELECT nz,
                 (0.7213 / (1 + 1.079 / 4096)) * 4096 * 4096 * POWER(2.0, 53)
                 / CAST(sp + (4096 - nz)::HUGEINT
                        * (1::UBIGINT << 53)::HUGEINT AS DOUBLE) AS raw
          FROM s)
    SELECT CAST(FLOOR((CASE WHEN raw <= 2.5 * 4096 AND nz < 4096
                            THEN 4096 * ln(4096.0 / (4096 - nz))
                            ELSE raw END) * 1000000 + 0.5) AS BIGINT)
               AS est_micro,
           CAST(nz AS BIGINT) AS nz
    FROM e
"""
ORACLE_SQL["orders_without_lineitems"] = """
    SELECT o_orderkey AS orderkey FROM orders
    EXCEPT
    SELECT l_orderkey FROM lineitem
"""
ORACLE_SQL["parts_with_lineitems"] = """
    SELECT p_partkey AS partkey FROM part
    INTERSECT
    SELECT l_partkey FROM lineitem
"""
ORACLE_SQL["orders_with_lineitems_bloom"] = """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
"""
ORACLE_SQL["events_user_sample_5"] = """
    -- deterministic per-user capped sample: smallest-5 md5-low-63 of
    -- event_id per user (engine: grouped top-k over the same hash)
    SELECT user_id, event_id,
           CAST(md5_number_lower(CAST(event_id AS VARCHAR))
                % 9223372036854775808 AS BIGINT) AS h63
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id
        ORDER BY md5_number_lower(CAST(event_id AS VARCHAR))
                 % 9223372036854775808, event_id
    ) <= 5
"""
ORACLE_SQL["lineitem_enriched_merge"] = """
    SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
           CAST(ROUND(l.l_quantity) AS BIGINT) AS qty,
           o.o_custkey,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""
ORACLE_SQL["pricing_summary"] = f"""
    -- exact-integer money encodings (cents / 1e-4 / 1e-6 units) so the
    -- compare is order-insensitive; averages divide the exact sums
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_price_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS sum_disc_price_e4,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                    * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
                AS BIGINT) AS sum_charge_e6,
           CAST(COUNT(*) AS BIGINT) AS count_order,
           ROUND(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
                 / COUNT(*), {ROUND}) AS avg_qty,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 / COUNT(*), {ROUND}) AS avg_price,
           ROUND(CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 / COUNT(*), {ROUND}) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
"""
_PR1 = ORACLE_SQL["pr_superstep1"]
ORACLE_SQL["toprank_superstep"] = (
    f"SELECT * FROM ({_PR1}) ORDER BY rank DESC, vid LIMIT 10"
)
ORACLE_SQL["ranksum_superstep"] = (
    f"SELECT ROUND(SUM(rank), 6) AS ranksum FROM ({_PR1})"
)
ORACLE_SQL["pr_superstep1_salted"] = _PR1  # same semantics, salted path

ORACLE_SQL["decontam_3gram"] = """
    -- same tokenizer contract as engine/decontam.py: literal
    -- single-space split (string_split == Python str.split(' ')),
    -- 3-grams via lead windows (NULL-concat drops tail windows, matching
    -- the Python range bound), held-out slice = doc_id % 37 == 0
    WITH toks AS MATERIALIZED (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
    ),
    grams AS MATERIALIZED (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                   AS gram
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    g2 AS MATERIALIZED (
        SELECT doc_id, gram FROM grams WHERE gram IS NOT NULL
    ),
    held AS MATERIALIZED (
        SELECT DISTINCT gram FROM g2 WHERE doc_id % 37 = 0
    )
    SELECT g.doc_id,
           CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_contaminated_grams
    FROM g2 g JOIN held h USING (gram)
    WHERE g.doc_id % 37 <> 0
    GROUP BY g.doc_id
"""

ORACLE_SQL["pii_planted"] = r"""
    -- identical planting (pure expression on doc_id) and IDENTICAL
    -- regexes as engine/pii.py (RE2-compatible by construction); email
    -- redaction applied before phone redaction on both sides
    WITH planted AS MATERIALIZED (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                            || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                            || '.example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 4 = 0
                       THEN ' or call +1-555-'
                            || CAST(1000 + doc_id % 9000 AS VARCHAR)
                            || ' today'
                       ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS BIGINT)
               AS n_phones,
           CAST(length(regexp_replace(regexp_replace(
               t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
               '\+1-555-[0-9]{4}', '[PHONE]', 'g')) AS BIGINT)
               AS redacted_len
    FROM planted
"""

ORACLE_SQL["events_funnel"] = """
    -- greedy-earliest funnel == chained MIN cascade: stage k's timestamp
    -- is the MIN ts of a step-k event STRICTLY after stage k-1's and
    -- within 1 day of it (within_sec=86400 in the engine call)
    WITH s1 AS MATERIALIZED (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS MATERIALIZED (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t
          AND e.ts <= s1.t + INTERVAL 86400 SECONDS
        GROUP BY e.user_id
    ),
    s3 AS MATERIALIZED (
        SELECT e.user_id, MIN(e.ts) AS t
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t
          AND e.ts <= s2.t + INTERVAL 86400 SECONDS
        GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS funnel_stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
"""

ORACLE_SQL["doc_chunks"] = """
    -- same contract as textstats.chunk_documents(size=120, stride=60):
    -- chunk i starts at codepoint i*60 (substr is 1-based), short tails
    -- kept, docs with empty text emit nothing (generate_series(1,0) is
    -- empty)
    WITH starts AS MATERIALIZED (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text), 60)) AS s
        FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // 60 AS BIGINT) AS chunk_idx,
           substr(text, s, 120) AS chunk
    FROM starts
"""

ORACLE_SQL["bpeish_planted"] = """
    -- closed-form truth for the planted BPE-ish corpus built by
    -- queries.bpeish_planted: doc d carries the 9-token template repeated
    -- (1 + d % 5) times space-joined, and the GPT-2-style pre-tokenizer
    -- count is exactly linear in the repetition count (the lookahead
    -- branch \\s+(?!\\S) fires once per template's double space)
    SELECT doc_id,
           CAST(9 * (1 + doc_id % 5) AS BIGINT) AS n_tokens_bpeish
    FROM documents
"""

ORACLE_SQL["events_rolling_sum5"] = """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rolling_cents
    FROM events
"""

ORACLE_SQL["events_latest_per_user"] = """
    SELECT event_id, user_id, ts_us, event_type
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts) DESC, event_id) AS rn
          FROM events)
    WHERE rn = 1
"""

ORACLE_SQL["doc_ntile4"] = """
    SELECT doc_id, source, n_chars,
           CAST(NTILE(4) OVER (PARTITION BY source
                               ORDER BY n_chars, doc_id) AS BIGINT) AS quartile
    FROM documents
"""

ORACLE_SQL["events_daily_pivot"] = """
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS purchase_cents
    FROM events
    GROUP BY 1
"""

ORACLE_SQL["winnow_fingerprints"] = """
    -- winnowing (k=4-gram md5-low-64 mod 2^32 hashes, w=4 windows,
    -- rightmost minimum per window, distinct selections): the arg-max
    -- key (2^32 - h) * 2^20 + p orders first by SMALLEST hash then by
    -- LARGEST position (valid while positions < 2^20 — guarded below)
    WITH pos AS (
        -- expression-form generate_series (returns a LIST) + unnest:
        -- DuckDB 1.0's table-function form rejects lateral column args
        SELECT doc_id, text,
               unnest(generate_series(CAST(0 AS BIGINT),
                                      CAST(length(text) - 4 AS BIGINT))) AS p
        FROM documents
        WHERE length(text) >= 4 AND length(text) < 1048576
    ),
    grams AS MATERIALIZED (
        SELECT doc_id, CAST(p AS BIGINT) AS p,
               CAST(md5_number_lower(substr(text, CAST(p + 1 AS INTEGER), 4))
                    % 4294967296 AS BIGINT) AS h
        FROM pos
    ),
    sel AS MATERIALIZED (
        SELECT w.doc_id,
               max_by(g.p, (4294967296 - g.h) * 1048576 + g.p) AS pos
        FROM grams w
        JOIN grams g
          ON g.doc_id = w.doc_id AND g.p BETWEEN w.p - 3 AND w.p
        WHERE w.p >= 3
        GROUP BY w.doc_id, w.p
    )
    SELECT DISTINCT s.doc_id, s.pos, g.h AS hash
    FROM sel s
    JOIN grams g ON g.doc_id = s.doc_id AND g.p = s.pos
"""

ORACLE_SQL["twohop_counts"] = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS src, l_partkey + 10000000 AS dst
        FROM lineitem
    )
    SELECT e1.src AS src, CAST(COUNT(DISTINCT e2.src) AS BIGINT) AS n_twohop
    FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src <> e2.src
    GROUP BY e1.src
"""

ORACLE_SQL["doc_zscore"] = """
    -- moments from exact integer sums; the float expression mirrors the
    -- engine's operation order term by term so ROUND(...,9) agrees
    WITH s AS MATERIALIZED (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(n_chars) AS DOUBLE) AS sm,
               CAST(SUM(n_chars * n_chars) AS DOUBLE) AS sq
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CASE WHEN (s.sq - s.sm * s.sm / s.n) / s.n > 0
                THEN ROUND((d.n_chars - s.sm / s.n)
                           / sqrt((s.sq - s.sm * s.sm / s.n) / s.n), 9)
                ELSE 0.0 END AS z
    FROM documents d JOIN s USING (source)
"""

ORACLE_SQL["documents_profile"] = """
    SELECT 'rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value FROM documents
    UNION ALL SELECT 'null_text', CAST(COUNT(*) - COUNT(text) AS BIGINT) FROM documents
    UNION ALL SELECT 'null_lang', CAST(COUNT(*) - COUNT(lang) AS BIGINT) FROM documents
    UNION ALL SELECT 'null_source', CAST(COUNT(*) - COUNT(source) AS BIGINT) FROM documents
    UNION ALL SELECT 'empty_text', CAST(COUNT(CASE WHEN length(text) = 0 THEN 1 END) AS BIGINT) FROM documents
    UNION ALL SELECT 'distinct_lang', CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
    UNION ALL SELECT 'distinct_source', CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents
    UNION ALL SELECT 'min_n_chars', CAST(MIN(n_chars) AS BIGINT) FROM documents
    UNION ALL SELECT 'max_n_chars', CAST(MAX(n_chars) AS BIGINT) FROM documents
"""

ORACLE_SQL["jaccard_pairs_08"] = r"""
    WITH tok AS MATERIALIZED (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '\w+')) AS t
        FROM documents),
    sz AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
    inter AS MATERIALIZED (
        SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS i
        FROM tok x JOIN tok y ON x.t = y.t AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
    SELECT a, b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 9) AS jaccard
    FROM inter JOIN sz sa ON sa.doc_id = inter.a
               JOIN sz sb ON sb.doc_id = inter.b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
"""

ORACLE_SQL["adamic_adar_top100"] = """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS src, l_partkey + 10000000 AS dst
        FROM lineitem),
    deg AS MATERIALIZED (
        SELECT dst, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY dst),
    w AS (
        SELECT dst, CAST(ROUND(1000000000 / LN(CAST(d AS DOUBLE))) AS BIGINT) AS wq
        FROM deg WHERE d >= 2),
    p AS (
        SELECT e1.src AS a, e2.src AS b, w.wq
        FROM e e1 JOIN e e2 ON e1.dst = e2.dst AND e1.src < e2.src
        JOIN w ON w.dst = e1.dst)
    SELECT a, b, CAST(SUM(wq) AS BIGINT) AS aa_e9
    FROM p GROUP BY a, b
    ORDER BY aa_e9 DESC, a, b
    LIMIT 100
"""

ORACLE_SQL["dominant_lang_per_source"] = """
    SELECT source, lang, n FROM (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY COUNT(*) DESC, lang ASC
               ) AS rn
        FROM documents GROUP BY source, lang
    ) WHERE rn = 1
"""

ORACLE_SQL["distinct_users_per_type"] = """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
"""

ORACLE_SQL["avg_nbr_indeg"] = f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS src,
               l_partkey + {PART_OFFSET} AS dst FROM lineitem
    ),
    indeg AS MATERIALIZED (
        SELECT dst, CAST(COUNT(*) AS BIGINT) AS ind FROM e GROUP BY dst
    )
    SELECT e.src, CAST(COUNT(*) AS BIGINT) AS outdeg,
           ROUND(CAST(SUM(i.ind) AS DOUBLE) / COUNT(*), 9) AS avg_nbr_indeg
    FROM e JOIN indeg i USING (dst)
    GROUP BY e.src
"""

ORACLE_SQL["degree_assortativity"] = f"""
    WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS src,
               l_partkey + {PART_OFFSET} AS dst FROM lineitem
    ),
    od AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS x FROM e GROUP BY src
    ),
    idg AS MATERIALIZED (
        SELECT dst, CAST(COUNT(*) AS BIGINT) AS y FROM e GROUP BY dst
    ),
    q AS MATERIALIZED (
        SELECT x, y FROM e JOIN od USING (src) JOIN idg USING (dst)
    ),
    m AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM q
    )
    SELECT 'all' AS k,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
                 (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) *
                  SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr
    FROM m
"""

ORACLE_SQL["bfs_depth_histogram"] = (
    "WITH b AS ("
    + _bfs_unrolled_sql(_BFS_ORACLE_ROUNDS)
    + ") SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_vertices "
    "FROM b GROUP BY dist"
)

ORACLE_SQL["csv_roundtrip"] = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

ORACLE_SQL["value_hour_corr_by_type"] = """
    WITH q AS MATERIALIZED (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS x,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y
        FROM events
    ),
    m AS MATERIALIZED (
        SELECT event_type, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM q GROUP BY event_type
    )
    SELECT event_type,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
                 (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) *
                  SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 9) AS corr
    FROM m
"""

ORACLE_SQL["cohort_retention"] = """
    WITH ud AS MATERIALIZED (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events
    ),
    f AS MATERIALIZED (
        SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY user_id
    )
    SELECT f.cohort_day, ud.day, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ud JOIN f USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["events_value_deciles"] = """
    WITH r AS MATERIALIZED (
        SELECT value,
               NTILE(10) OVER (ORDER BY value, event_id) AS decile
        FROM events
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 9) AS vmin,
           ROUND(MAX(value), 9) AS vmax
    FROM r GROUP BY decile
"""

ORACLE_SQL["fk_orphan_report"] = """
    SELECT 'lineitem_to_orders' AS relation,
           CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS BIGINT) AS n_keys,
           CAST((SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT) AS n_orphan_keys
    UNION ALL
    SELECT 'orders_to_customer',
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_to_part',
           CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT l_partkey) FROM lineitem
                 WHERE l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT)
    UNION ALL
    SELECT 'customer_without_orders',
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer
                 WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS BIGINT)
    UNION ALL
    SELECT 'part_without_lineitems',
           CAST((SELECT COUNT(DISTINCT p_partkey) FROM part) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT p_partkey) FROM part
                 WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem)) AS BIGINT)
    UNION ALL
    SELECT 'events_to_customer',
           CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT),
           CAST((SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE user_id NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
"""

ORACLE_SQL["local_clustering_tri"] = f"""
    WITH e1 AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e2 AS MATERIALIZED (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    e3 AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem
    ),
    tri AS MATERIALIZED (
        SELECT e1.o AS o, e1.p AS p, e2.s AS s
        FROM e1 JOIN e2 ON e1.p = e2.p
                JOIN e3 ON e2.s = e3.s AND e3.o = e1.o
    ),
    tc AS MATERIALIZED (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
            SELECT o AS vid FROM tri
            UNION ALL SELECT p + {PART_OFFSET} FROM tri
            UNION ALL SELECT s + {SUPP_OFFSET} FROM tri
        ) GROUP BY vid
    ),
    und AS MATERIALIZED (
        SELECT o AS a, p + {PART_OFFSET} AS b FROM e1
        UNION SELECT p + {PART_OFFSET}, s + {SUPP_OFFSET} FROM e2
        UNION SELECT o, s + {SUPP_OFFSET} FROM e3
    ),
    degs AS MATERIALIZED (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS vid FROM und UNION ALL SELECT b FROM und
        ) GROUP BY vid
    )
    SELECT t.vid, t.n_tri, d.deg,
           ROUND(2.0 * t.n_tri / (d.deg * (d.deg - 1)), 9) AS lcc
    FROM tc t JOIN degs d USING (vid)
"""

ORACLE_SQL["canonical_dedup_docs"] = r"""
    SELECT sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
               AS norm_sha256,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS dup_count
    FROM documents GROUP BY 1
"""

ORACLE_SQL["jsonl_roundtrip"] = """
    SELECT doc_id, text, lang, source, n_chars FROM documents
"""

ORACLE_SQL["docs_cube_counts"] = """
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""

ORACLE_SQL["doc_percent_rank"] = """
    SELECT doc_id, n_chars,
           ROUND(PERCENT_RANK() OVER (ORDER BY n_chars, doc_id), 9) AS pr
    FROM documents
"""

ORACLE_SQL["user_event_seq"] = """
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events
    )
    SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS seq
    FROM ranked WHERE rn <= 5
    GROUP BY user_id
"""

ORACLE_SQL["orders_above_cust_avg"] = """
    -- the engine evaluates mean = sum/count in float64; mirror exactly
    WITH a AS MATERIALIZED (
        SELECT o_custkey,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) AS sm
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o JOIN a USING (o_custkey)
    WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > a.sm / a.n
"""

ORACLE_SQL["user_growth_curve"] = """
    WITH f AS MATERIALIZED (
        SELECT user_id, MIN(epoch_us(ts)) AS m FROM events GROUP BY user_id
    ),
    d AS MATERIALIZED (
        SELECT CAST(m // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS new_users
        FROM f GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM d
"""

ORACLE_SQL["events_running_total"] = """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CAST(ROUND(value * 100) AS BIGINT) AS cents,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id
                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS running_cents
    FROM events
"""

ORACLE_SQL["user_event_path"] = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id)
               AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
"""

ORACLE_SQL["ipc_roundtrip"] = """
    SELECT event_id, ts, user_id, event_type, value, props FROM events
"""

ORACLE_SQL["dedup_keep_best_docs"] = r"""
    WITH c AS (
        SELECT doc_id, n_chars,
               sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS norm_sha256
        FROM documents
    )
    SELECT norm_sha256, doc_id, n_chars, CAST(dup_count AS BIGINT) AS dup_count
    FROM (
        SELECT norm_sha256, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY norm_sha256
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY norm_sha256) AS dup_count
        FROM c
    )
    WHERE rn = 1
"""

ORACLE_SQL["part_pair_top100"] = """
    WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM pp a JOIN pp b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 100
"""

ORACLE_SQL["doc_len_minmax_scaled"] = """
    SELECT doc_id, source, n_chars,
           CASE WHEN MAX(n_chars) OVER (PARTITION BY source)
                     = MIN(n_chars) OVER (PARTITION BY source)
                THEN 0.0
                ELSE CAST(n_chars - MIN(n_chars) OVER (PARTITION BY source)
                          AS DOUBLE)
                     / (MAX(n_chars) OVER (PARTITION BY source)
                        - MIN(n_chars) OVER (PARTITION BY source))
           END AS scaled
    FROM documents
"""

ORACLE_SQL["event_value_mad_outliers"] = """
    WITH c AS MATERIALIZED (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    m AS MATERIALIZED (
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
        FROM c GROUP BY 1
    ),
    d AS MATERIALIZED (
        SELECT c.event_type, ABS(c.cents - m.med) AS dev, m.med
        FROM c JOIN m USING (event_type)
    ),
    md AS MATERIALIZED (
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS mad
        FROM d GROUP BY 1
    )
    SELECT d.event_type,
           CAST(d.med AS BIGINT) AS med,
           CAST(md.mad AS BIGINT) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM d JOIN md USING (event_type)
    GROUP BY 1, 2, 3
"""

ORACLE_SQL["tri_edge_support"] = f"""
    WITH e1 AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    e2 AS MATERIALIZED (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    e3 AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, l_orderkey AS o FROM lineitem
    ),
    tri AS MATERIALIZED (
        SELECT e1.o AS o, e1.p AS p, e2.s AS s
        FROM e1 JOIN e2 ON e1.p = e2.p
                JOIN e3 ON e2.s = e3.s AND e3.o = e1.o
    ),
    cred AS MATERIALIZED (
        SELECT LEAST(o, p + {PART_OFFSET}) AS a,
               GREATEST(o, p + {PART_OFFSET}) AS b FROM tri
        UNION ALL
        SELECT LEAST(p + {PART_OFFSET}, s + {SUPP_OFFSET}),
               GREATEST(p + {PART_OFFSET}, s + {SUPP_OFFSET}) FROM tri
        UNION ALL
        SELECT LEAST(o, s + {SUPP_OFFSET}),
               GREATEST(o, s + {SUPP_OFFSET}) FROM tri
    )
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS support
    FROM cred GROUP BY a, b
"""

ORACLE_SQL["order_trend_by_priority"] = """
    WITH q AS MATERIALIZED (
        SELECT o_orderpriority,
               CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS x,
               CAST(ROUND(o_totalprice) AS BIGINT) AS y
        FROM orders
    ),
    m AS MATERIALIZED (
        SELECT o_orderpriority, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx
        FROM q GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0 THEN
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
                     (CAST(n AS DOUBLE) * sxx - sx * sx), 9)
           END AS slope,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0 THEN
               ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) /
                            (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                     / n, 9)
           END AS intercept,
           CAST(n AS BIGINT) AS n
    FROM m
"""

ORACLE_SQL["order_price_winsorized"] = """
    WITH q AS MATERIALIZED (
        SELECT o_orderkey, o_orderpriority,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    b AS MATERIALIZED (
        SELECT o_orderpriority,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS hi
        FROM q GROUP BY o_orderpriority
    )
    SELECT q.o_orderkey, q.o_orderpriority, q.cents,
           CAST(LEAST(GREATEST(q.cents, b.lo), b.hi) AS BIGINT) AS clipped
    FROM q JOIN b USING (o_orderpriority)
"""

ORACLE_SQL["docs_weighted_sample_100"] = """
    SELECT doc_id, n_chars FROM (
        SELECT doc_id, n_chars,
               ln((CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) >> 11
                        AS DOUBLE) + 1) / 9007199254740992.0)
               / n_chars AS es_key
        FROM documents WHERE n_chars > 0
    ) ORDER BY es_key DESC LIMIT 100
"""

ORACLE_SQL["lang_entropy_per_source"] = """
    WITH c AS MATERIALIZED (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           ROUND(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 9) AS entropy,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM c GROUP BY source
"""

ORACLE_SQL["ktruss_4"] = _ktruss_unrolled_sql(4, _KTRUSS_ORACLE_ROUNDS)

ORACLE_SQL["events_user_weighted_2"] = """
    WITH q AS MATERIALIZED (
        SELECT user_id, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    r AS MATERIALIZED (
        SELECT user_id, event_id, cents,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ln((CAST(md5_number_lower(
                                     CAST(event_id AS VARCHAR)) >> 11
                                     AS DOUBLE) + 1)
                               / 9007199254740992.0) / cents DESC,
                            event_id) AS rn
        FROM q WHERE cents > 0
    )
    SELECT user_id, event_id, cents FROM r WHERE rn <= 2
"""

ORACLE_SQL["daily_active_users"] = """
    SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM events
    GROUP BY 1
"""

ORACLE_SQL["event_transitions_top20"] = """
    WITH seq AS MATERIALIZED (
        SELECT event_type AS next_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, prev_type, next_type
    LIMIT 20
"""

ORACLE_SQL["user_diversity_histogram"] = """
    SELECT CAST(k AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (
        SELECT user_id, COUNT(DISTINCT event_type) AS k
        FROM events GROUP BY user_id
    )
    GROUP BY k
"""

ORACLE_SQL["wmedian_price_by_flag"] = """
    WITH agg AS MATERIALIZED (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS MATERIALIZED (
        SELECT l_returnflag, cents,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM agg
    )
    SELECT l_returnflag, CAST(MIN(cents) AS BIGINT) AS wmedian_cents
    FROM c WHERE cw * 2 >= tw GROUP BY l_returnflag
"""

ORACLE_SQL["docs_above_source_p75"] = """
    WITH thr AS MATERIALIZED (
        SELECT source,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS p75
        FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN thr ON d.source = thr.source
    WHERE d.n_chars > thr.p75
"""

ORACLE_SQL["harmonic_centrality_3"] = _harmonic_oracle_sql(_BFS_ORACLE_ROUNDS)

ORACLE_SQL["part_customer_breadth_top25"] = """
    SELECT l_partkey,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    ORDER BY n_customers DESC, l_partkey
    LIMIT 25
"""

ORACLE_SQL["cc_size_histogram"] = f"""
    SELECT CAST(sz AS BIGINT) AS component_size,
           CAST(COUNT(*) AS BIGINT) AS n_components
    FROM (
        SELECT label, COUNT(*) AS sz
        FROM ({_cc_unrolled_sql(_CC_ORACLE_ROUNDS)})
        GROUP BY label
    )
    GROUP BY sz
"""

ORACLE_SQL["events_user_sum_7d"] = """
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cents_7d
    FROM events
"""

ORACLE_SQL["doc_len_percent_rank"] = """
    SELECT doc_id, source, n_chars,
           ROUND(PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY n_chars
           ), 9) AS pr
    FROM documents
"""

ORACLE_SQL["top_parts_per_nation"] = """
    WITH rev AS MATERIALIZED (
        SELECT s.s_nationkey, l.l_partkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS sum_rev_e4
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    rk AS MATERIALIZED (
        SELECT s_nationkey, l_partkey, sum_rev_e4,
               ROW_NUMBER() OVER (
                   PARTITION BY s_nationkey
                   ORDER BY sum_rev_e4 DESC, l_partkey
               ) AS rn
        FROM rev
    )
    SELECT n.n_name, rk.l_partkey, rk.sum_rev_e4
    FROM rk JOIN nation n ON n.n_nationkey = rk.s_nationkey
    WHERE rn <= 3
"""

# Dict order IS the driver's check order, and the driver's correctness
# harness only checks the FIRST 50 entries.  Ordering policy (round 5):
# never-driver-checked entries first, then entries whose last green row
# is oldest, with long-green round-1 veterans rotated to the tail (they
# remain covered by pytest goldens regardless).
QUERIES = {
    # -- new in round-5 session 4 (never driver-checked) --
    "events_rolling_sum5": events_rolling_sum5,
    "events_latest_per_user": events_latest_per_user,
    "doc_ntile4": doc_ntile4,
    "events_daily_pivot": events_daily_pivot,
    "winnow_fingerprints": winnow_fingerprints,
    "twohop_counts": twohop_counts,
    "doc_zscore": doc_zscore,
    "documents_profile": documents_profile,
    "user_event_seq": user_event_seq,
    "orders_above_cust_avg": orders_above_cust_avg,
    "user_growth_curve": user_growth_curve,
    "jaccard_pairs_08": jaccard_pairs_08,
    "adamic_adar_top100": adamic_adar_top100,
    "docs_cube_counts": docs_cube_counts,
    "doc_percent_rank": doc_percent_rank,
    "dominant_lang_per_source": dominant_lang_per_source,
    "distinct_users_per_type": distinct_users_per_type,
    "avg_nbr_indeg": avg_nbr_indeg,
    "canonical_dedup_docs": canonical_dedup_docs,
    "jsonl_roundtrip": jsonl_roundtrip,
    "local_clustering_tri": local_clustering_tri,
    "events_value_deciles": events_value_deciles,
    "fk_orphan_report": fk_orphan_report,
    "value_hour_corr_by_type": value_hour_corr_by_type,
    "cohort_retention": cohort_retention,
    "csv_roundtrip": csv_roundtrip,
    "degree_assortativity": degree_assortativity,
    "bfs_depth_histogram": bfs_depth_histogram,
    # -- never driver-checked before round 5 --
    "orders_with_lineitems_bloom": orders_with_lineitems_bloom,
    "pricing_summary": pricing_summary,
    "lineitem_enriched_merge": lineitem_enriched_merge,
    "embedding_near_dup_ivf_planted": embedding_near_dup_ivf_planted,
    "decontam_3gram": decontam_3gram,
    "pii_planted": pii_planted,
    "bpeish_planted": bpeish_planted,
    "doc_chunks": doc_chunks,
    "events_funnel": events_funnel,
    "repetition_stats": repetition_stats,
    "minhash_dedup_corpus": minhash_dedup_corpus,
    "mixture_sample": mixture_sample,
    "epoch_shuffle": epoch_shuffle,
    "token_histogram": token_histogram,
    "sssp_weighted": sssp_weighted,
    "embedding_centroids": embedding_centroids,
    "cms_registers_tokens": cms_registers_tokens,
    "degree_histogram": degree_histogram,
    "bfs_multi3": bfs_multi3,
    "token_percentiles_by_source": token_percentiles_by_source,
    "length_band_docs": length_band_docs,
    "events_json_field_sum": events_json_field_sum,
    # -- green in r3, fell outside r4's 50-row window --
    "orders_enriched": orders_enriched,
    "events_lag": events_lag,
    "hll_registers_parts": hll_registers_parts,
    "approx_distinct_parts": approx_distinct_parts,
    "orders_without_lineitems": orders_without_lineitems,
    "parts_with_lineitems": parts_with_lineitems,
    # -- newest operators (r4) --
    "bfs_hops": bfs_hops,
    "hits_3": hits_3,
    "wpr10": wpr10,
    "kcore_3": kcore_3,
    "tfidf_scores": tfidf_scores,
    "heavy_hitter_tokens": heavy_hitter_tokens,
    "bigram_top100": bigram_top100,
    "doc_packing": doc_packing,
    "events_user_sample_5": events_user_sample_5,
    # -- core graph + dedup/text surface --
    "pagerank10": pagerank10,
    "pagerank10_bsp": pagerank10_bsp,
    "ppr10": ppr10,
    "cc_labels": cc_labels,
    "triangles_tripartite": triangles_tripartite,
    "dedup_exact": dedup_exact,
    "ann_topk": ann_topk,
    "embedding_near_dup": embedding_near_dup,
    "embedding_near_dup_ivf": embedding_near_dup_ivf,
    "embedding_near_dup_ivf_full": embedding_near_dup_ivf_full,
    "simhash_near_dup_pairs": simhash_near_dup_pairs,
    "lpa_labels": lpa_labels,
    "lpa_labels_bsp": lpa_labels_bsp,
    "minhash_dedup": minhash_dedup,
    "minhash_planted": minhash_planted,
    "simhash_fingerprints": simhash_fingerprints,
    "text_analysis": text_analysis,
    "langid_planted": langid_planted,
    "text_quality": text_quality,
    "pr_superstep1_salted": pr_superstep1_salted,
    "graph_stats": graph_stats,
    "prepleti_triple": prepleti_triple,
    "events_tumbling": events_tumbling,
    "events_hopping": events_hopping,
    "events_sessions": events_sessions,
    "vocab_top50": vocab_top50,
    "train_val_test_split": train_val_test_split,
    "token_percentiles": token_percentiles,
    "events_top3_per_user": events_top3_per_user,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "events_sample": events_sample,
    # -- long-green round-1 veterans (pytest-golden covered; rotate back
    #    into the 50-row window next round) --
    "edges_project": edges_project,
    "out_degree": out_degree,
    "sinks": sinks,
    "pr_superstep1": pr_superstep1,
    "toprank_superstep": toprank_superstep,
    "ranksum_superstep": ranksum_superstep,
    "sha256_documents": sha256_documents,
    "token_count": token_count,
    "doc_stats": doc_stats,
    # --- round-5 session-5 additions: past the driver's 50-row window
    # (it is saturated with this round's earlier entries); evidence is
    # pytest + the local oracle-parity harness at sf0.001/sf0.01.
    "events_running_total": events_running_total,
    "user_event_path": user_event_path,
    "ipc_roundtrip": ipc_roundtrip,
    "dedup_keep_best_docs": dedup_keep_best_docs,
    "part_pair_top100": part_pair_top100,
    "doc_len_minmax_scaled": doc_len_minmax_scaled,
    "event_value_mad_outliers": event_value_mad_outliers,
    # --- round-5 session-6 additions: same past-the-window evidence
    # (pytest test_entry_contract parametrizes over EVERY oracle key, and
    # the local parity harness runs them at sf0.001 + sf0.01).
    "tri_edge_support": tri_edge_support,
    "order_trend_by_priority": order_trend_by_priority,
    "order_price_winsorized": order_price_winsorized,
    "docs_weighted_sample_100": docs_weighted_sample_100,
    "lang_entropy_per_source": lang_entropy_per_source,
    "ktruss_4": ktruss_4,
    "events_user_weighted_2": events_user_weighted_2,
    "daily_active_users": daily_active_users,
    "event_transitions_top20": event_transitions_top20,
    "top_parts_per_nation": top_parts_per_nation,
    "doc_len_percent_rank": doc_len_percent_rank,
    "events_user_sum_7d": events_user_sum_7d,
    "cc_size_histogram": cc_size_histogram,
    "part_customer_breadth_top25": part_customer_breadth_top25,
    "harmonic_centrality_3": harmonic_centrality_3,
    "docs_above_source_p75": docs_above_source_p75,
    "wmedian_price_by_flag": wmedian_price_by_flag,
    "user_diversity_histogram": user_diversity_histogram,
}
