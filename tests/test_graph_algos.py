"""Dataset-native CC / LPA / triangles vs exact oracles (north-rule: exact)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from engine import oracle
from engine.components import connected_components
from engine.ingest import read_snap, read_snap_edges_local
from engine.labelprop import label_propagation
from engine.triangles import triangle_count

from .conftest import FIXTURES


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.uint64()),
                "dst": pa.array([b for _, b in edges], type=pa.uint64()),
            }
        )
    )


@pytest.mark.parametrize("name", list(FIXTURES))
def test_cc_matches_oracle(name):
    edges = read_snap_edges_local(FIXTURES[name])
    want = oracle.connected_components(edges)
    got, _ = connected_components(read_snap(FIXTURES[name]))
    assert got == want


def test_cc_multiple_components():
    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (100, 100)]
    got, _ = connected_components(_ds(edges))
    assert got == oracle.connected_components(edges)


@pytest.mark.parametrize("name", ["mini", "small"])
@pytest.mark.parametrize("iters", [1, 3])
def test_lpa_matches_oracle(name, iters):
    edges = read_snap_edges_local(FIXTURES[name])
    want = oracle.label_propagation(edges, iterations=iters)
    got = label_propagation(read_snap(FIXTURES[name]), iterations=iters)
    assert got == want


@pytest.mark.parametrize("name", ["mini", "small"])
def test_encode_edges_join_equals_broadcast(name):
    """The distributed join dictionary assigns the same dense vids as the
    broadcast searchsorted dictionary (same sort-by-id order)."""
    from engine import graph as G

    edges = read_snap(FIXTURES[name])
    ids = G.vertex_ids(edges)
    want = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in G.encode_edges(edges, ids).take_all()
    )
    enc, n = G.encode_edges_join(read_snap(FIXTURES[name]))
    got = sorted((int(r["src"]), int(r["dst"])) for r in enc.take_all())
    assert n == len(ids)
    assert got == want


def test_encode_join_sparse_ids():
    from engine import graph as G

    edges = [(10**9, 7), (7, 10**12), (10**12, 10**9), (5, 5)]
    ids = G.vertex_ids(_ds(edges))
    want = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in G.encode_edges(_ds(edges), ids).take_all()
    )
    enc, n = G.encode_edges_join(_ds(edges))
    got = sorted((int(r["src"]), int(r["dst"])) for r in enc.take_all())
    assert n == 4 and got == want


@pytest.mark.parametrize("name", ["mini", "small"])
def test_encode_edges_service_equals_broadcast(name):
    """The dictionary-actor service assigns the same dense vids as the
    broadcast searchsorted dictionary (same sort-by-id order)."""
    from engine import graph as G

    edges = read_snap(FIXTURES[name])
    ids = G.vertex_ids(edges)
    want = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in G.encode_edges(edges, ids).take_all()
    )
    enc, n = G.encode_edges_service(read_snap(FIXTURES[name]), num_shards=3)
    got = sorted((int(r["src"]), int(r["dst"])) for r in enc.take_all())
    assert n == len(ids)
    assert got == want


def test_encode_service_sparse_ids():
    from engine import graph as G

    edges = [(10**9, 7), (7, 10**12), (10**12, 10**9), (5, 5)]
    ids = G.vertex_ids(_ds(edges))
    want = sorted(
        (int(r["src"]), int(r["dst"]))
        for r in G.encode_edges(_ds(edges), ids).take_all()
    )
    enc, n = G.encode_edges_service(_ds(edges), num_shards=2)
    got = sorted((int(r["src"]), int(r["dst"])) for r in enc.take_all())
    assert n == 4 and got == want


def test_encode_service_unknown_id_raises():
    """A caller-supplied partial dictionary must fail loudly, not silently
    clamp-encode unseen ids to a wrong vid."""
    from engine import graph as G

    edges = _ds([(1, 2), (2, 3), (3, 1)])
    # partial dictionary: id 3 is missing
    verts = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2], type=pa.uint64()),
                "vid": pa.array([0, 1], type=pa.uint64()),
            }
        )
    )
    enc, _n = G.encode_edges_service(edges, vertices=verts, num_shards=2)
    with pytest.raises(Exception, match="not in vertex dictionary"):
        enc.take_all()


def test_auto_dictionary_string_ids(monkeypatch):
    """auto above the join-dict threshold must route STRING-id graphs to
    the Dataset join (the hash service requires numeric ids)."""
    from engine.pagerank import pagerank

    monkeypatch.setenv("GRAFT_JOIN_DICT_EDGES", "1")
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["a", "b", "c", "a"], type=pa.string()),
                "dst": pa.array(["b", "c", "a", "c"], type=pa.string()),
            }
        )
    )
    res = pagerank(edges, iterations=3)
    assert sorted(res.ids.tolist()) == ["a", "b", "c"]
    np.testing.assert_allclose(res.ranks.sum(), 1.0, atol=1e-9)


def test_prepared_graph_service_dictionary():
    """PageRank through the dictionary-service build equals broadcast."""
    from engine.pagerank import _PreparedGraph, pagerank

    path = FIXTURES["small"]
    a = pagerank(read_snap(path), iterations=8)
    g = _PreparedGraph(read_snap(path), dictionary="service")
    b = pagerank(read_snap(path), iterations=8, prepared=g)
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(a.ranks, b.ranks, atol=1e-15)


def test_prepared_graph_join_dictionary():
    """PageRank through the join-dictionary build equals the broadcast
    build."""
    from engine.pagerank import _PreparedGraph, pagerank

    path = FIXTURES["small"]
    a = pagerank(read_snap(path), iterations=8)
    g = _PreparedGraph(read_snap(path), dictionary="join")
    b = pagerank(read_snap(path), iterations=8, prepared=g)
    np.testing.assert_array_equal(a.ids, b.ids)
    np.testing.assert_allclose(a.ranks, b.ranks, atol=1e-15)


def test_cc_lpa_dataset_outputs():
    """Dataset-native CC/LPA outputs match the dict APIs."""
    from engine.components import connected_components, connected_components_dataset
    from engine.labelprop import label_propagation, label_propagation_dataset

    edges = [(1, 2), (2, 3), (10, 11), (12, 11), (100, 100)]
    want_cc, _ = connected_components(_ds(edges))
    ds, _ = connected_components_dataset(_ds(edges))
    df = ds.to_pandas()
    assert dict(zip(df["id"].astype(int), df["label"].astype(int))) == want_cc
    want_lpa = label_propagation(_ds(edges), iterations=2)
    df2 = label_propagation_dataset(_ds(edges), iterations=2).to_pandas()
    assert dict(zip(df2["id"].astype(int), df2["label"].astype(int))) == want_lpa


@pytest.mark.parametrize(
    "edges,want",
    [
        ([(a, b) for a in range(4) for b in range(a + 1, 4)], 4),  # K4
        ([(0, 1), (1, 2)], 0),
        ([(0, 1), (1, 0), (1, 2), (2, 0), (0, 2)], 1),  # dups/reversed collapse
    ],
)
def test_triangles_basic(edges, want):
    assert triangle_count(_ds(edges)) == want


@pytest.mark.parametrize("name", list(FIXTURES))
def test_triangles_fixtures(name):
    edges = read_snap_edges_local(FIXTURES[name])
    want = oracle.triangle_count(edges)
    got = triangle_count(read_snap(FIXTURES[name]))
    assert got == want


def test_triangles_random_graph():
    rng = np.random.default_rng(42)
    e = rng.integers(0, 40, size=(300, 2))
    edges = [(int(a), int(b)) for a, b in e]
    want = oracle.triangle_count(edges)
    got = triangle_count(_ds(edges), method="join", num_partitions=2)
    assert got == want


def test_triangles_shard_path():
    """Shard-actor wedge closing ≡ oracle on dense and random graphs
    (including shards that own no edges)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert triangle_count(_ds(k4), method="shard", num_partitions=3) == 4
    rng = np.random.default_rng(11)
    e = rng.integers(0, 60, size=(500, 2))
    edges = [(int(a), int(b)) for a, b in e]
    want = oracle.triangle_count(edges)
    got = triangle_count(_ds(edges), method="shard", num_partitions=4)
    assert got == want


def test_lpa_random_graph():
    rng = np.random.default_rng(7)
    e = rng.integers(0, 30, size=(80, 2))
    edges = [(int(a), int(b)) for a, b in e if a != b]
    assert label_propagation(_ds(edges), iterations=2) == oracle.label_propagation(
        edges, iterations=2
    )


def test_cc_random_graph():
    rng = np.random.default_rng(3)
    e = rng.integers(0, 200, size=(150, 2))
    edges = [(int(a), int(b)) for a, b in e]
    got, _ = connected_components(_ds(edges))
    assert got == oracle.connected_components(edges)


def test_kcore_path_graph_multi_round():
    """A path graph peels from both ends, one layer per round — exercises
    genuinely iterative convergence (the lineitem graph stabilizes in one
    peel)."""
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore

    n = 20
    edges = pd.DataFrame(
        {"src": list(range(n - 1)), "dst": list(range(1, n))}
    ).astype("int64")
    ids, alive, rounds = kcore(rd.from_pandas(edges), k=2)
    # 2-core of a path is empty, reached after ~n/2 peels
    assert alive.sum() == 0
    assert rounds >= 5


def test_kcore_matches_numpy_peeling():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore

    rng = np.random.default_rng(5)
    m = 400
    edges = pd.DataFrame(
        {"src": rng.integers(0, 60, m), "dst": rng.integers(60, 120, m)}
    ).astype("int64")
    edges = edges.drop_duplicates().reset_index(drop=True)

    for k in (2, 3, 4):
        cs, ct = edges.src.to_numpy().copy(), edges.dst.to_numpy().copy()
        while True:
            ids_, inv = np.unique(np.concatenate([cs, ct]), return_inverse=True)
            deg = np.bincount(inv)
            keep = ids_[deg >= k]
            msk = np.isin(cs, keep) & np.isin(ct, keep)
            if msk.all():
                break
            cs, ct = cs[msk], ct[msk]
        want = set(np.unique(np.concatenate([cs, ct]))) if len(cs) else set()
        ids, alive, _ = kcore(rd.from_pandas(edges), k=k)
        assert set(ids[alive]) == want, k


def test_kcore_dedupe_handles_dirty_input():
    """Duplicate edges, both-direction copies and self-loops must not
    inflate degrees when dedupe=True (the CLI SNAP path)."""
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore

    # triangle 0-1-2: every vertex has undirected degree 2
    clean = pd.DataFrame(
        {"src": [0, 1, 2], "dst": [1, 2, 0]}
    ).astype("int64")
    dirty = pd.DataFrame(
        {
            "src": [0, 1, 2, 1, 2, 0, 0, 1, 1],
            "dst": [1, 2, 0, 0, 1, 2, 0, 1, 2],  # reversed + self-loops + dup
        }
    ).astype("int64")
    ids_c, alive_c, _ = kcore(rd.from_pandas(clean), k=2)
    ids_d, alive_d, _ = kcore(rd.from_pandas(dirty), k=2, dedupe=True)
    assert set(ids_c[alive_c]) == {0, 1, 2}
    assert set(ids_d[alive_d]) == {0, 1, 2}
    # without dedupe the dirty input would keep a fake 3-core alive
    _, alive_clean3, _ = kcore(rd.from_pandas(clean), k=3)
    assert alive_clean3.sum() == 0
    _, alive_d3, _ = kcore(rd.from_pandas(dirty), k=3, dedupe=True)
    assert alive_d3.sum() == 0


def test_distinct_count_sort_based():
    import pandas as pd
    import ray.data as rd

    from engine.graph import distinct_count

    df = pd.DataFrame({"label": np.repeat(np.arange(37), 13)}).astype("int64")
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(8)
    assert distinct_count(ds, "label") == 37


def test_kcore_bsp_matches_dataset_engine():
    """Distributed shard-actor peeling must produce the same (unique)
    k-core as the broadcast-mask Dataset peel, with the same round-count
    semantics."""
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore, kcore_bsp

    rng = np.random.default_rng(9)
    m = 500
    edges = (
        pd.DataFrame(
            {"src": rng.integers(0, 70, m), "dst": rng.integers(70, 140, m)}
        )
        .astype("int64")
        .drop_duplicates()
    )
    for k in (2, 3):
        ids, alive, rounds_ds = kcore(rd.from_pandas(edges), k=k)
        want = set(ids[alive].astype(np.int64))
        got_ds, rounds_bsp = kcore_bsp(rd.from_pandas(edges), k=k, num_shards=3)
        got = set(got_ds.to_pandas()["vid"])
        assert got == want, k
        assert rounds_bsp == rounds_ds, k


def test_kcore_bsp_path_graph_multi_round():
    """Path graph peels one layer per round from both ends — exercises
    genuinely iterative distributed peeling."""
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore_bsp

    n = 20
    edges = pd.DataFrame(
        {"src": list(range(n - 1)), "dst": list(range(1, n))}
    ).astype("int64")
    ds, rounds = kcore_bsp(rd.from_pandas(edges), k=2, num_shards=3)
    assert ds.count() == 0
    assert rounds >= 5


def _bsp_from_edges(edges, num_shards=3):
    from engine import graph as G
    from engine.bsp import BSPGraph

    ds = _ds(edges)
    ids = G.vertex_ids(ds)
    enc = G.encode_edges(ds, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=num_shards, symmetric_copy=True)
    return g, ids


def test_bfs_path_and_unreached_component():
    """BFS from the min vertex over a path + a disconnected pair: exact
    hop distances, sentinel (n) on the unreached component, rounds =
    eccentricity + 1 (the confirming fixpoint pass)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    g, ids = _bsp_from_edges(edges)
    ds, rounds = g.bfs(source_vid=0)
    g.shutdown()
    n = len(ids)
    df = ds.to_pandas()
    dist = {int(ids[v]): int(d) for v, d in zip(df["vid"], df["label"])}
    assert {k: v for k, v in dist.items() if v < n} == {
        0: 0, 1: 1, 2: 2, 3: 3, 4: 4
    }
    assert dist[10] == n and dist[11] == n
    assert rounds == 5  # 4 propagation rounds + the no-change pass


def test_sssp_weighted_matches_dijkstra():
    """BSP weighted SSSP (Bellman-Ford min-plus) vs driver-side Dijkstra
    with the identical deterministic dense-vid-pair weight formula —
    exact integer distances, unreached vertices absent."""
    import heapq

    from engine.bsp import SSSP_SENTINEL

    rng = np.random.default_rng(5)
    m = 300
    edges = sorted(
        {(int(a), int(b)) for a, b in zip(rng.integers(0, 50, m),
                                          rng.integers(50, 100, m))}
    )
    g, ids = _bsp_from_edges(edges, num_shards=4)
    ds, rounds = g.sssp(source_vid=0, wmod=9)
    g.shutdown()
    df = ds.to_pandas()
    got = {
        int(ids[v]): int(d)
        for v, d in zip(df["vid"], df["label"])
        if d < SSSP_SENTINEL
    }
    dv = {int(x): i for i, x in enumerate(ids)}

    def w(u_, t_):
        a, b = sorted((dv[u_], dv[t_]))
        return 1 + ((a % 97) * 31 + b % 89) % 9

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    src = int(ids[0])
    dist = {src: 0}
    h = [(0, src)]
    while h:
        d0, u = heapq.heappop(h)
        if d0 > dist.get(u, 1 << 62):
            continue
        for t_ in adj.get(u, []):
            nd = d0 + w(u, t_)
            if nd < dist.get(t_, 1 << 62):
                dist[t_] = nd
                heapq.heappush(h, (nd, t_))
    assert got == dist
    assert rounds >= 2  # at least one propagation + the fixpoint pass


def test_sssp_rejects_directed_build_and_bad_args():
    from engine import graph as G
    from engine.bsp import BSPGraph

    ds = _ds([(0, 1), (1, 2)])
    ids = G.vertex_ids(ds)
    enc = G.encode_edges(ds, ids)
    gd = BSPGraph(enc, n=len(ids), num_shards=2)
    with pytest.raises(ValueError, match="undirected"):
        gd.sssp(source_vid=0)
    with pytest.raises(ValueError, match="out of range"):
        gd.sssp(source_vid=-1, assume_symmetric=True)
    with pytest.raises(ValueError, match="wmod"):
        gd.sssp(source_vid=0, wmod=0, assume_symmetric=True)
    gd.shutdown()


def test_bfs_matches_python_bfs_random():
    from collections import deque

    rng = np.random.default_rng(11)
    m = 400
    edges = sorted(
        {(int(a), int(b)) for a, b in zip(rng.integers(0, 60, m),
                                          rng.integers(60, 120, m))}
    )
    g, ids = _bsp_from_edges(edges, num_shards=4)
    ds, _ = g.bfs(source_vid=0)
    g.shutdown()
    n = len(ids)
    # python BFS over the undirected graph from the smallest original id
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    src = int(ids[0])
    want = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in want:
                want[w] = want[u] + 1
                q.append(w)
    df = ds.to_pandas()
    got = {
        int(ids[v]): int(d) for v, d in zip(df["vid"], df["label"]) if d < n
    }
    assert got == want


def test_hits_matches_dense_numpy():
    """Unnormalized integer HITS vs the dense matrix iteration — exact."""
    from engine import graph as G
    from engine.hits import hits

    rng = np.random.default_rng(5)
    m = 300
    edges = sorted(
        {(int(a), int(b)) for a, b in zip(rng.integers(0, 40, m),
                                          rng.integers(0, 40, m)) if a != b}
    )
    ds = _ds(edges)
    ids = G.vertex_ids(ds)
    enc = G.encode_edges(ds, ids)
    n = len(ids)
    auth, hub = hits(enc, n, iterations=3)
    id2ix = {int(v): i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for a, b in edges:
        A[id2ix[a], id2ix[b]] = 1.0
    h = np.ones(n)
    for _ in range(3):
        a_vec = A.T @ h
        h = A @ a_vec
    np.testing.assert_array_equal(auth, a_vec)
    np.testing.assert_array_equal(hub, h)


def test_weighted_pagerank_matches_dense_numpy():
    """Chained-ref weighted PR vs the dense numpy fixpoint; weights=1
    degenerates to classic PR (cross-checked against the oracle engine)."""
    import pandas as pd
    import ray.data as rd

    from engine.wpr import weighted_pagerank

    rng = np.random.default_rng(13)
    m = 200
    raw = {(int(a), int(b)) for a, b in zip(rng.integers(0, 30, m),
                                            rng.integers(0, 30, m)) if a != b}
    edges = sorted(raw)
    w = rng.integers(1, 6, len(edges)).astype(float)
    n = 30
    df = pd.DataFrame({"src": [a for a, _ in edges],
                       "dst": [b for _, b in edges], "w": w})
    got = weighted_pagerank(rd.from_pandas(df).repartition(5), n, iterations=7)
    # dense reference
    ws = np.zeros(n)
    for (a, b), wi in zip(edges, w):
        ws[a] += wi
    sinks = ws == 0
    rank = np.full(n, 1.0 / n)
    d = 0.85
    for _ in range(7):
        coef = (1.0 - d) + d * rank[sinks].sum()
        new = np.full(n, coef / n)
        for (a, b), wi in zip(edges, w):
            new[b] += d * rank[a] * (wi * (1.0 / ws[a]))
        rank = new
    np.testing.assert_allclose(got, rank, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9
    # weights all 1 == classic PR
    from engine import oracle

    df1 = df.assign(w=1.0)
    got1 = weighted_pagerank(rd.from_pandas(df1).repartition(5), n, iterations=5)
    want1 = oracle.pagerank_sync(edges, iterations=5)
    for v, r in want1.items():
        assert abs(got1[v] - r) < 1e-12


def test_hits_zero_iterations_raises():
    import pytest
    import ray.data as rd

    from engine.hits import hits

    enc = rd.from_items([{"src": 0, "dst": 1}])
    with pytest.raises(ValueError, match="iterations >= 1"):
        hits(enc, n=2, iterations=0)


def test_bfs_directed_build_raises_and_assume_symmetric_works():
    """ADVICE r4: bfs/cc/kcore on a directed-build BSPGraph must raise
    rather than silently return directed answers; pre-symmetrized input
    is allowed through assume_symmetric=True."""
    import pytest
    import ray.data as rd

    from engine import graph as G
    from engine.bsp import BSPGraph

    edges = rd.from_items(
        [{"src": 0, "dst": 1}, {"src": 1, "dst": 2}]
    )
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=2)
    try:
        with pytest.raises(ValueError, match="symmetric"):
            g.bfs(source_vid=0)
        with pytest.raises(ValueError, match="symmetric"):
            g.connected_components()
        with pytest.raises(ValueError, match="symmetric"):
            g.kcore(2)
    finally:
        g.shutdown()

    sym = G.symmetrize(enc)
    g2 = BSPGraph(sym, n=len(ids), num_shards=2)
    try:
        ds, _ = g2.bfs(source_vid=0, assume_symmetric=True)
        hops = ds.sort("vid").to_pandas()["label"].tolist()
        assert hops == [0, 1, 2]
    finally:
        g2.shutdown()


def test_kcore_prepared_build_reuse():
    """prepare_kcore_bsp builds once; repeated peels at different k on the
    same prepared graph match fresh-build runs (build amortization path,
    ADVICE/VERDICT r4 #5)."""
    import pandas as pd
    import ray.data as rd

    from engine.kcore import kcore_bsp, prepare_kcore_bsp

    rng = np.random.default_rng(11)
    m = 400
    edges = (
        pd.DataFrame(
            {"src": rng.integers(0, 60, m), "dst": rng.integers(60, 120, m)}
        )
        .astype("int64")
        .drop_duplicates()
    )
    ds = rd.from_pandas(edges)
    prep = prepare_kcore_bsp(ds, num_shards=3)
    try:
        for k in (2, 3):
            fresh, r_fresh = kcore_bsp(ds, k=k, num_shards=3)
            reused, r_reused = kcore_bsp(None, k=k, prepared=prep)
            assert set(reused.to_pandas()["vid"]) == set(
                fresh.to_pandas()["vid"]
            ), k
            assert r_reused == r_fresh, k
    finally:
        prep[0].shutdown()


def test_tree_merge_apply_matches_single_merge(monkeypatch):
    """Force the √B pre-merge to engage (fan-in threshold 2) and check
    hits / weighted_pagerank / pagerank reproduce the single-merge path
    (VERDICT r4 #6: the dense-tier apply must scale past one O(V) puller
    without changing results)."""
    import pandas as pd
    import ray.data as rd

    import engine.hits as H
    from engine import graph as G
    from engine.hits import hits
    from engine.pagerank import pagerank
    from engine.wpr import weighted_pagerank

    rng = np.random.default_rng(5)
    m = 3000
    edf = (
        pd.DataFrame(
            {"src": rng.integers(0, 200, m), "dst": rng.integers(0, 200, m)}
        )
        .astype("int64")
        .drop_duplicates()
    )
    edf = edf[edf.src != edf.dst]
    edges = rd.from_pandas(edf).repartition(16)
    ids = G.vertex_ids(edges)
    n = len(ids)
    enc = G.encode_edges(edges, ids).materialize()
    ew = enc.map_batches(
        lambda t: t.append_column(
            "w",
            pa.array(
                (t.column("src").to_numpy(zero_copy_only=False) % 5 + 1.0)
            ),
        ),
        batch_format="pyarrow",
    ).materialize()

    auth0, hub0 = hits(enc, n, iterations=3)
    w0 = weighted_pagerank(ew, n, iterations=5)
    pr0 = pagerank(edges, iterations=5)

    monkeypatch.setattr(H, "_TREE_MERGE_FANIN", 2)
    auth1, hub1 = hits(enc, n, iterations=3)
    w1 = weighted_pagerank(ew, n, iterations=5)
    pr1 = pagerank(edges, iterations=5)

    np.testing.assert_array_equal(auth0, auth1)  # exact ints: bit-equal
    np.testing.assert_array_equal(hub0, hub1)
    np.testing.assert_array_equal(w0, w1)  # raw sums, same add order
    np.testing.assert_allclose(pr0.ranks, pr1.ranks, rtol=0, atol=1e-15)


def test_encode_edges_rejects_missing_ids():
    """A partial dictionary must fail loudly, not encode clamped vids."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from engine import graph as G

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([10, 25], type=pa.int64()),
             "dst": pa.array([20, 30], type=pa.int64())}
        )
    )
    with pytest.raises(Exception, match="missing from the dictionary"):
        G.encode_edges(edges, np.array([10, 20, 30])).materialize()
    with pytest.raises(Exception, match="missing from the dictionary"):
        # id beyond the last dictionary entry (searchsorted returns n)
        G.encode_edges(edges, np.array([10, 20, 25])).materialize()


def test_vertex_ids_mixed_integer_widths():
    import pyarrow as pa
    import ray.data as rd

    from engine import graph as G

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array([3, 1], type=pa.int32()),
             "dst": pa.array([2, 3], type=pa.int64())}
        )
    )
    assert G.vertex_ids(edges).tolist() == [1, 2, 3]


def test_bfs_multi_source_nearest_landmark():
    """Multi-source BFS = hop distance to the NEAREST source: seeding a
    path end and an isolated pair covers both components in one run;
    single-source behavior is unchanged (the suite's other bfs tests)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (20, 21)]
    g, ids = _bsp_from_edges(edges)
    assert list(ids) == [0, 1, 2, 3, 4, 5, 20, 21]
    ds, rounds = g.bfs(source_vid=np.array([0, 6]))  # dense vids: ids 0, 20
    n = len(ids)
    df = ds.to_pandas()
    got = {int(ids[v]): int(d) for v, d in zip(df["vid"], df["label"]) if d < n}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 20: 0, 21: 1}
    assert rounds == 6  # ecc-from-source-set 5 + the no-change pass
    with pytest.raises(ValueError, match="out of range"):
        g.bfs(source_vid=np.array([], dtype=np.int64))
    with pytest.raises(ValueError, match="out of range"):
        g.bfs(source_vid=np.array([0, 99]))
    g.shutdown()


def test_local_clustering_matches_dense_oracle():
    """local_clustering == diag(A^3)/2 per-vertex triangles and the
    textbook lcc formula on a random multigraph (dups/self-loops in the
    input must collapse first)."""
    from engine.triangles import local_clustering

    rng = np.random.default_rng(7)
    e = rng.integers(0, 30, size=(250, 2))
    edges = [(int(a), int(b)) for a, b in e]
    n = 30
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = A[b, a] = 1
    tri = np.diag(A @ A @ A) // 2
    deg = A.sum(axis=1)
    out = local_clustering(_ds(edges)).to_pandas()
    got = {int(r.vid): (int(r.n_tri), int(r.deg), r.lcc) for r in out.itertuples()}
    want = {
        v: (int(tri[v]), int(deg[v]),
            np.round(2.0 * tri[v] / (deg[v] * (deg[v] - 1)), 9))
        for v in range(n)
        if tri[v] > 0
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0] and got[v][1] == want[v][1]
        assert got[v][2] == pytest.approx(want[v][2], abs=1e-12)
    # K4: every vertex in 3 triangles, lcc = 1
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out4 = local_clustering(_ds(k4)).to_pandas()
    assert sorted(out4["n_tri"]) == [3, 3, 3, 3]
    assert (out4["lcc"] == 1.0).all()
    # triangle-free graph: empty result with the right schema
    empty = local_clustering(_ds([(0, 1), (1, 2)]))
    assert empty.count() == 0


def test_edge_support_matches_dense_oracle():
    """edge_support == per-edge common-neighbor count ((A@A) masked to
    edges) on a random multigraph (dups/self-loops collapse first);
    K4 edges all carry support 2; triangle-free graph -> empty."""
    from engine.triangles import edge_support

    rng = np.random.default_rng(11)
    e = rng.integers(0, 30, size=(250, 2))
    edges = [(int(a), int(b)) for a, b in e]
    n = 30
    A = np.zeros((n, n), dtype=np.int64)
    for a, b in edges:
        if a != b:
            A[a, b] = A[b, a] = 1
    common = (A @ A) * A
    out = edge_support(_ds(edges)).to_pandas()
    got = {(int(r.a), int(r.b)): int(r.support) for r in out.itertuples()}
    want = {
        (a, b): int(common[a, b])
        for a in range(n)
        for b in range(a + 1, n)
        if A[a, b] and common[a, b] > 0
    }
    assert got == want
    assert all(a < b for a, b in got)
    # K4: all 6 edges in exactly 2 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out4 = edge_support(_ds(k4)).to_pandas()
    assert len(out4) == 6 and (out4["support"] == 2).all()
    # triangle-free: empty result (Ray 2.49 reports no schema for a
    # fully-empty dataset, so count is the contract here — matching
    # test_local_clustering_matches_dense_oracle)
    empty = edge_support(_ds([(0, 1), (1, 2)]))
    assert empty.count() == 0


def test_k_truss_matches_brute_force_peel():
    """k_truss == the textbook iterated support peel on a random
    multigraph; K5 ∪ pendant triangle at k=5 keeps exactly K5; k<3
    rejected; impossible k empties."""
    from engine.triangles import k_truss

    def brute(edges, n, k):
        A = np.zeros((n, n), dtype=np.int64)
        for a, b in edges:
            if a != b:
                A[a, b] = A[b, a] = 1
        while True:
            sup = (A @ A) * A
            drop = A.astype(bool) & (sup < k - 2)
            if not drop.any():
                break
            A[drop] = 0
        return {(a, b) for a in range(n) for b in range(a + 1, n) if A[a, b]}

    rng = np.random.default_rng(17)
    e = rng.integers(0, 24, size=(220, 2))
    edges = [(int(a), int(b)) for a, b in e]
    for k in (3, 4, 5):
        out, rounds = k_truss(_ds(edges), k)
        got = {(int(r.a), int(r.b)) for r in out.to_pandas().itertuples()}
        assert got == brute(edges, 24, k), k
        assert rounds >= 1
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    extra = [(4, 5), (5, 6), (4, 6)]
    out, _ = k_truss(_ds(k5 + extra), 5)
    assert {(int(r.a), int(r.b)) for r in out.to_pandas().itertuples()} == set(k5)
    out, _ = k_truss(_ds(k5 + extra), 9)
    assert out.count() == 0
    with pytest.raises(ValueError, match="k >= 3"):
        k_truss(_ds(k5), 2)


def test_cc_size_histogram_multi_component(tmp_path):
    """The sf graphs are one giant component, so the driver row only sees
    a 1-row histogram — plant a multi-component lineitem parquet (disjoint
    order/part ranges) and check sizes against union-find."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import ORACLE_SQL, QUERIES

    # component A: orders 1-3 all share part 1 (size 3 + 1 = 4 vertices)
    # component B: order 10 with parts 50, 51 (3 vertices)
    # component C: order 20 with part 60 (2 vertices) — sizes {4:1, 3:1, 2:1}
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 10, 10, 20],
            "l_partkey": [1, 1, 1, 50, 51, 60],
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(li), d / "lineitem.parquet")
    got = (
        QUERIES["cc_size_histogram"](str(d))
        .to_pandas()
        .sort_values("component_size")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[2, 1], [3, 1], [4, 1]]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    want = (
        con.execute(ORACLE_SQL["cc_size_histogram"])
        .fetchdf()
        .sort_values("component_size")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()


def test_harmonic_centrality_3_path_graph(tmp_path):
    """Hand-computed harmonic centralities on a 4-vertex path graph
    (1 — p100 — 2 — p101); sources are the 3 smallest ids (1, 2, p100)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import QUERIES, PART_OFFSET

    d = tmp_path / "sf"
    d.mkdir()
    li = pd.DataFrame(
        {"l_orderkey": [1, 2, 2], "l_partkey": [100, 100, 101]}
    )
    pq.write_table(pa.Table.from_pandas(li), d / "lineitem.parquet")
    got = (
        QUERIES["harmonic_centrality_3"](str(d))
        .to_pandas()
        .set_index("vid")["h_x720720"]
        .to_dict()
    )
    L = 720720
    assert got == {
        1: L // 2 + L,            # from 2 (d=2) and p100 (d=1)
        2: L // 2 + L,            # from 1 (d=2) and p100 (d=1)
        100 + PART_OFFSET: L + L,  # d=1 from both order sources
        101 + PART_OFFSET: L // 3 + L + L // 2,
    }
