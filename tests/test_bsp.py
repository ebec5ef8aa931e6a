"""Shard-actor BSP engine vs goldens / oracles."""

import numpy as np
import pytest

from engine import oracle
from engine.bsp import bsp_connected_components, bsp_pagerank
from engine.ingest import read_snap, read_snap_edges_local

from .conftest import FIXTURES


@pytest.mark.parametrize("name", list(FIXTURES))
def test_bsp_pagerank_matches_goldens(name):
    path = FIXTURES[name]
    ref, iters = oracle.pagerank_ref(read_snap_edges_local(path))
    res = bsp_pagerank(read_snap(path), iterations=iters, num_shards=3)
    got = res.as_dict()
    assert set(got) == set(ref)
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-6, (name, v)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_bsp_matches_dataset_engine():
    from engine.pagerank import pagerank

    path = FIXTURES["small"]
    a = pagerank(read_snap(path), iterations=12)
    b = bsp_pagerank(read_snap(path), iterations=12, num_shards=4)
    np.testing.assert_allclose(a.ranks, b.ranks, atol=1e-12)


def test_bsp_l1_stop():
    path = FIXTURES["mini"]
    res = bsp_pagerank(read_snap(path), eps=1e-6, num_shards=2)
    assert res.metrics[-1]["l1_residual"] < 1e-6
    want, iters = oracle.pagerank_sync_l1(read_snap_edges_local(path), eps=1e-6)
    assert res.iterations == iters
    got = res.as_dict()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


@pytest.mark.parametrize("name", ["mini", "small", "sink"])
def test_bsp_connected_components(name):
    path = FIXTURES[name]
    edges = read_snap_edges_local(path)
    want = oracle.connected_components(edges)
    got, _ = bsp_connected_components(read_snap(path), num_shards=3)
    assert got == want


@pytest.mark.parametrize("name", ["mini", "small"])
def test_bsp_lpa_matches_dataset_engine(name):
    from engine.bsp import bsp_label_propagation
    from engine.labelprop import label_propagation

    want = label_propagation(read_snap(FIXTURES[name]), iterations=3)
    got = bsp_label_propagation(read_snap(FIXTURES[name]), iterations=3,
                                num_shards=3)
    assert got == want


def test_bsp_lpa_random_graph():
    import pyarrow as pa
    import ray.data

    from engine.bsp import bsp_label_propagation
    from engine.labelprop import label_propagation

    rng = np.random.default_rng(11)
    e = rng.integers(0, 30, size=(80, 2))
    edges = [(int(a), int(b)) for a, b in e if a != b]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in edges], type=pa.uint64()),
            "dst": pa.array([b for _, b in edges], type=pa.uint64()),
        }
    )
    want = label_propagation(ray.data.from_arrow(tbl), iterations=2)
    got = bsp_label_propagation(ray.data.from_arrow(tbl), iterations=2,
                                num_shards=2)
    assert got == want


def test_bsp_pagerank_dataset_native():
    """End-to-end Dataset path (join dictionary in, decode join out) equals
    the dataset engine — no O(V) driver state on the BSP side."""
    from engine.bsp import bsp_pagerank_dataset
    from engine.pagerank import pagerank

    path = FIXTURES["small"]
    a = pagerank(read_snap(path), iterations=12)
    ds, iters, _ = bsp_pagerank_dataset(read_snap(path), iterations=12,
                                        num_shards=3)
    assert iters == 12
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert df["id"].tolist() == list(a.ids)
    np.testing.assert_allclose(df["rank"].to_numpy(), a.ranks, atol=1e-12)


def test_bsp_cc_dataset_native():
    from engine.bsp import bsp_connected_components_dataset

    path = FIXTURES["small"]
    want = oracle.connected_components(read_snap_edges_local(path))
    ds, _ = bsp_connected_components_dataset(read_snap(path), num_shards=3)
    df = ds.to_pandas()
    got = dict(zip(df["id"].astype(int), df["label_id"].astype(int)))
    assert got == want


def test_bsp_cc_two_components():
    import pyarrow as pa
    import ray.data

    # two chains + an isolated pair, ids deliberately sparse
    e = [(100, 5), (5, 7), (7, 100), (200, 300)]
    tbl = pa.table(
        {
            "src": pa.array([a for a, _ in e], type=pa.uint64()),
            "dst": pa.array([b for _, b in e], type=pa.uint64()),
        }
    )
    got, _ = bsp_connected_components(ray.data.from_arrow(tbl), num_shards=2)
    assert got == {100: 5, 5: 5, 7: 5, 200: 200, 300: 200}


def _random_edges_ds(seed=11, n_v=80, m=500):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {"src": rng.integers(0, n_v, m), "dst": rng.integers(0, n_v, m)}
    ).astype("int64")
    return rd.from_pandas(df)


def test_node_grouped_exchange_bit_identical():
    """The node-grouped exchange must produce BIT-IDENTICAL results for
    any grouping (G only re-slices the shipped value arrays; combine
    order is unchanged): PageRank ranks, CC labels, LPA labels."""
    import ray.data as rd

    from engine import graph as G
    from engine.bsp import BSPGraph

    edges = _random_edges_ds().materialize()
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids).materialize()
    sym = G.symmetrize(enc).materialize()

    base_ranks = base_cc = base_lpa = None
    for g in (1, 2, 3, 6):
        bsp = BSPGraph(enc, n=len(ids), num_shards=6, num_node_groups=g)
        ds, _, _ = bsp.pagerank(iterations=8)
        ranks = ds.sort("vid").to_pandas()["rank"].to_numpy()
        stats = bsp.exchange_stats()
        assert stats["grouped_cross_bytes"] <= stats["ungrouped_cross_bytes"]
        if g == 1:
            assert stats["grouped_cross_bytes"] == 0
        bsp.shutdown()

        bsp_cc = BSPGraph(
            enc, n=len(ids), num_shards=6, symmetric_copy=True,
            num_node_groups=g,
        )
        cc, _ = bsp_cc.connected_components()
        cc_l = cc.sort("vid").to_pandas()["label"].to_numpy()
        bsp_cc.shutdown()

        bsp_lpa = BSPGraph(sym, n=len(ids), num_shards=6, num_node_groups=g)
        lpa = bsp_lpa.label_propagation(iterations=4, assume_symmetric=True)
        lpa_l = lpa.sort("vid").to_pandas()["label"].to_numpy()
        bsp_lpa.shutdown()

        if base_ranks is None:
            base_ranks, base_cc, base_lpa = ranks, cc_l, lpa_l
        else:
            assert (ranks == base_ranks).all(), g  # bit-identical
            assert (cc_l == base_cc).all(), g
            assert (lpa_l == base_lpa).all(), g


def test_node_grouped_exchange_cross_bytes_scale_with_groups():
    """Cross-group traffic under grouping must be bounded by the data
    destined off-group — strictly below the ungrouped G-times-fetch
    baseline on a graph with any locality."""
    from engine import graph as G
    from engine.bsp import BSPGraph

    edges = _random_edges_ds(seed=7, n_v=200, m=3000).materialize()
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    bsp = BSPGraph(enc, n=len(ids), num_shards=8, num_node_groups=4)
    s = bsp.exchange_stats()
    bsp.shutdown()
    assert s["num_node_groups"] == 4
    # grouped ships each source's off-group slices once; ungrouped ships
    # the FULL combined array to every other group
    assert 0 < s["grouped_cross_bytes"] < s["ungrouped_cross_bytes"]
    # per-source: off-group slices sum to <= full array; with 4 groups the
    # ungrouped baseline is 3x full, so grouped <= ungrouped / 3
    assert s["grouped_cross_bytes"] * 3 <= s["ungrouped_cross_bytes"]


def test_bsp_pagerank_repeat_call_is_idempotent():
    """A second pagerank() on the same BSPGraph must reset state, not
    warm-start from the first run's ranks/frozen mask."""
    import pyarrow as pa
    import ray.data as rd

    from engine import graph as G
    from engine.bsp import BSPGraph

    path = FIXTURES["small"]
    edges = read_snap(path)
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=3)
    a = g.pagerank(iterations=7)[0].to_pandas().sort_values("vid")
    b = g.pagerank(iterations=7)[0].to_pandas().sort_values("vid")
    np.testing.assert_array_equal(
        a["rank"].to_numpy(), b["rank"].to_numpy()
    )
    # freeze mode too: second run must converge at the same count
    i1 = g.pagerank(freeze_delta=1e-16)[1]
    i2 = g.pagerank(freeze_delta=1e-16)[1]
    assert i1 == i2 and i1 > 2
    g.shutdown()


def test_bsp_bfs_rejects_bad_source_and_lpa_requires_symmetry():
    from engine import graph as G
    from engine.bsp import BSPGraph

    edges = read_snap(FIXTURES["small"])
    ids = G.vertex_ids(edges)
    enc = G.encode_edges(edges, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=2, symmetric_copy=True)
    with pytest.raises(ValueError, match="out of range"):
        g.bfs(source_vid=-1)
    with pytest.raises(ValueError, match="out of range"):
        g.bfs(source_vid=len(ids))
    g.shutdown()
    # directed build: undirected algorithms must refuse
    gd = BSPGraph(enc, n=len(ids), num_shards=2)
    with pytest.raises(ValueError, match="undirected"):
        gd.label_propagation(iterations=1)
    gd.shutdown()


def test_bsp_cc_dataset_empty_input():
    import pyarrow as pa
    import ray.data as rd

    from engine.bsp import bsp_connected_components_dataset

    empty = rd.from_arrow(
        pa.table(
            {"src": pa.array([], type=pa.int64()),
             "dst": pa.array([], type=pa.int64())}
        )
    )
    ds, rounds = bsp_connected_components_dataset(empty, num_shards=2)
    assert ds.count() == 0
