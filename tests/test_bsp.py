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
