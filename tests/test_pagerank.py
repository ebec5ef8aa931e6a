"""Distributed (Ray Data) PageRank vs goldens and the sequential oracle."""

import math

import numpy as np
import pytest

from engine import oracle
from engine.ingest import read_snap, read_snap_edges_local
from engine.pagerank import pagerank

from .conftest import FIXTURES

GOLDEN_ITERS = {"mini": 25, "small": 29, "sink": 44}


@pytest.mark.parametrize("name", list(FIXTURES))
def test_pagerank_matches_reference_goldens(name):
    path = FIXTURES[name]
    edges_local = read_snap_edges_local(path)
    ref, iters = oracle.pagerank_ref(edges_local)

    res = pagerank(read_snap(path), iterations=iters)
    assert res.iterations == iters
    got = res.as_dict()
    assert set(got) == set(ref)
    for v, want in ref.items():
        assert abs(got[v] - want) < 1e-6, (name, v)
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


@pytest.mark.parametrize("name", list(FIXTURES))
def test_freeze_stop_matches_reference(name):
    """--stop ref distributed: the per-vertex freeze rule at 1e-16 must
    reproduce the reference's exact iteration counts (goldens 25/29/44)
    and ranks — in BOTH distributed engines, not just the sequential
    oracle."""
    from engine.bsp import bsp_pagerank

    path = FIXTURES[name]
    ref, iters = oracle.pagerank_ref(read_snap_edges_local(path))
    assert iters == GOLDEN_ITERS[name]

    res = pagerank(read_snap(path), freeze_delta=oracle.REF_DELTA)
    assert res.iterations == iters, name
    got = res.as_dict()
    for v, want in ref.items():
        assert abs(got[v] - want) < 1e-12, (name, v)

    resb = bsp_pagerank(
        read_snap(path), freeze_delta=oracle.REF_DELTA, num_shards=3
    )
    assert resb.iterations == iters, name
    gotb = resb.as_dict()
    for v, want in ref.items():
        assert abs(gotb[v] - want) < 1e-12, (name, v)


def test_freeze_with_checkpoint_rejected(tmp_path):
    path = FIXTURES["mini"]
    with pytest.raises(ValueError, match="not combinable"):
        pagerank(
            read_snap(path), freeze_delta=1e-16, checkpoint_dir=str(tmp_path)
        )


def test_personalized_pagerank_matches_numpy():
    """PPR with teleport mass split over two seeds vs a dense numpy
    reference on the cyclic 'small' fixture (exercises both the teleport
    base and the dangling restart-to-seed path)."""
    path = FIXTURES["small"]
    edges = read_snap_edges_local(path)
    ids = sorted({v for e in edges for v in e})
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    t = np.zeros(n)
    t[pos[ids[0]]] = 0.7
    t[pos[ids[3]]] = 0.3
    # dense reference
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[pos[s]] += 1
    d = 0.85
    rank = t.copy()
    for _ in range(10):
        contrib = np.zeros(n)
        for s, dst in edges:
            contrib[pos[dst]] += rank[pos[s]] / outdeg[pos[s]]
        coef = (1 - d) + d * rank[outdeg == 0].sum()
        rank = coef * t + d * contrib
    res = pagerank(read_snap(path), iterations=10, teleport=t)
    got = res.as_dict()
    for i, v in enumerate(ids):
        assert abs(got[v] - rank[i]) < 1e-12, v
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-9)


def test_ppr_invalid_teleport_rejected():
    """A teleport vector with negative entries or Σt ≠ 1 must raise, not
    silently produce non-probability ranks."""
    import pytest

    path = FIXTURES["mini"]
    edges = read_snap_edges_local(path)
    n = len({v for e in edges for v in e})
    bad_sum = np.full(n, 0.9 / n)
    with pytest.raises(ValueError, match="sum to 1"):
        pagerank(read_snap(path), iterations=1, teleport=bad_sum)
    neg = np.full(n, 1.0 / n)
    neg[0], neg[1] = -0.5, neg[1] + 0.5 + 1.0 / n
    with pytest.raises(ValueError, match="negative"):
        pagerank(read_snap(path), iterations=1, teleport=neg)


def test_pagerank_l1_stop():
    path = FIXTURES["mini"]
    res = pagerank(read_snap(path), eps=1e-6)
    assert res.metrics[-1]["l1_residual"] < 1e-6
    want, _ = oracle.pagerank_sync_l1(read_snap_edges_local(path), eps=1e-6)
    got = res.as_dict()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_pagerank_salted_equals_unsalted_star():
    """North-rule N9: a heavy-hitter hub through the salted two-phase
    aggregation equals the plain path bit-for-bit-ish."""
    import pyarrow as pa
    import ray.data

    n = 500
    src = np.arange(1, n + 1, dtype=np.uint64)
    dst = np.zeros(n, dtype=np.uint64)  # star: everyone → 0
    tbl = pa.table({"src": pa.array(src, type=pa.uint64()),
                    "dst": pa.array(dst, type=pa.uint64())})
    ds = ray.data.from_arrow(tbl).repartition(8)
    plain = pagerank(ds, iterations=5)
    salted = pagerank(ray.data.from_arrow(tbl).repartition(8), iterations=5,
                      salted=True, heavy_indeg_threshold=10)
    np.testing.assert_allclose(plain.ranks, salted.ranks, atol=1e-12)


def test_salt_spreads_across_batches():
    """The per-batch salt must spread one heavy key's partials over >1
    sub-key across batches (a constant salt would re-concentrate the skew
    on a single reducer)."""
    import pyarrow as pa
    import ray

    from engine.pagerank import _make_contrib_fn

    rank_ref = ray.put(np.full(100, 0.01))
    heavy_ref = ray.put(np.array([0], dtype=np.uint64))
    contrib = _make_contrib_fn(rank_ref, heavy_ref, num_salts=8)
    salts = set()
    for start in range(1, 90, 10):  # 9 batches, all pointing at dst 0
        src = np.arange(start, start + 10, dtype=np.uint64)
        batch = pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(np.zeros(10, dtype=np.uint64), type=pa.uint64()),
                "inv_outdeg": pa.array(np.ones(10)),
            }
        )
        out = contrib(batch)
        salts.update(out.column("salt").to_pylist())
    assert len(salts) > 1


def test_topk():
    res = pagerank(read_snap(FIXTURES["small"]), iterations=29)
    top = res.top_k(4)
    assert top.column("id").to_pylist() == [4, 3, 5, 0]
    bot = res.top_k(1, ascending=True)
    assert abs(bot.column("rank").to_pylist()[0] - 2.079594e-02) < 1e-6


def test_agreement_by_value():
    from engine.bsp import bsp_pagerank
    from engine.pagerank import agreement

    path = FIXTURES["mini"]
    a = pagerank(read_snap(path), iterations=10)
    b = bsp_pagerank(read_snap(path), iterations=10, num_shards=3)
    assert agreement(a, b) == 1.0
    c = pagerank(read_snap(path), iterations=3)
    assert agreement(a, c) < 1.0
