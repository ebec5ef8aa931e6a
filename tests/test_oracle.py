"""The sequential oracle must reproduce the reference's golden outputs
(captured from the compiled `no-cl` binary — FIXTURES.md §A)."""

import math

from engine import oracle
from engine.ingest import read_snap_edges_local

from .conftest import FIXTURES

GOLDEN_ITERS = {"mini": 25, "small": 29, "sink": 44}

GOLDEN_SPOT = {
    "mini": {0: 1.493000e-01, 5: 1.493000e-01, 3: 1.471301e-01,
             4: 1.410594e-01, 7: 6.157655e-02, 8: 6.157655e-02,
             6: 6.157655e-02},
    "small": {4: 3.401206e-02, 3: 3.358554e-02, 5: 3.355170e-02,
              0: 3.103162e-02},
    "sink": {0: 20.0 / 57.0, 1: 37.0 / 57.0},
}


def test_ref_oracle_golden():
    for name, path in FIXTURES.items():
        edges = read_snap_edges_local(path)
        ranks, iters = oracle.pagerank_ref(edges)
        assert iters == GOLDEN_ITERS[name], name
        assert math.isclose(sum(ranks.values()), 1.0, abs_tol=1e-9), name
        for vid, want in GOLDEN_SPOT[name].items():
            assert math.isclose(ranks[vid], want, abs_tol=5e-7), (name, vid)


def test_sync_matches_ref_at_golden_iters():
    """SURVEY §7.6: plain synchronous iteration == freeze semantics to far
    below 1e-6 at the reference's own iteration count."""
    for name, path in FIXTURES.items():
        edges = read_snap_edges_local(path)
        ref, iters = oracle.pagerank_ref(edges)
        sync = oracle.pagerank_sync(edges, iterations=iters)
        for v in ref:
            assert abs(ref[v] - sync[v]) < 1e-9, (name, v)


def test_cc_oracle():
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    cc = oracle.connected_components(edges)
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[20] == 20


def test_triangle_oracle():
    # K4 has 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert oracle.triangle_count(k4) == 4
    assert oracle.triangle_count([(0, 1), (1, 2)]) == 0
    # duplicate + reversed edges collapse
    assert oracle.triangle_count([(0, 1), (1, 0), (1, 2), (2, 0), (0, 2)]) == 1
