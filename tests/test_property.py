"""Property-based testing (SURVEY.md §5.4): random seeded digraphs, engine
vs sequential oracle. Hypothesis generates edge lists; the Ray session is
shared (conftest), so examples are kept small and deadline disabled."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from engine import oracle
from engine.components import connected_components
from engine.pagerank import pagerank

edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.uint64()),
                "dst": pa.array([b for _, b in edges], type=pa.uint64()),
            }
        )
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_pagerank_matches_oracle_on_random_graphs(edges):
    want = oracle.pagerank_sync(edges, iterations=5)
    res = pagerank(_ds(edges), iterations=5)
    got = res.as_dict()
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_cc_matches_oracle_on_random_graphs(edges):
    want = oracle.connected_components(edges)
    got, _ = connected_components(_ds(edges))
    assert got == want


def test_pagerank_multigraph_semantics():
    """Duplicate edges count twice (ref: src/Graph.cpp:92-97); the engine
    must match the oracle on a multigraph with duplicates and self-loops."""
    edges = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 2), (2, 0)]
    want = oracle.pagerank_sync(edges, iterations=8)
    got = pagerank(_ds(edges), iterations=8).as_dict()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # and differs from the deduped graph (proving duplicates matter)
    dedup = oracle.pagerank_sync(list(set(edges)), iterations=8)
    assert any(abs(dedup[v] - want[v]) > 1e-6 for v in want)
