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
