"""2-hop neighborhood counts (engine/neighborhood.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from engine.neighborhood import twohop_counts


def _brute(edges: pd.DataFrame) -> dict:
    nbrs = {}
    by_dst = edges.groupby("dst")["src"].apply(set)
    for srcs in by_dst:
        for a in srcs:
            nbrs.setdefault(a, set()).update(srcs - {a})
    return {a: len(s) for a, s in nbrs.items() if s}


def test_twohop_matches_bruteforce():
    rng = np.random.default_rng(17)
    n = 800
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 60, n).astype("int64"),
            "dst": rng.integers(1000, 1040, n).astype("int64"),
        }
    ).drop_duplicates()
    want = _brute(df)
    out = twohop_counts(rd.from_pandas(df).repartition(9)).to_pandas()
    got = dict(zip(out["src"], out["n_twohop"]))
    assert got == want


def test_twohop_no_shared_neighbors():
    # disjoint dsts: every group has degree 1 → empty result
    df = pd.DataFrame({"src": [1, 2, 3], "dst": [10, 11, 12]})
    ds = twohop_counts(rd.from_pandas(df))
    assert ds.count() == 0
    # (to_pandas() on an empty arrow dataset drops column names — a Ray
    # quirk shared by every empty-result path; check the schema instead)
    assert ds.schema().names == ["src", "n_twohop"]


def test_twohop_cap_truncates_hot_group():
    # one dst shared by 10 srcs, cap=4 → only the 4 smallest srcs pair up
    df = pd.DataFrame({"src": np.arange(10, dtype="int64"), "dst": 7})
    out = twohop_counts(rd.from_pandas(df), cap=4).to_pandas()
    got = dict(zip(out["src"], out["n_twohop"]))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_twohop_rejects_out_of_range_ids():
    df = pd.DataFrame({"src": [-1, 5], "dst": [7, 7]})
    with pytest.raises(Exception):  # surfaces as a RayTaskError(ValueError)
        twohop_counts(rd.from_pandas(df)).to_pandas()


def test_adamic_adar_matches_bruteforce():
    import math

    from engine.neighborhood import adamic_adar_topk

    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 40, n).astype("int64"),
            "dst": rng.integers(0, 30, n).astype("int64"),
        }
    ).drop_duplicates()
    want = {}
    for _, g in df.groupby("dst"):
        a = sorted(set(g["src"]))
        if len(a) < 2:
            continue
        wq = round(1e9 / math.log(len(a)))
        for i in range(len(a)):
            for j in range(i + 1, len(a)):
                want[(a[i], a[j])] = want.get((a[i], a[j]), 0) + wq
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = adamic_adar_topk(
        rd.from_pandas(df).repartition(7), k=10
    ).to_pandas()
    got = [((int(r.a), int(r.b)), int(r.aa_e9)) for r in out.itertuples()]
    assert got == top


def test_avg_neighbor_degree_matches_pandas():
    """avg_neighbor_degree == per-src mean in-degree of dst neighbors,
    exact under many partitions (one sort amortized over sum+count)."""
    from engine.neighborhood import avg_neighbor_degree

    rng = np.random.default_rng(41)
    n = 900
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 70, n).astype("int64"),
            "dst": rng.integers(1000, 1050, n).astype("int64"),
        }
    ).drop_duplicates()
    ind = df.groupby("dst").size()
    j = df.assign(ind=df["dst"].map(ind))
    want = j.groupby("src").agg(
        outdeg=("ind", "size"), avg=("ind", "mean")
    )
    out = (
        avg_neighbor_degree(rd.from_pandas(df).repartition(11))
        .to_pandas()
        .set_index("src")
        .sort_index()
    )
    assert (out["outdeg"] == want["outdeg"]).all()
    np.testing.assert_allclose(
        out["avg_nbr_indeg"].to_numpy(),
        np.round(want["avg"].to_numpy(), 9),
        atol=1e-12,
    )
