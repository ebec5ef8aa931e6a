"""As-of join, banded range join (engine/joins.py) and sort-based set
ops (engine/setops.py) vs brute-force references, with block sizes forced
tiny so the cross-block carry/ownership chaining is actually exercised."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from engine.joins import asof_join, range_join
from engine.setops import except_keys, intersect_keys


@pytest.fixture()
def tiny_blocks():
    """Force many small sorted blocks so key runs span block boundaries."""
    ctx = rd.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024
    yield
    ctx.target_max_block_size = old


def _random_streams(seed, n_l=3000, n_r=2500, n_keys=23):
    rng = np.random.default_rng(seed)
    L = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_l),
            "t": rng.integers(0, 8000, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    R = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_r),
            "t": rng.integers(0, 8000, n_r).astype("int64"),
            "rid": np.arange(n_r, dtype="int64"),
            "rv": rng.normal(size=n_r),
        }
    )
    return L, R


def _asof_reference(L, R):
    rows = []
    groups = {k: g.sort_values(["t", "rid"]) for k, g in R.groupby("k")}
    for _, row in L.iterrows():
        g = groups.get(row.k)
        if g is None:
            continue
        cand = g[g.t <= row.t]
        if len(cand) == 0:
            continue
        best = cand.iloc[-1]  # max t, tie -> max rid (sorted last)
        rows.append((row.k, row.t, best.t, row.lid, best.rid, best.rv))
    return (
        pd.DataFrame(rows, columns=["k", "t", "t_r", "lid", "rid_r", "rv_r"])
        .sort_values("lid")
        .reset_index(drop=True)
    )


def test_asof_join_matches_bruteforce(tiny_blocks):
    L, R = _random_streams(7)
    out = asof_join(
        rd.from_pandas(L).repartition(16),
        rd.from_pandas(R).repartition(16),
        "k",
        "t",
        ["k", "t", "lid"],
        ["k", "t", "rid", "rv"],
        tie_col="rid",
    ).to_pandas()
    got = (
        out.sort_values("lid")
        .reset_index(drop=True)[["k", "t", "t_r", "lid", "rid_r", "rv_r"]]
        .astype({"k": "int64", "t": "int64", "t_r": "int64"})
    )
    ref = _asof_reference(L, R).astype(
        {"k": "int64", "t": "int64", "t_r": "int64", "lid": "int64", "rid_r": "int64"}
    )
    pd.testing.assert_frame_equal(got, ref)


def test_asof_join_equal_ts_tiebreak():
    """Right rows at the exact left timestamp match (inclusive), and among
    equal right timestamps the largest tie value wins deterministically."""
    L = pd.DataFrame({"k": [1, 1], "t": [10, 5], "lid": [0, 1]})
    L = L.astype({"k": "int64", "t": "int64", "lid": "int64"})
    R = pd.DataFrame(
        {"k": [1, 1, 1], "t": [10, 10, 4], "rid": [7, 9, 3]}
    ).astype("int64")
    out = asof_join(
        rd.from_pandas(L),
        rd.from_pandas(R),
        "k",
        "t",
        ["k", "t", "lid"],
        ["k", "t", "rid"],
        tie_col="rid",
    ).to_pandas()
    got = dict(zip(out.lid, out.rid_r))
    assert got == {0: 9, 1: 3}  # inclusive at t=10; max rid among ties


def test_asof_join_unmatched_left_dropped():
    L = pd.DataFrame({"k": [5], "t": [3], "lid": [0]}).astype("int64")
    R = pd.DataFrame({"k": [5], "t": [4], "rid": [1]}).astype("int64")
    out = asof_join(
        rd.from_pandas(L),
        rd.from_pandas(R),
        "k",
        "t",
        ["k", "t", "lid"],
        ["k", "t", "rid"],
    )
    # NB: .to_pandas() on an all-empty-blocks Dataset drops columns in Ray
    # 2.49 (same quirk as Dataset.join on empty partitions, CLAUDE.md) —
    # assert on the Dataset schema, which the operator does preserve
    assert set(out.schema().names) == {"k", "t", "t_r", "lid", "rid_r"}
    assert out.count() == 0


def test_asof_join_single_hot_key_spans_blocks(tiny_blocks):
    """One key with thousands of rows: the right-row carry must chain
    through many consecutive same-key blocks."""
    rng = np.random.default_rng(11)
    L = pd.DataFrame(
        {
            "k": np.ones(4000, dtype="int64"),
            "t": rng.integers(0, 100_000, 4000).astype("int64"),
            "lid": np.arange(4000, dtype="int64"),
        }
    )
    # sparse right side: long stretches of left-only rows between matches
    R = pd.DataFrame(
        {
            "k": np.ones(40, dtype="int64"),
            "t": rng.integers(0, 100_000, 40).astype("int64"),
            "rid": np.arange(40, dtype="int64"),
        }
    )
    out = asof_join(
        rd.from_pandas(L).repartition(16),
        rd.from_pandas(R),
        "k",
        "t",
        ["k", "t", "lid"],
        ["k", "t", "rid"],
        tie_col="rid",
    ).to_pandas()
    rs = R.sort_values(["t", "rid"])
    want = {}
    for _, row in L.iterrows():
        cand = rs[rs.t <= row.t]
        if len(cand):
            want[row.lid] = cand.iloc[-1].rid
    got = dict(zip(out.lid, out.rid_r))
    assert got == want


def test_range_join_matches_bruteforce(tiny_blocks):
    L, R = _random_streams(13)
    out = range_join(
        rd.from_pandas(L).repartition(16),
        rd.from_pandas(R).repartition(16),
        "k",
        "t",
        200,
        ["k", "t", "lid"],
        ["k", "t", "rid"],
    ).to_pandas()
    m = L.merge(R, on="k", suffixes=("_l", "_r"))
    m = m[(m.t_l - m.t_r).abs() <= 200]
    assert set(zip(out.lid, out.rid_r)) == set(zip(m.lid, m.rid))
    # each qualifying pair exactly once (the bucket-replication no-dup claim)
    assert len(out) == len(m)


def test_range_join_window_boundary_inclusive():
    L = pd.DataFrame({"k": [1], "t": [100], "lid": [0]}).astype("int64")
    R = pd.DataFrame(
        {"k": [1, 1, 1], "t": [50, 150, 151], "rid": [0, 1, 2]}
    ).astype("int64")
    out = range_join(
        rd.from_pandas(L),
        rd.from_pandas(R),
        "k",
        "t",
        50,
        ["k", "t", "lid"],
        ["k", "t", "rid"],
    ).to_pandas()
    assert sorted(out.rid_r) == [0, 1]  # |Δ| = 50 in, 51 out


def _setop_inputs(seed):
    rng = np.random.default_rng(seed)
    A = pd.DataFrame({"k": rng.integers(0, 400, 15000).astype("int64")})
    B = pd.DataFrame({"k": rng.integers(200, 600, 15000).astype("int64")})
    return A, B


def test_setops_match_python_sets(tiny_blocks):
    A, B = _setop_inputs(3)
    a = rd.from_pandas(A).repartition(17)
    b = rd.from_pandas(B).repartition(13)
    ex = sorted(except_keys(a, b, "k").to_pandas().k)
    it = sorted(intersect_keys(a, b, "k").to_pandas().k)
    sa, sb = set(A.k), set(B.k)
    assert ex == sorted(sa - sb)
    assert it == sorted(sa & sb)


def test_setops_empty_result_keeps_schema():
    A = pd.DataFrame({"k": np.arange(10, dtype="int64")})
    out = except_keys(rd.from_pandas(A), rd.from_pandas(A), "k").to_pandas()
    assert len(out) == 0


def test_setops_duplicate_heavy_single_key(tiny_blocks):
    """A single key duplicated across many blocks on both sides must be
    aggregated across the whole run, not per block."""
    A = pd.DataFrame({"k": np.full(5000, 42, dtype="int64")})
    B = pd.DataFrame({"k": np.full(1, 42, dtype="int64")})
    a = rd.from_pandas(A).repartition(16)
    assert except_keys(a, rd.from_pandas(B), "k").count() == 0
    assert list(intersect_keys(a, rd.from_pandas(B), "k").to_pandas().k) == [42]
    other = rd.from_pandas(pd.DataFrame({"k": np.array([7], dtype="int64")}))
    assert list(except_keys(a, other, "k").to_pandas().k) == [42]


def test_broadcast_join_inner():
    import pandas as pd
    import ray.data as rd

    from engine.joins import broadcast_join

    L = pd.DataFrame({"k": [1, 2, 3, 2, 9], "x": [10, 20, 30, 40, 50]}).astype("int64")
    R = pd.DataFrame({"k": [1, 2, 3], "name": ["a", "b", "c"]})
    R["k"] = R["k"].astype("int64")
    out = (
        broadcast_join(rd.from_pandas(L), rd.from_pandas(R), "k", ["name"])
        .to_pandas()
        .sort_values(["k", "x"])
        .reset_index(drop=True)
    )
    # k=9 has no match and is dropped (inner)
    assert len(out) == 4
    assert list(out.name) == ["a", "b", "b", "c"]


def test_lag_per_key_matches_pandas(tiny_blocks):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.joins import lag_per_key

    rng = np.random.default_rng(23)
    n = 6000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 7, n),  # few keys -> runs span many blocks
            "t": rng.integers(0, 1_000_000, n),
            "eid": np.arange(n),
        }
    ).astype("int64")
    out = lag_per_key(
        rd.from_pandas(df).repartition(16),
        key_col="k",
        order_col="t",
        value_col="t",
        out_col="prev_t",
        tie_col="eid",
    ).to_pandas()
    ref = df.sort_values(["k", "t", "eid"]).copy()
    ref["prev_t"] = ref.groupby("k")["t"].shift(1)
    ref = ref.dropna(subset=["prev_t"]).astype({"prev_t": "int64"})
    a = out.sort_values(["k", "t", "eid"]).reset_index(drop=True)
    b = ref.sort_values(["k", "t", "eid"]).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)


def test_join_input_validation():
    import pandas as pd
    import ray.data as rd

    from engine.joins import asof_join, range_join

    L = pd.DataFrame({"k": [1], "t": [1], "x_r": [1]}).astype("int64")
    R = pd.DataFrame({"k": [1], "t": [1], "x": [1]}).astype("int64")
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_pandas(L), rd.from_pandas(R), "k", "t",
                  ["k", "t", "x_r"], ["k", "t", "x"])
    with pytest.raises(ValueError, match="positive"):
        range_join(rd.from_pandas(L), rd.from_pandas(R), "k", "t", 0,
                   ["k", "t"], ["k", "t"])


def test_join_on_col_suffix_clash_rejected():
    """A LEFT payload column named like the generated right on-column
    (on_col + suffix) must raise, not produce a duplicate schema field."""
    import pandas as pd
    import ray.data as rd

    from engine.joins import asof_join, range_join

    L = pd.DataFrame({"k": [1], "t": [1], "t_r": [7]}).astype("int64")
    R = pd.DataFrame({"k": [1], "t": [1], "x": [1]}).astype("int64")
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_pandas(L), rd.from_pandas(R), "k", "t",
                  ["k", "t", "t_r"], ["k", "t", "x"])
    with pytest.raises(ValueError, match="collide"):
        range_join(rd.from_pandas(L), rd.from_pandas(R), "k", "t", 5,
                   ["k", "t", "t_r"], ["k", "t", "x"])


def test_broadcast_join_rejects_batch_local_unsafe_join_types():
    """right/full outer would emit unmatched right rows once per LEFT
    batch — only the batch-local-correct set is allowed."""
    import pandas as pd
    import ray.data as rd

    from engine.joins import broadcast_join

    L = rd.from_pandas(pd.DataFrame({"k": [1]}).astype("int64"))
    R = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}).astype("int64"))
    for jt in ("right outer", "full outer"):
        with pytest.raises(ValueError, match="batch-local"):
            broadcast_join(L, R, "k", ["v"], join_type=jt)
    # the safe set still works
    assert broadcast_join(L, R, "k", ["v"], join_type="left semi").count() == 1


def test_lookup_join_sorted_matches_pandas():
    """Sorted lookup join == pandas inner merge, with unmatched facts
    dropped, under many small blocks (cross-range block selection)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.joins import lookup_join_sorted

    rng = np.random.default_rng(31)
    dims = pd.DataFrame(
        {
            "k": np.arange(0, 400, 2, dtype=np.int64),  # evens only
            "attr": rng.integers(0, 1000, 200).astype(np.int64),
        }
    )
    facts = pd.DataFrame(
        {
            "k": rng.integers(0, 400, 3000).astype(np.int64),  # odds unmatched
            "v": rng.integers(0, 100, 3000).astype(np.int64),
        }
    )
    out = (
        lookup_join_sorted(
            rd.from_pandas(facts).repartition(11),
            rd.from_pandas(dims).repartition(7),
            on="k",
        )
        .to_pandas()
        .sort_values(["k", "v", "attr"])
        .reset_index(drop=True)
    )
    want = (
        facts.merge(dims, on="k", how="inner")
        .sort_values(["k", "v", "attr"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "v", "attr"]], want)


def test_lookup_join_sorted_rejects_duplicate_dims():
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.joins import lookup_join_sorted

    dims = pd.DataFrame({"k": [1, 2, 2, 3], "attr": [0, 1, 2, 3]})
    facts = pd.DataFrame({"k": [1, 2, 3], "v": [9, 9, 9]})
    with pytest.raises((ValueError, Exception)):
        lookup_join_sorted(
            rd.from_pandas(facts), rd.from_pandas(dims).repartition(2), on="k"
        ).materialize()
