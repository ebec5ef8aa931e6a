"""Grouped NTILE (engine/ntile.py) + pivot counts (engine/summarize.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from engine.ntile import _ntile_of, ntile_per_key
from engine.summarize import pivot_counts


def _ref_ntile(df: pd.DataFrame, key, order, k):
    """Pandas reference of the ANSI NTILE rule."""
    out = np.empty(len(df), dtype=np.int64)
    s = df.sort_values([key] + order).reset_index()
    for _, g in s.groupby(key):
        n = len(g)
        base, rem = n // k, n % k
        for r, idx in enumerate(g["index"]):
            if r < rem * (base + 1):
                out[idx] = r // (base + 1) + 1
            else:
                out[idx] = rem + (r - rem * (base + 1)) // max(base, 1) + 1
    return out


def test_ntile_rule_vectorized():
    # n=10, k=4 → sizes 3,3,2,2
    rank = np.arange(10)
    total = np.full(10, 10)
    np.testing.assert_array_equal(
        _ntile_of(rank, total, 4), [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    )
    # n < k: each row its own bucket
    np.testing.assert_array_equal(
        _ntile_of(np.arange(3), np.full(3, 3), 4), [1, 2, 3]
    )


def test_ntile_cross_block_exact():
    """Distributed NTILE == pandas rule under tiny blocks, with one key
    whose run spans many blocks (boundary offset + total chaining)."""
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "key": np.where(
                rng.random(n) < 0.6, 3, rng.integers(0, 9, n)
            ).astype("int64"),
            "a": rng.integers(0, 40, n).astype("int64"),
            "b": rng.permutation(n).astype("int64"),  # unique tiebreak
        }
    )
    want = _ref_ntile(df, "key", ["a", "b"], 4)
    for parts in (1, 41):
        ds = rd.from_pandas(df).repartition(parts)
        out = ntile_per_key(ds, "key", ["a", "b"], k=4, out_col="nt").to_pandas()
        merged = df.assign(want=want).merge(out, on=["key", "a", "b"])
        np.testing.assert_array_equal(
            merged["nt"].to_numpy(), merged["want"].to_numpy()
        )


def test_ntile_validation():
    ds = rd.from_pandas(pd.DataFrame({"key": [1], "a": [1]}))
    with pytest.raises(ValueError):
        ntile_per_key(ds, "key", ["a"], k=0)
    with pytest.raises(ValueError):
        ntile_per_key(ds, "key", ["a"], k=2, out_col="a")


def test_pivot_counts_matches_pandas():
    rng = np.random.default_rng(3)
    n = 500
    types = ("click", "view", "purchase")
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 6, n).astype("int64"),
            "t": rng.choice(list(types) + ["other"], n),
            "value": rng.uniform(0, 9, n).round(2),
        }
    )
    ds = rd.from_pandas(df).repartition(13)
    out = (
        pivot_counts(
            ds,
            lambda tb: tb.column("g").to_numpy(zero_copy_only=False),
            type_col="t",
            types=types,
            group_name="g",
            value_col="value",
            value_type="purchase",
            value_name="pc",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for ty in types:
        want = df.groupby("g")["t"].apply(lambda s: int((s == ty).sum()))
        np.testing.assert_array_equal(out[f"n_{ty}"].to_numpy(), want.to_numpy())
    cents = (df["value"] * 100).round().astype("int64")
    want_pc = (
        cents.where(df["t"] == "purchase", 0).groupby(df["g"]).sum()
    )
    np.testing.assert_array_equal(out["pc"].to_numpy(), want_pc.to_numpy())
    # rows of a type outside `types` count toward no column
    n_other = int((df["t"] == "other").sum())
    assert n_other > 0
    assert int(out[[f"n_{t}" for t in types]].to_numpy().sum()) == n - n_other


def test_filter_above_key_mean_cross_block():
    """Above-group-mean filter == pandas transform under tiny blocks,
    with a key whose run spans many blocks (boundary count+sum chain)."""
    from engine.ntile import filter_above_key_mean

    rng = np.random.default_rng(29)
    n = 500
    df = pd.DataFrame(
        {
            "key": np.where(
                rng.random(n) < 0.55, 4, rng.integers(0, 8, n)
            ).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(-1000, 1000, n).astype("int64"),
        }
    )
    mean = df.groupby("key")["v"].transform("mean")
    want = set(df.loc[df["v"] > mean, "id"])
    assert 0 < len(want) < n
    for parts in (1, 31):
        ds = rd.from_pandas(df).repartition(parts)
        out = filter_above_key_mean(ds, "key", "v").to_pandas()
        assert set(out["id"]) == want


def test_filter_above_key_mean_single_member_groups():
    from engine.ntile import filter_above_key_mean

    # every group has one row: nothing strictly exceeds its own mean
    df = pd.DataFrame({"key": [1, 2, 3], "v": [5, -2, 9]})
    out = filter_above_key_mean(rd.from_pandas(df), "key", "v")
    assert out.count() == 0


def test_grouped_sum_sorted_cross_block():
    """Sort-based grouped SUM == pandas groupby sum under tiny blocks,
    with runs spanning many blocks (single-key and multi-key blocks)."""
    from engine.ntile import grouped_sum_sorted

    rng = np.random.default_rng(37)
    n = 700
    df = pd.DataFrame(
        {
            "k": np.where(
                rng.random(n) < 0.5, 9, rng.integers(0, 15, n)
            ).astype("int64"),
            "v": rng.integers(-100, 100, n).astype("int64"),
        }
    )
    want = df.groupby("k")["v"].sum().to_dict()
    for parts in (1, 43):
        out = grouped_sum_sorted(
            rd.from_pandas(df).repartition(parts), "k", "v", out_col="s"
        ).to_pandas()
        assert dict(zip(out["k"], out["s"])) == want
        assert len(out) == len(want)  # each key exactly once


def test_rollup_counts_matches_pandas_grouping_sets():
    """rollup_counts == GROUP BY GROUPING SETS ((a,b),(a),(b),()) with
    'ALL' sentinels, exact under many partitions (per-batch combiner
    must merge correctly across blocks)."""
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            "a": rng.choice(["en", "de", "fr"], n),
            "b": rng.choice(["web", "pdf", "wiki", "book"], n),
        }
    )
    want = {}
    for ka, kb in [(True, True), (True, False), (False, True), (False, False)]:
        ga = df["a"] if ka else pd.Series(["ALL"] * n)
        gb = df["b"] if kb else pd.Series(["ALL"] * n)
        for (va, vb), c in df.groupby([ga, gb]).size().items():
            want[(va, vb)] = int(c)
    from engine.summarize import rollup_counts

    for parts in (1, 29):
        out = rollup_counts(
            rd.from_pandas(df).repartition(parts), ["a", "b"]
        ).to_pandas()
        got = {(r.a, r.b): int(r.n) for r in out.itertuples()}
        assert got == want


def test_rollup_counts_validation():
    from engine.summarize import rollup_counts

    ds = rd.from_pandas(pd.DataFrame({"a": ["x"], "b": ["y"]}))
    with pytest.raises(ValueError):
        rollup_counts(ds, [])
    with pytest.raises(ValueError):
        rollup_counts(ds, ["a", "b", "a", "b", "a"])


def test_grouped_sums_sorted_multicol():
    """grouped_sums_sorted: one sort, several SUM columns, exact across
    blocks including runs spanning many blocks."""
    from engine.ntile import grouped_sums_sorted

    rng = np.random.default_rng(53)
    n = 800
    df = pd.DataFrame(
        {
            "k": np.where(
                rng.random(n) < 0.5, 3, rng.integers(0, 20, n)
            ).astype("int64"),
            "a": rng.integers(-40, 90, n).astype("int64"),
            "b": rng.integers(0, 7, n).astype("int64"),
        }
    )
    want_a = df.groupby("k")["a"].sum().to_dict()
    want_b = df.groupby("k")["b"].sum().to_dict()
    for parts in (1, 41):
        out = grouped_sums_sorted(
            rd.from_pandas(df).repartition(parts), "k", ["a", "b"], ["sa", "sb"]
        ).to_pandas()
        assert dict(zip(out["k"], out["sa"])) == want_a
        assert dict(zip(out["k"], out["sb"])) == want_b
        assert len(out) == len(want_a)
    with pytest.raises(ValueError):
        grouped_sums_sorted(rd.from_pandas(df), "k", ["a"], [])


def test_grouped_mode_and_count_distinct():
    """grouped_mode == SQL mode with (n DESC, val ASC) ties;
    grouped_count_distinct == exact per-key COUNT(DISTINCT)."""
    from engine.summarize import grouped_count_distinct, grouped_mode

    rng = np.random.default_rng(59)
    n = 700
    df = pd.DataFrame(
        {
            "k": rng.choice(["web", "pdf", "wiki"], n),
            "v": rng.choice(["en", "de", "fr", "it"], n),
        }
    )
    counts = df.groupby(["k", "v"]).size().reset_index(name="n")
    want_mode = {}
    for k, g in counts.groupby("k"):
        g = g.sort_values(["n", "v"], ascending=[False, True])
        want_mode[k] = (g.iloc[0]["v"], int(g.iloc[0]["n"]))
    want_nd = df.groupby("k")["v"].nunique().to_dict()
    for parts in (1, 23):
        ds = rd.from_pandas(df).repartition(parts)
        m = grouped_mode(ds, "k", "v").to_pandas()
        assert {r.k: (r.v, int(r.n)) for r in m.itertuples()} == want_mode
        d = grouped_count_distinct(ds, "k", "v").to_pandas()
        assert dict(zip(d["k"], d["n_distinct"])) == want_nd


def test_grouped_sums_sorted_min_max_ops():
    from engine.ntile import grouped_sums_sorted

    rng = np.random.default_rng(61)
    n = 600
    df = pd.DataFrame(
        {
            "k": np.where(
                rng.random(n) < 0.5, 5, rng.integers(0, 18, n)
            ).astype("int64"),
            "v": rng.integers(-900, 900, n).astype("int64"),
        }
    )
    want_min = df.groupby("k")["v"].min().to_dict()
    want_max = df.groupby("k")["v"].max().to_dict()
    for parts in (1, 37):
        ds = rd.from_pandas(df).repartition(parts)
        mn = grouped_sums_sorted(ds, "k", ["v"], ["m"], op="min").to_pandas()
        assert dict(zip(mn["k"], mn["m"])) == want_min
        mx = grouped_sums_sorted(ds, "k", ["v"], ["m"], op="max").to_pandas()
        assert dict(zip(mx["k"], mx["m"])) == want_max
    with pytest.raises(ValueError):
        grouped_sums_sorted(rd.from_pandas(df), "k", ["v"], ["m"], op="median")


def test_grouped_pearson_matches_numpy():
    from engine.summarize import grouped_pearson

    rng = np.random.default_rng(67)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "x": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    # correlated y for group a, anti for b, noise for c
    noise = rng.integers(-50, 50, n)
    df["y"] = np.where(
        df["k"] == "a",
        df["x"] + noise,
        np.where(df["k"] == "b", -df["x"] + noise, noise),
    ).astype("int64")
    want = {
        k: round(float(np.corrcoef(g["x"], g["y"])[0, 1]), 6)
        for k, g in df.groupby("k")
    }
    for parts in (1, 19):
        out = grouped_pearson(
            rd.from_pandas(df).repartition(parts), "k", "x", "y"
        ).to_pandas()
        got = {r.k: round(r.corr, 6) for r in out.itertuples()}
        assert got == want
    # zero-variance group -> null corr, not a crash
    z = pd.DataFrame({"k": ["z"] * 4, "x": [3] * 4, "y": [1, 2, 3, 4]})
    out = grouped_pearson(rd.from_pandas(z), "k", "x", "y").to_pandas()
    assert out["corr"].isna().all()


def test_grouped_ols_matches_numpy():
    from engine.summarize import grouped_ols

    rng = np.random.default_rng(91)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "x": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    noise = rng.integers(-40, 40, n)
    df["y"] = (3 * df["x"] + noise).astype("int64")
    want = {
        k: np.polyfit(g["x"].astype(float), g["y"].astype(float), 1)
        for k, g in df.groupby("k")
    }
    for parts in (1, 17):
        out = grouped_ols(
            rd.from_pandas(df).repartition(parts), "k", "x", "y"
        ).to_pandas()
        got = {r.k: (r.slope, r.intercept) for r in out.itertuples()}
        assert set(got) == set(want)
        for k, (m, c) in want.items():
            assert got[k][0] == pytest.approx(float(m), abs=1e-6)
            assert got[k][1] == pytest.approx(float(c), abs=1e-4)
        assert dict(zip(out["k"], out["n"])) == df.groupby("k").size().to_dict()
    # zero x-variance -> NULL slope/intercept, not a crash
    z = pd.DataFrame({"k": ["z"] * 4, "x": [3] * 4, "y": [1, 2, 3, 4]})
    out = grouped_ols(rd.from_pandas(z), "k", "x", "y").to_pandas()
    assert out["slope"].isna().all() and out["intercept"].isna().all()


def test_grouped_entropy_matches_manual():
    from engine.summarize import grouped_entropy

    rng = np.random.default_rng(53)
    n = 600
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c"], n),
            "v": rng.choice(list("pqrstu"), n),
        }
    )
    # group u: exactly uniform over 3 labels; group d: constant
    df = pd.concat(
        [
            df,
            pd.DataFrame({"k": ["u"] * 90, "v": ["p", "q", "r"] * 30}),
            pd.DataFrame({"k": ["d"] * 7, "v": ["z"] * 7}),
        ],
        ignore_index=True,
    )

    def manual(g):
        c = g["v"].value_counts().to_numpy().astype(float)
        tot = c.sum()
        return float(np.log(tot) - (c * np.log(c)).sum() / tot)

    want = {k: round(manual(g), 9) for k, g in df.groupby("k")}
    for parts in (1, 11):
        out = grouped_entropy(
            rd.from_pandas(df).repartition(parts), "k", "v"
        ).to_pandas()
        got = {r.k: r.entropy for r in out.itertuples()}
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9)
        nd = dict(zip(out["k"], out["n_distinct"]))
        assert nd["d"] == 1 and nd["u"] == 3
        assert dict(zip(out["k"], out["n"])) == df.groupby("k").size().to_dict()
    # constant group entropy is exactly 0, uniform-3 is ln(3)
    got = {r.k: r.entropy for r in grouped_entropy(
        rd.from_pandas(df), "k", "v").to_pandas().itertuples()}
    assert got["d"] == 0.0
    assert got["u"] == pytest.approx(np.log(3), abs=1e-9)


def test_percent_rank_per_key_cross_block():
    """Random keyed ints across many blocks vs DuckDB's window — ties,
    single-row keys, and duplicate-heavy keys all covered."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from engine.ntile import percent_rank_per_key

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.choice(["a", "b", "c", "lonely"], n,
                            p=[0.45, 0.45, 0.0995, 0.0005]),
            "v": rng.integers(0, 25, n),  # heavy ties
        }
    )
    df.loc[len(df)] = [n, "single", 7]  # one-row key → pr 0.0
    ds = ray.data.from_pandas(df).repartition(13)
    got = (
        percent_rank_per_key(ds, "k", "v", out_col="pr")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        """SELECT rid, ROUND(PERCENT_RANK() OVER (
               PARTITION BY k ORDER BY v), 9) AS pr
           FROM df ORDER BY rid"""
    ).fetchdf()
    np.testing.assert_allclose(
        got["pr"].to_numpy(), want["pr"].to_numpy(), atol=1e-12
    )
