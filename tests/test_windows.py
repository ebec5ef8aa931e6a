"""Stream-shaped operators: tumbling + session windows over events."""

import duckdb
import pandas as pd
import ray.data

from engine.windows import session_windows, tumbling_window

SF = "/root/testdata/sf0.001"


def test_tumbling_matches_duckdb():
    ev = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id", "ts", "value"])
    got = (
        tumbling_window(ev, window_sec=3600)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT user_id,
                   CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
                   COUNT(*) AS n_events,
                   SUM(CAST(ROUND(value*100) AS BIGINT)) AS sum_value_cents
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2
            ORDER BY 1, 2"""
    ).fetchdf()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_hopping_matches_duckdb():
    from engine.windows import hopping_window

    ev = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id", "ts", "value"])
    got = (
        hopping_window(ev, window_sec=3600, hop_sec=900)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT user_id,
                   (CAST(floor(epoch(ts)/900) AS BIGINT) - g.i) * 900
                       AS window_start,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                       AS sum_value_cents
            FROM read_parquet('{SF}/events.parquet')
                 CROSS JOIN generate_series(0, 3) AS g(i)
            GROUP BY 1, 2
            ORDER BY 1, 2"""
    ).fetchdf()
    # every event lands in exactly window/hop = 4 windows
    assert got["n_events"].sum() == 4 * con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def _session_oracle(df: pd.DataFrame, gap_sec: int) -> set:
    out = set()
    for uid, g in df.groupby("user_id"):
        secs = sorted(g["ts"].astype("int64") // 1_000_000)
        start, prev, n = secs[0], secs[0], 1
        for t in secs[1:]:
            if t - prev > gap_sec:
                out.add((uid, start, n, prev - start))
                start, n = t, 0
            n += 1
            prev = t
        out.add((uid, start, n, prev - start))
    return out


def test_sessions_match_oracle():
    ev_df = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    want = _session_oracle(ev_df, gap_sec=1800)
    got_df = session_windows(
        ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"]),
        gap_sec=1800,
    ).to_pandas()
    got = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in got_df.itertuples()
    }
    assert got == want


def test_running_total_cross_block_exact():
    """Distributed cumulative sum == pandas cumsum under tiny blocks
    (many cross-block offset chains), exclusive and inclusive forms."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.windows import pack_sequences, running_total

    rng = np.random.default_rng(21)
    n = 500
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype("int64"),  # unsorted input
            "n_tokens": rng.integers(1, 300, n).astype("int64"),
        }
    )
    ds = rd.from_pandas(df).repartition(23)
    out = (
        running_total(ds, "doc_id", "n_tokens", out_col="tb", exclusive=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values("doc_id").reset_index(drop=True)
    want = ref["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    np.testing.assert_array_equal(out["tb"].to_numpy(), want)
    inc = (
        running_total(ds, "doc_id", "n_tokens", out_col="rt", exclusive=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        inc["rt"].to_numpy(), ref["n_tokens"].cumsum().to_numpy()
    )
    packed = pack_sequences(ds, chunk_tokens=512).to_pandas()
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    np.testing.assert_array_equal(
        packed["chunk_id"].to_numpy(), want // 512
    )


def test_running_total_null_values_sql_semantics():
    """NULL values contribute 0 (SQL window SUM skips NULLs) instead of
    crashing on the NaN-float to_numpy path (ADVICE r4)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from engine.windows import running_total

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "n_tokens": pa.array([5, None, 7, None, 1, 2], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    out = (
        running_total(ds, "doc_id", "n_tokens", out_col="tb", exclusive=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # SQL: SUM(v) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
    # AND 1 PRECEDING) with NULLs skipped -> 0,5,5,12,12,13
    np.testing.assert_array_equal(
        out["tb"].to_numpy(), np.array([0, 5, 5, 12, 12, 13])
    )


def test_funnel_greedy_earliest():
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.windows import funnel

    def ev(uid, sec, et):
        return {"user_id": uid, "ts": pd.Timestamp(sec, unit="s"), "event_type": et}

    rows = [
        # u1 completes all three in order
        ev(1, 10, "view"), ev(1, 20, "click"), ev(1, 30, "purchase"),
        # u2: purchase BEFORE click -> stage 2 only
        ev(2, 10, "view"), ev(2, 15, "purchase"), ev(2, 20, "click"),
        # u3: click only -> no stage-1 view -> absent from output
        ev(3, 10, "click"), ev(3, 20, "purchase"),
        # u4: equal timestamps -> strict > rejects same-instant next step
        ev(4, 10, "view"), ev(4, 10, "click"),
        # u5: greedy-earliest view at 10 (not 25) lets click at 20 count
        ev(5, 25, "view"), ev(5, 10, "view"), ev(5, 20, "click"),
        # u6: view only
        ev(6, 99, "view"),
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = funnel(ds, steps=("view", "click", "purchase")).to_pandas()
    got = dict(zip(out["user_id"], out["funnel_stage"]))
    assert got == {1: 3, 2: 2, 4: 1, 5: 2, 6: 1}
    assert out["funnel_stage"].dtype == np.int64
    with pytest.raises(ValueError):
        funnel(ds, steps=())


def test_funnel_within_window():
    import pandas as pd
    import ray.data as rd

    from engine.windows import funnel

    rows = [
        # u1: click 100s after view -> within 60s window fails at stage 2
        {"user_id": 1, "ts": pd.Timestamp(10, unit="s"), "event_type": "view"},
        {"user_id": 1, "ts": pd.Timestamp(110, unit="s"), "event_type": "click"},
        # u2: click 50s after view (inside), purchase 61s after click (outside)
        {"user_id": 2, "ts": pd.Timestamp(10, unit="s"), "event_type": "view"},
        {"user_id": 2, "ts": pd.Timestamp(60, unit="s"), "event_type": "click"},
        {"user_id": 2, "ts": pd.Timestamp(121, unit="s"), "event_type": "purchase"},
        # u3: boundary — exactly +60s is INSIDE (<=)
        {"user_id": 3, "ts": pd.Timestamp(10, unit="s"), "event_type": "view"},
        {"user_id": 3, "ts": pd.Timestamp(70, unit="s"), "event_type": "click"},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = funnel(
        ds, steps=("view", "click", "purchase"), within_sec=60
    ).to_pandas()
    got = dict(zip(out["user_id"], out["funnel_stage"]))
    assert got == {1: 1, 2: 2, 3: 2}


def test_rolling_sum_cross_block_exact():
    """rolling_sum_per_key == pandas groupby().rolling(min_periods=1)
    under tiny blocks: carries must chain across blocks shorter than the
    lookback, and runs spanning several blocks must see their full
    window."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.windows import rolling_sum_per_key

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame(
        {
            # key 7 takes half the rows — a run spanning many blocks
            "k": np.where(
                rng.random(n) < 0.5, 7, rng.integers(0, 12, n)
            ).astype("int64"),
            "o": rng.permutation(n).astype("int64"),  # unique order col
            "v": rng.integers(-50, 100, n).astype("int64"),
        }
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .rolling(5, min_periods=1)
        .sum()
        .reset_index(drop=True)
        .to_numpy()
        .astype("int64")
    )
    for parts in (1, 37):  # 37 parts → blocks far shorter than runs
        ds = rd.from_pandas(df).repartition(parts)
        out = (
            rolling_sum_per_key(ds, "k", "o", "v", window=5, out_col="r")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        np.testing.assert_array_equal(out["r"].to_numpy(), want)


def test_rolling_sum_window_one_and_validation():
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.windows import rolling_sum_per_key

    df = pd.DataFrame({"k": [1, 1, 2], "o": [1, 2, 1], "v": [3, 4, 5]})
    ds = rd.from_pandas(df)
    out = rolling_sum_per_key(ds, "k", "o", "v", window=1, out_col="r")
    assert sorted(out.to_pandas()["r"]) == [3, 4, 5]  # w=1: row itself
    with pytest.raises(ValueError):
        rolling_sum_per_key(ds, "k", "o", "v", window=0)
    with pytest.raises(ValueError):
        rolling_sum_per_key(ds, "k", "o", "v", window=2, out_col="v")


def test_global_percent_rank_matches_sql_rule():
    """global_percent_rank == (rank-1)/(n-1) over a unique total order,
    exact across many blocks (offsets chain through block metadata)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.windows import global_percent_rank

    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 40, n).astype("int64"),  # heavy ties
        }
    )
    order = df.sort_values(["v", "id"]).reset_index(drop=True)
    want = dict(
        zip(order["id"], np.round(np.arange(n) / (n - 1), 9))
    )
    for parts in (1, 31):
        ds = rd.from_pandas(df).repartition(parts)
        out = global_percent_rank(ds, ["v", "id"]).to_pandas()
        got = dict(zip(out["id"], out["pr"]))
        assert got == pytest.approx(want)
        assert list(out.columns[-1:]) == ["pr"]


def test_global_percent_rank_single_row_and_empty():
    import pandas as pd
    import ray.data as rd

    from engine.windows import global_percent_rank

    one = rd.from_pandas(pd.DataFrame({"id": [7], "v": [3]}))
    out = global_percent_rank(one, ["v", "id"]).to_pandas()
    assert out["pr"].tolist() == [0.0]  # SQL convention for n=1
    empty = rd.from_pandas(pd.DataFrame({"id": [7], "v": [3]})).filter(
        lambda r: False
    )
    assert global_percent_rank(empty, ["v", "id"]).count() == 0


def test_global_ntile_matches_duckdb():
    """global_ntile == NTILE(k) OVER (ORDER BY v, id) for several k,
    exact across many blocks (ANSI extra-row rule at the seams)."""
    import numpy as np
    import pytest
    import ray.data as rd

    from engine.windows import global_ntile

    rng = np.random.default_rng(29)
    n = 333
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 25, n).astype("int64"),  # heavy ties
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    for k in (1, 7, 10, 400):  # 400 > n: each row its own bucket
        want = dict(
            con.execute(
                f"SELECT id, NTILE({k}) OVER (ORDER BY v, id) FROM t"
            ).fetchall()
        )
        for parts in (1, 31):
            ds = rd.from_pandas(df).repartition(parts)
            out = global_ntile(ds, ["v", "id"], k, out_col="b").to_pandas()
            assert dict(zip(out["id"], out["b"])) == want
    with pytest.raises(ValueError):
        global_ntile(rd.from_pandas(df), ["v", "id"], 0)


def test_cumsum_per_key_cross_block_exact():
    """cumsum_per_key == pandas groupby().cumsum() under tiny blocks:
    the scalar carry must CHAIN when one key's run spans several
    consecutive blocks (key 7 owns half the rows)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.windows import cumsum_per_key

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "k": np.where(
                rng.random(n) < 0.5, 7, rng.integers(0, 12, n)
            ).astype("int64"),
            "o": rng.permutation(n).astype("int64"),
            "v": rng.integers(-50, 100, n).astype("int64"),
        }
    )
    want = (
        df.sort_values(["k", "o"])
        .groupby("k")["v"]
        .cumsum()
        .loc[df.sort_values(["k", "o"]).index]
        .to_numpy()
        .astype("int64")
    )
    for parts in (1, 37):
        ds = rd.from_pandas(df).repartition(parts)
        out = (
            cumsum_per_key(ds, "k", "o", "v", out_col="r")
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        np.testing.assert_array_equal(out["r"].to_numpy(), want)


def test_ordered_concat_per_key_cross_block():
    """ordered_concat_per_key == string_agg(... ORDER BY): partials from
    blocks shorter than a key's run must stitch in block order."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.windows import ordered_concat_per_key

    rng = np.random.default_rng(3)
    n = 300
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 9, n).astype("int64"),
            "o": rng.permutation(n).astype("int64"),
            "v": [f"t{i % 7}" for i in range(n)],
        }
    )
    s = df.sort_values(["k", "o"])
    want = (
        s.groupby("k")
        .agg(seq=("v", ">".join), n=("v", "size"))
        .reset_index()
        .astype({"n": "int64"})
    )
    for parts in (1, 29):
        ds = rd.from_pandas(df).repartition(parts)
        got = (
            ordered_concat_per_key(ds, "k", ["o"], "v")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_median_mad_disc_semantics():
    """median/MAD use percentile_disc (lower-middle) semantics and the
    outlier count is exact — brute force on a skewed integer sample."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.summarize import grouped_median_mad

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b", "c"], [101, 100, 7]),
            "v": np.concatenate(
                [
                    rng.integers(0, 50, 101),
                    rng.integers(1000, 1100, 100),
                    [5, 5, 5, 5, 5, 5, 900],  # mad=0: any deviation flags
                ]
            ).astype("int64"),
        }
    )

    def disc(x, q=0.5):
        s = np.sort(x)
        return int(s[max(0, int(np.ceil(q * len(s))) - 1)])

    got = (
        grouped_median_mad(rd.from_pandas(df).repartition(9), "k", "v")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    for _, row in got.iterrows():
        x = df.loc[df["k"] == row["k"], "v"].to_numpy()
        med = disc(x)
        mad = disc(np.abs(x - med))
        assert row["med"] == med and row["mad"] == mad
        assert row["n"] == len(x)
        assert row["n_outliers"] == int((np.abs(x - med) > 3 * mad).sum())


def test_minmax_scale_per_key_constant_group():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.summarize import minmax_scale_per_key

    df = pd.DataFrame(
        {"k": ["a", "a", "a", "b", "b"], "v": [10, 20, 40, 7, 7]}
    )
    got = (
        minmax_scale_per_key(rd.from_pandas(df).repartition(3), "k", "v")
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["scaled"].to_numpy(), [0.0, 1 / 3, 1.0, 0.0, 0.0]
    )


def test_winsorize_per_key_pdisc_band():
    """winsorize_per_key clips into each key's OWN [p05, p95]
    percentile_disc band (ceil(q*n)-1 pick) and leaves in-band rows
    untouched."""
    import numpy as np

    from engine.summarize import winsorize_per_key

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 300),
            "v": rng.integers(-1000, 1000, 300).astype("int64"),
        }
    )

    def band(g, q):
        s = np.sort(g["v"].to_numpy())
        return int(s[max(0, int(np.ceil(q * len(s))) - 1)])

    lo = {k: band(g, 0.05) for k, g in df.groupby("k")}
    hi = {k: band(g, 0.95) for k, g in df.groupby("k")}
    out = winsorize_per_key(
        ray.data.from_pandas(df).repartition(7), "k", "v"
    ).to_pandas()
    exp = df.assign(
        clipped=[min(max(v, lo[k]), hi[k]) for k, v in zip(df["k"], df["v"])]
    )
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "clipped"]], exp[["k", "v", "clipped"]],
        check_dtype=False,
    )
    # the tails actually moved, the middle did not
    assert (got["clipped"] != got["v"]).any()
    assert (got["clipped"] == got["v"]).sum() > len(got) * 0.8


def test_rolling_sum_time_cross_block():
    """RANGE-frame rolling sum vs DuckDB's window: peers (equal ts),
    multi-block runs, and a hot key bursting inside one horizon."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from engine.windows import rolling_sum_time_per_key

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "rid": np.arange(n),
            "k": rng.choice(["u1", "u2", "hot"], n, p=[0.3, 0.3, 0.4]),
            "ts": rng.integers(0, 500, n).astype("int64"),  # heavy peers
            "v": rng.integers(-5, 50, n).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(19)
    got = (
        rolling_sum_time_per_key(ds, "k", "ts", "v", horizon=40, out_col="rs")
        .to_pandas()
    )
    want = duckdb.connect().execute(
        """SELECT rid, SUM(v) OVER (
               PARTITION BY k ORDER BY ts
               RANGE BETWEEN 40 PRECEDING AND CURRENT ROW) AS rs
           FROM df"""
    ).fetchdf()
    merged = got.merge(want, on="rid", suffixes=("_got", "_want"))
    assert (merged["rs_got"].to_numpy().astype(np.int64)
            == merged["rs_want"].to_numpy().astype(np.int64)).all()


def test_rolling_sum_time_run_spans_many_blocks():
    import numpy as np
    import pandas as pd
    import ray.data

    from engine.windows import rolling_sum_time_per_key

    n = 200
    df = pd.DataFrame(
        {
            "k": ["only"] * n,
            "ts": np.arange(n, dtype="int64") * 10,
            "v": np.ones(n, dtype="int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(29)
    got = rolling_sum_time_per_key(
        ds, "k", "ts", "v", horizon=95, out_col="rs"
    ).to_pandas().sort_values("ts")
    # horizon 95 at spacing 10 → current + 9 predecessors once warm
    assert got["rs"].tolist() == [min(i + 1, 10) for i in range(n)]
