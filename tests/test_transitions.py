"""Transition counts (T96), windowed COUNT(DISTINCT) (T97) and the
aggregate-then-rank report (T98): cross-block stitch semantics plus a
planted-ties micro corpus checked against the same DuckDB oracle SQL the
driver runs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from engine.queries import ORACLE_SQL, QUERIES
from engine.windows import transition_counts


def _pandas_transitions(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts_us", "event_id"])
    prev = df.groupby("user_id")["event_type"].shift()
    out = (
        pd.DataFrame({"prev": prev, "next": df["event_type"]})
        .dropna()
        .groupby(["prev", "next"])
        .size()
        .reset_index(name="n")
    )
    return out.sort_values(["prev", "next"]).reset_index(drop=True)


def test_transition_counts_cross_block():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts_us": rng.integers(0, 10_000, n),
            "event_id": np.arange(n),
            "event_type": rng.choice(["a", "b", "c", "d"], n),
        }
    )
    ds = ray.data.from_pandas(df).repartition(17)
    got = (
        transition_counts(ds, "user_id", "ts_us", "event_type", "event_id")
        .to_pandas()
        .sort_values(["prev", "next"])
        .reset_index(drop=True)
    )
    want = _pandas_transitions(df)
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}), want.astype({"n": "int64"})
    )


def test_transition_counts_single_user_spans_blocks():
    # one user's run crosses every block boundary: every adjacent pair
    # must be counted exactly once (boundary metadata, not row shipping)
    n = 300
    df = pd.DataFrame(
        {
            "user_id": np.zeros(n, np.int64),
            "ts_us": np.arange(n),
            "event_id": np.arange(n),
            "event_type": np.where(np.arange(n) % 2 == 0, "x", "y"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(23)
    got = transition_counts(
        ds, "user_id", "ts_us", "event_type", "event_id"
    ).to_pandas()
    counts = dict(zip(zip(got["prev"], got["next"]), got["n"]))
    assert counts == {("x", "y"): 150, ("y", "x"): 149}


@pytest.fixture(scope="module")
def micro_sf(tmp_path_factory):
    """A tiny sf dir with PLANTED edge cases: a revenue tie inside one
    nation (partkey must break it), a user active across midnight (day
    floor), and transition ties in the top-20 cutoff."""
    d = tmp_path_factory.mktemp("microsf")
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int32()),
                "n_name": ["ALPHA", "BETA"],
                "n_regionkey": pa.array([0, 0], pa.int32()),
            }
        ),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 11], pa.int64()),
                "s_name": ["s10", "s11"],
                "s_nationkey": pa.array([0, 1], pa.int64()),
                "s_acctbal": [1.0, 2.0],
            }
        ),
        d / "supplier.parquet",
    )
    # nation 0: parts 5 and 3 tie at revenue 200.00 (partkey 3 ranks
    # first), part 9 below; nation 1: four parts, only top 3 survive
    li = pd.DataFrame(
        {
            "l_suppkey": [10, 10, 10, 10, 11, 11, 11, 11],
            "l_partkey": [5, 3, 9, 3, 1, 2, 4, 8],
            "l_extendedprice": [200.0, 150.0, 10.0, 50.0, 40.0, 30.0, 20.0, 10.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), d / "lineitem.parquet")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(8),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 23:59:00",
                    "2024-01-02 00:01:00",  # same user crosses midnight
                    "2024-01-02 12:00:00",
                    "2024-01-01 05:00:00",
                    "2024-01-01 06:00:00",
                    "2024-01-03 01:00:00",
                    "2024-01-03 02:00:00",
                    "2024-01-03 03:00:00",
                ]
            ),
            "user_id": [1, 1, 2, 2, 2, 3, 3, 3],
            "event_type": ["a", "b", "a", "b", "a", "a", "b", "a"],
        }
    )
    tbl = pa.Table.from_pandas(ev)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["daily_active_users", "event_transitions_top20", "top_parts_per_nation"],
)
def test_micro_sf_matches_oracle(micro_sf, name):
    con = duckdb.connect()
    for t in ["nation", "supplier", "lineitem", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{micro_sf}/{t}.parquet')"
        )
    got = QUERIES[name](micro_sf).to_pandas()
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    a = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), (len(a), len(b))
    for col in a.columns:
        assert (a[col].to_numpy().astype(str) == b[col].to_numpy().astype(str)).all(), col


def test_top_parts_tie_broken_by_partkey(micro_sf):
    df = QUERIES["top_parts_per_nation"](micro_sf).to_pandas()
    alpha = df[df["n_name"] == "ALPHA"].sort_values(
        "sum_rev_e4", ascending=False
    )
    # parts 3 and 5 tie at 200.00 revenue: both survive (k=3 of 3 parts),
    # and the tie order in the oracle is partkey ASC — verify the engine
    # kept both with identical sums
    tied = alpha[alpha["sum_rev_e4"] == alpha["sum_rev_e4"].max()]
    assert sorted(tied["l_partkey"].tolist()) == [3, 5]


def test_part_customer_breadth_tie_and_dup(tmp_path):
    """Planted duplicates (same customer buying a part twice counts once)
    and a tie at the cutoff (partkey ASC decides) vs the DuckDB oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import ORACLE_SQL, QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    orders = pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4], "o_custkey": [10, 10, 20, 30]}
    )
    # part 7: custs {10,20,30} = 3 (cust 10 twice via orders 1+2 → once)
    # part 5 and part 9: custs {10,20} = 2 each (tie — part 5 first)
    li = pd.DataFrame(
        {
            "l_orderkey": [1, 2, 3, 4, 1, 3, 2, 3],
            "l_partkey": [7, 7, 7, 7, 5, 5, 9, 9],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), d / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(li), d / "lineitem.parquet")
    got = QUERIES["part_customer_breadth_top25"](str(d)).to_pandas()
    assert got[["l_partkey", "n_customers"]].values.tolist() == [
        [7, 3], [5, 2], [9, 2]
    ]
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    want = con.execute(ORACLE_SQL["part_customer_breadth_top25"]).fetchdf()
    assert got[["l_partkey", "n_customers"]].values.tolist() == \
        want[["l_partkey", "n_customers"]].values.tolist()


def test_docs_above_source_p75_disc_semantics(tmp_path):
    """percentile_disc picks an ACTUAL value (not interpolated); strict >
    keeps exactly the tail above it — checked on a hand-sized corpus."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import ORACLE_SQL, QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    docs = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["s1"] * 4 + ["s2"] * 5 + ["s3"],
            "text": ["x"] * 10,
            "lang": ["en"] * 10,
            # s1: [10,20,30,40] — cum fractions .25/.5/.75/1.0, disc p75 =
            #     first value with cum ≥ .75 = 30 → keeps 40
            # s2: [1,2,3,4,5] p75=4 → keeps 5
            # s3: [7] p75=7 → none
            "n_chars": [10, 20, 30, 40, 1, 2, 3, 4, 5, 7],
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), d / "documents.parquet")
    got = QUERIES["docs_above_source_p75"](str(d)).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [3, 8]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = con.execute(ORACLE_SQL["docs_above_source_p75"]).fetchdf()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_weighted_median_crossing_semantics():
    """Lower weighted median = smallest v with 2·cumw ≥ total — planted
    distributions incl. exact-half crossings and zero-weight rows."""
    import numpy as np
    import pandas as pd
    import ray.data

    from engine.summarize import weighted_median_per_key

    df = pd.DataFrame(
        {
            "k": ["a"] * 3 + ["b"] * 3 + ["c"] * 2 + ["z"],
            # a: w(1)=1, w(2)=1 → total 2, cum at v=1 is 1, 2*1>=2 → 1
            # b: w(1)=1, w(5)=3 → total 4, v=1 cum1 (2<4), v=5 → 5
            # c: zero weights only → total 0 → smallest value (3)
            # z: single row → its value
            "v": [1, 2, 2, 1, 5, 5, 3, 9, 7],
            "w": [1, 1, 0, 1, 2, 1, 0, 0, 4],
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = (
        weighted_median_per_key(ds, "k", "v", "w", out_col="m")
        .to_pandas()
        .set_index("k")["m"]
        .to_dict()
    )
    assert got == {"a": 1, "b": 5, "c": 3, "z": 7}


def test_user_diversity_histogram_planted(tmp_path):
    """The sf events have every user on all 5 types (1-row histogram) —
    plant a spread (1/2/3 distinct types, duplicates, cross-block runs)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.queries import ORACLE_SQL, QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    ev = pd.DataFrame(
        {
            "event_id": range(12),
            "user_id": [1, 1, 1, 1, 2, 2, 2, 3, 3, 4, 4, 4],
            # u1: {a} (4 dups) → 1; u2: {a,b} → 2; u3: {a,b} → 2;
            # u4: {a,b,c} → 3  ⇒ histogram {1:1, 2:2, 3:1}
            "event_type": ["a", "a", "a", "a", "a", "b", "b",
                           "a", "b", "a", "b", "c"],
        }
    )
    pq.write_table(pa.Table.from_pandas(ev), d / "events.parquet")
    got = (
        QUERIES["user_diversity_histogram"](str(d))
        .to_pandas()
        .sort_values("n_types")
        .reset_index(drop=True)
    )
    assert got.values.tolist() == [[1, 1], [2, 2], [3, 1]]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = (
        con.execute(ORACLE_SQL["user_diversity_histogram"])
        .fetchdf().sort_values("n_types").reset_index(drop=True)
    )
    assert got.values.tolist() == want.values.tolist()
