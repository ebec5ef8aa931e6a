"""Self-check of the driver contract: run every queries() entry at sf0.001
and compare against its oracle_sql() via DuckDB (row count + sorted-column
values), mirroring the driver's own harness."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    a, b = _norm(ray_df), _norm(sql_df)
    assert list(a.columns) == list(b.columns), (name, a.columns, b.columns)
    assert len(a) == len(b), (name, len(a), len(b))
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(
            bv.dtype, np.floating
        ):
            np.testing.assert_allclose(
                av.astype(float), bv.astype(float), atol=1e-9, err_msg=f"{name}.{col}"
            )
        else:
            assert (av.astype(str) == bv.astype(str)).all(), (name, col)


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(df.columns) == {"vid", "rank"}
    assert math.isclose(df["rank"].sum(), 1.0, abs_tol=1e-6)


def test_oracle_keys_subset():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    # the majority of queries should be SQL-checkable
    assert len(o) >= 10


@pytest.mark.parametrize(
    "name", sorted(entrymod.oracle_sql().keys())
)
def test_query_matches_oracle(con, name):
    q = entrymod.queries()[name]
    ray_df = _to_pandas(q(SF_DIR))
    sql_df = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    _compare(ray_df, sql_df, name)


@pytest.mark.parametrize("name", ["pagerank10", "cc_labels"])
def test_rows_only_queries_run(name):
    df = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(df) > 0


def _lineitem_edges(sf_dir=SF_DIR):
    import duckdb as _dd

    con = _dd.connect()
    rows = con.execute(
        f"""SELECT DISTINCT l_orderkey AS src, l_partkey + 10000000 AS dst
            FROM read_parquet('{sf_dir}/lineitem.parquet')"""
    ).fetchall()
    return [(int(a), int(b)) for a, b in rows]


def test_pagerank10_matches_oracle():
    """Rows-only driver check upgraded to exactness here: distributed
    10-superstep ranks vs the sequential oracle (allclose 1e-9)."""
    from engine import oracle

    edges = _lineitem_edges()
    want = oracle.pagerank_sync(edges, iterations=10)
    df = _to_pandas(entrymod.queries()["pagerank10"](SF_DIR))
    got = dict(zip(df["vid"], df["rank"]))
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_pagerank10_bsp_equals_dataset():
    a = _to_pandas(entrymod.queries()["pagerank10"](SF_DIR)).sort_values("vid")
    b = _to_pandas(entrymod.queries()["pagerank10_bsp"](SF_DIR)).sort_values("vid")
    np.testing.assert_array_equal(a["vid"].to_numpy(), b["vid"].to_numpy())
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), atol=1e-12
    )


def test_cc_labels_matches_oracle():
    from engine import oracle

    edges = _lineitem_edges()
    want = oracle.connected_components(edges)
    df = _to_pandas(entrymod.queries()["cc_labels"](SF_DIR))
    got = dict(zip(df["vid"], df["label"]))
    assert got == want


def test_lpa_labels_matches_oracle():
    from engine import oracle

    edges = _lineitem_edges()
    want = oracle.label_propagation(edges, iterations=2)
    df = _to_pandas(entrymod.queries()["lpa_labels"](SF_DIR))
    got = dict(zip(df["vid"], df["label"]))
    assert got == want
