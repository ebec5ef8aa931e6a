"""Grouped top-k: distributed two-stage operator vs a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from engine.topk import topk_per_group


def _oracle(df: pd.DataFrame, key, order, k, ascending_tie):
    out = []
    for _, g in df.groupby(key):
        g = g.sort_values([order] + ascending_tie, ascending=[False] + [True] * len(ascending_tie))
        out.append(g.head(k))
    return (
        pd.concat(out)
        .sort_values(list(df.columns))
        .reset_index(drop=True)
    )


def _check(df: pd.DataFrame, k: int, num_partitions: int):
    ds = ray.data.from_pandas(df).repartition(num_partitions)
    got = (
        topk_per_group(ds, key_col="key", order_col="val", k=k)
        .to_pandas()
        .sort_values(list(df.columns))
        .reset_index(drop=True)
    )
    want = _oracle(df, "key", "val", k, [c for c in df.columns if c not in ("key", "val")])
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)


def test_topk_basic_and_skew():
    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            # heavy skew: key 0 holds ~half the rows (boundary-spanning runs)
            "key": np.where(rng.random(n) < 0.5, 0, rng.integers(0, 50, n)),
            "val": rng.integers(0, 1000, n),
            "tag": rng.integers(0, 10_000, n),
        }
    )
    _check(df, k=3, num_partitions=7)


def test_topk_ties_at_boundary():
    # many exact val ties per key: the tie-break (remaining column) decides
    df = pd.DataFrame(
        {
            "key": np.repeat(np.arange(10), 20),
            "val": np.tile([5, 5, 5, 5, 1], 40),
            "tag": np.arange(200),
        }
    )
    _check(df, k=2, num_partitions=5)


def test_topk_groups_smaller_than_k():
    df = pd.DataFrame({"key": [1, 2, 2, 3], "val": [9, 1, 2, 7], "tag": [0, 1, 2, 3]})
    _check(df, k=5, num_partitions=3)


def test_topk_unsigned_order_with_zero():
    """uint64 order column containing 0: plain unary-minus negation would
    wrap mod 2^64 (0 stays MINIMAL instead of becoming maximal) and the
    combiner would prune genuine top-k rows."""
    df = pd.DataFrame(
        {
            "key": np.repeat(np.arange(5), 8),
            "val": np.tile(np.array([0, 7, 3, 9, 0, 5, 1, 8], dtype=np.uint64), 5),
            "tag": np.arange(40),
        }
    )
    df["val"] = df["val"].astype(np.uint64)
    _check(df, k=2, num_partitions=4)
    # explicitly: no zero survives (zeros are the WORST values here)
    ds = ray.data.from_pandas(df).repartition(4)
    got = topk_per_group(ds, key_col="key", order_col="val", k=2).to_pandas()
    assert (got["val"].to_numpy().astype(np.int64) > 0).all()


def test_topk_string_order_column():
    """String order column: negation would TypeError; the rank transform
    keeps the combiner exact."""
    df = pd.DataFrame(
        {
            "key": [0, 0, 0, 1, 1, 1],
            "val": ["b", "z", "a", "m", "c", "x"],
            "tag": [0, 1, 2, 3, 4, 5],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    got = (
        topk_per_group(ds, key_col="key", order_col="val", k=1)
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert got["val"].tolist() == ["z", "x"]


def test_weighted_sample_matches_brute_force():
    """weighted_sample == brute-force A-ES top-k on the same md5 keys;
    weight<=0 rows never drawn; k >= n returns every positive-weight
    row; k<=0 rejected."""
    import hashlib

    import pytest

    from engine.topk import weighted_sample

    rng = np.random.default_rng(41)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64) * 7 + 3,
            "w": rng.integers(-5, 200, n).astype(np.int64),
            "payload": rng.integers(0, 9, n).astype(np.int64),
        }
    )

    def key(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                           "little") >> 11
        return np.log((float(h) + 1.0) / 9007199254740992.0) / w

    pos = df[df["w"] > 0].copy()
    pos["key"] = [key(i, w) for i, w in zip(pos["id"], pos["w"])]
    want = set(pos.nlargest(50, "key")["id"])
    for parts in (1, 13):
        out = weighted_sample(
            ray.data.from_pandas(df).repartition(parts), "w", "id", 50
        ).to_pandas()
        assert set(out["id"]) == want
        assert list(out.columns) == ["id", "w", "payload"]
    # k >= positive-weight rows: all of them, none with w <= 0
    allout = weighted_sample(ray.data.from_pandas(df), "w", "id", n + 10).to_pandas()
    assert set(allout["id"]) == set(pos["id"])
    with pytest.raises(ValueError, match="positive"):
        weighted_sample(ray.data.from_pandas(df), "w", "id", 0)


def test_weighted_sample_per_key_matches_brute_force():
    """weighted_sample_per_key == per-key brute-force A-ES top-k;
    weight<=0 rows excluded; groups smaller than k keep everything."""
    import hashlib

    from engine.topk import weighted_sample_per_key

    rng = np.random.default_rng(59)
    n = 400
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n),
            "id": np.arange(n, dtype=np.int64) * 3 + 1,
            "w": rng.integers(-2, 60, n).astype(np.int64),
        }
    )
    df = pd.concat(
        [df, pd.DataFrame({"k": ["solo"], "id": [9999], "w": [5]})],
        ignore_index=True,
    )

    def key(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                           "little") >> 11
        return np.log((float(h) + 1.0) / 9007199254740992.0) / w

    pos = df[df["w"] > 0].copy()
    pos["key"] = [key(i, w) for i, w in zip(pos["id"], pos["w"])]
    want = set(
        pos.sort_values("key", ascending=False).groupby("k").head(3)["id"]
    )
    for parts in (1, 9):
        out = weighted_sample_per_key(
            ray.data.from_pandas(df).repartition(parts), "k", "w", "id", 3
        ).to_pandas()
        assert set(out["id"]) == want
        assert list(out.columns) == ["k", "id", "w"]
        assert 9999 in set(out["id"])  # sub-k group fully kept
