"""Bloom-filter semi-join prefilter (engine/bloom.py): no false
negatives, sane false-positive rate, effective pruning, exact output."""

import numpy as np
import pyarrow as pa
import ray.data

from engine import bloom


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(3)
    right = np.unique(rng.integers(0, 1 << 40, size=5000).astype(np.uint64))
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(right, type=pa.uint64())})
    ).repartition(4)
    m = 1 << 16  # ~13 bits/key
    f = bloom.build_bloom(ds, "k", num_bits=m, num_hashes=4)
    # every inserted key must hit (false negatives are impossible)
    assert bloom._contains(f["bits"], f["m"], f["k"], right).all()
    # disjoint probe keys: fp rate should be near (1-e^{-kn/m})^k ≈ 0.3%
    probe = np.unique(
        rng.integers(1 << 41, 1 << 42, size=20000).astype(np.uint64)
    )
    fp = bloom._contains(f["bits"], f["m"], f["k"], probe).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_exact_and_pruning():
    rng = np.random.default_rng(9)
    right_keys = np.arange(0, 3000, 3, dtype=np.int64)  # multiples of 3
    left_keys = rng.integers(0, 30000, size=4000).astype(np.int64)
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(left_keys),
                "payload": pa.array(np.arange(len(left_keys))),
            }
        )
    ).repartition(5)
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(right_keys)})
    ).repartition(3)

    out = (
        bloom.bloom_semi_join(left, right, on="k", right_on="rk", num_bits=1 << 14)
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    want_mask = np.isin(left_keys, right_keys)
    assert len(out) == int(want_mask.sum())
    want = (
        pa.table(
            {
                "k": pa.array(left_keys[want_mask]),
                "payload": pa.array(np.arange(len(left_keys))[want_mask]),
            }
        )
        .to_pandas()
        .sort_values(["k", "payload"])
        .reset_index(drop=True)
    )
    assert (out["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (out["payload"].to_numpy() == want["payload"].to_numpy()).all()


def test_bloom_semi_join_empty_intersection():
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([100, 200], type=pa.int64())})
    )
    out = bloom.bloom_semi_join(left, right, on="k", num_bits=1 << 10)
    assert out.count() == 0
