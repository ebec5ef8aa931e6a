"""Market-basket pair counts: brute-force parity + block-boundary runs."""

import numpy as np
import pandas as pd
import ray.data as rd

from engine.basket import pair_counts


def _brute(df):
    pp = df.drop_duplicates()
    j = pp.merge(pp, on="g")
    j = j[j["v_x"] < j["v_y"]]
    return (
        j.groupby(["v_x", "v_y"]).size().reset_index(name="n")
        .sort_values(["v_x", "v_y"]).reset_index(drop=True)
    )


def test_pair_counts_brute_force_cross_block():
    """Groups spanning several tiny blocks (incl. blocks wholly inside
    one group) and in-group repeats must not change pair counts."""
    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame(
        {
            # group 3 owns ~40% of rows -> guaranteed multi-block runs
            "g": np.where(rng.random(n) < 0.4, 3, rng.integers(0, 40, n)
                          ).astype("int64"),
            "v": rng.integers(0, 25, n).astype("int64"),  # repeats likely
        }
    )
    want = _brute(df)
    for parts in (1, 31):
        got = (
            pair_counts(rd.from_pandas(df).repartition(parts), "g", "v",
                        a_col="v_x", b_col="v_y", n_col="n")
            .to_pandas()
            .sort_values(["v_x", "v_y"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pair_counts_singletons_and_empty():
    df = pd.DataFrame({"g": [1, 2, 3], "v": [10, 20, 30]})  # no pairs
    out = pair_counts(rd.from_pandas(df), "g", "v").to_pandas()
    assert len(out) == 0
