"""Table profiling (engine/profile.py) + grouped z-score
(engine/textstats.grouped_zscore)."""

import numpy as np
import pandas as pd
import ray.data as rd

from engine.profile import table_profile
from engine.textstats import grouped_zscore


def test_table_profile_counts():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype="int64"),
            "text": ["a", "", None, "dd", "", "f"],
            "lang": ["en", "en", "sl", None, "de", "de"],
            "source": ["s0", "s1", "s0", "s1", "s0", "s1"],
            "n_chars": np.array([1, 0, 7, 2, 0, 1], dtype="int64"),
        }
    )
    out = table_profile(
        rd.from_pandas(df).repartition(3),
        null_cols=["text", "lang"],
        empty_text_cols=["text"],
        distinct_cols=["source"],
        minmax_cols=["n_chars"],
    )
    got = dict(zip(out["metric"], out["value"]))
    assert got == {
        "rows": 6,
        "null_text": 1,
        "null_lang": 1,
        "empty_text": 2,  # empty = zero-length NON-NULL
        "distinct_source": 2,
        "min_n_chars": 0,
        "max_n_chars": 7,
    }


def test_grouped_zscore_matches_pandas():
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype="int64"),
            "g": rng.choice(["a", "b", "c"], n),
            "x": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    out = (
        grouped_zscore(rd.from_pandas(df).repartition(7), "g", "x")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values("id").reset_index(drop=True)
    mean = ref.groupby("g")["x"].transform("mean")
    sd = ref.groupby("g")["x"].transform(lambda s: s.std(ddof=0))
    want = np.round(((ref["x"] - mean) / sd).to_numpy(), 9)
    np.testing.assert_allclose(out["z"].to_numpy(), want, atol=1e-9)


def test_grouped_zscore_zero_variance_group():
    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "x": np.array([5, 5, 9], dtype="int64")}
    )
    out = grouped_zscore(rd.from_pandas(df), "g", "x").to_pandas()
    assert (out[out.g == "a"]["z"] == 0.0).all()
    assert (out[out.g == "b"]["z"] == 0.0).all()  # n=1 → var 0
