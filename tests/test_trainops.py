"""Training-data operators: dedup suite, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from engine import dedup, multimodal, textstats

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest while the sun sets slowly behind hills "
)


def _docs_table():
    """20 distinct docs + planted near-dups of doc 0 and an exact dup."""
    rng = np.random.default_rng(42)
    words = BASE.split()
    texts, ids = [], []
    for i in range(20):
        w = list(rng.permutation(words)) + [f"unique{i}word{j}" for j in range(6)]
        texts.append(" ".join(w))
        ids.append(i)
    # near-dup of doc 0: drop two words
    texts.append(" ".join(texts[0].split()[:-2]))
    ids.append(100)
    # exact dup of doc 1
    texts.append(texts[1])
    ids.append(101)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.from_arrow(_docs_table()).repartition(3)


def _pairs_list(ds):
    """Materialize a pair Dataset to sorted python tuples (test-side)."""
    df = ds.to_pandas()
    return sorted(tuple(r) for r in df.itertuples(index=False))


def _clusters_dict(ds):
    df = ds.to_pandas()
    return dict(
        zip(df["doc_id"].astype(int).tolist(), df["cluster"].astype(int).tolist())
    )


def test_minhash_finds_planted_dups(docs_ds):
    res = dedup.minhash_lsh_dedup(docs_ds, threshold=0.7)
    clusters = _clusters_dict(res["clusters"])
    assert clusters.get(100) == 0  # near-dup joined to doc 0
    assert clusters.get(101) == 1  # exact dup joined to doc 1
    # distinct docs unclustered
    assert 5 not in clusters and 6 not in clusters


def test_minhash_planted_dups_larger_corpus():
    """330-doc corpus (≥10× the small fixture), 30 planted near-dups —
    exercises the distributed bucket/verify stages with many buckets and
    no driver-side candidate dict."""
    rng = np.random.default_rng(7)
    words = BASE.split()
    texts, ids = [], []
    for i in range(300):
        w = list(rng.permutation(words)) + [f"u{i}w{j}" for j in range(8)]
        texts.append(" ".join(w))
        ids.append(i)
    for i in range(30):  # near-dup of doc i: drop the last two words
        texts.append(" ".join(texts[i].split()[:-2]))
        ids.append(1000 + i)
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)}
        )
    ).repartition(8)
    res = dedup.minhash_lsh_dedup(ds, threshold=0.7)
    clusters = _clusters_dict(res["clusters"])
    for i in range(30):
        assert clusters.get(1000 + i) == i, i
    assert 200 not in clusters  # an unduplicated doc stays unclustered


def test_minhash_signature_stability():
    h1 = dedup.MinHasher(seed=42)
    h2 = dedup.MinHasher(seed=42)
    s1, s2 = h1.signature(BASE), h2.signature(BASE)
    np.testing.assert_array_equal(s1, s2)
    assert not np.array_equal(s1, dedup.MinHasher(seed=7).signature(BASE))


def test_jaccard_bounds():
    assert dedup.jaccard(BASE, BASE) == 1.0
    assert dedup.jaccard(BASE, "totally different words entirely") < 0.05


def test_simhash_near_dups(docs_ds):
    res = dedup.simhash_near_dups(docs_ds, max_hamming=6)
    pairs = _pairs_list(res["pairs"])
    found = {(a, b) for a, b, _ in pairs}
    assert (1, 101) in found  # exact dup: hamming 0
    assert all(d == 0 for a, b, d in pairs if (a, b) == (1, 101))
    assert res["dropped_buckets"] == 0


def test_simhash_overflow_buckets_are_counted():
    """Planted dups in a bucket larger than max_bucket must be either
    found or COUNTED as dropped — never silently lost."""
    texts = ["the same boilerplate text repeated everywhere"] * 80
    texts += [f"unique doc {i} with its own words w{i}a w{i}b" for i in range(5)]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(4)
    res = dedup.simhash_near_dups(ds, max_hamming=3, max_bucket=16)
    found = {(a, b) for a, b, _ in _pairs_list(res["pairs"])}
    if (0, 1) not in found:
        # the 80 identical docs share every pair-key bucket → all dropped
        assert res["dropped_buckets"] > 0
        assert res["dropped_doc_slots"] >= 80
    # raising the cap recovers the planted pairs
    res2 = dedup.simhash_near_dups(ds, max_hamming=3, max_bucket=128)
    assert res2["dropped_buckets"] == 0
    assert (0, 1) in {(a, b) for a, b, _ in _pairs_list(res2["pairs"])}


def test_simhash_pair_key_recall_at_h4():
    """2-of-6 chunk pairs guarantee bucketing for Hamming ≤ 4: flip 4 bits
    spread over 4 different chunks and the pair must still be found."""
    sh = dedup.SimHasher()
    base_text = "alpha beta gamma delta epsilon zeta eta theta"
    fp = sh.fingerprint(base_text)
    # flips in chunks 0,1,2,3 (bit offsets 0,11,22,33) → chunks 4,5 intact
    flipped = fp ^ 0b1 ^ (1 << 11) ^ (1 << 22) ^ (1 << 33)
    offs = sh.CHUNK_OFFSETS
    masks = (np.uint64(1) << sh.CHUNK_WIDTHS) - np.uint64(1)
    c1 = (np.uint64(fp) >> offs) & masks
    c2 = (np.uint64(flipped) >> offs) & masks
    shared = [
        (i, j)
        for i, j in sh.PAIRS
        if c1[i] == c2[i] and c1[j] == c2[j]
    ]
    assert shared, "h=4 fingerprints must share at least one pair key"


def test_embedding_near_dups():
    rng = np.random.default_rng(42)
    m = rng.standard_normal((50, 16))
    m[30] = m[10] + rng.standard_normal(16) * 0.01  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    pairs = _pairs_list(dedup.embedding_near_dups(ds, threshold=0.99))
    assert any(a == 10 and b == 30 for a, b, _ in pairs)
    # oracle: full numpy check
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    want = {(i, j) for i in range(50) for j in range(i + 1, 50) if sims[i, j] >= 0.99}
    assert {(a, b) for a, b, _ in pairs} == want


def test_minhash_dedup_large_corpus():
    """Planted-dup recall on a corpus ~15× the small fixture: the verify
    stage is fully distributed (groupby.map_groups), so the only driver
    state is the verified-pair list — this exercises that path at size."""
    rng = np.random.default_rng(7)
    words = BASE.split()
    texts, ids = [], []
    for i in range(300):
        w = list(rng.permutation(words)) + [f"u{i}w{j}" for j in range(8)]
        texts.append(" ".join(w))
        ids.append(i)
    planted = {}
    for k in range(10):  # near-dup of doc k: drop last two words
        texts.append(" ".join(texts[k].split()[:-2]))
        ids.append(1000 + k)
        planted[1000 + k] = k
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(8)
    res = dedup.minhash_lsh_dedup(ds, threshold=0.7)
    clusters = _clusters_dict(res["clusters"])
    for dup, orig in planted.items():
        assert clusters.get(dup) == orig, (dup, orig)
    # distinct docs not clustered together
    roots = {clusters.get(i) for i in range(10, 20)}
    assert roots == {None}


def test_minhash_dedup_corpus_closed_form():
    """End-to-end dedup materialization (minhash clusters → drop list →
    sort-based EXCEPT keep-list) matches the brute-force closed form of
    the planted corpus on the real sf0.001 doc_id population."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from engine.queries import minhash_dedup_corpus

    sf = "/root/testdata/sf0.001"
    kept = sorted(
        minhash_dedup_corpus(sf).to_pandas()["doc_id"].astype(int).tolist()
    )
    ids = sorted(
        pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    groups = defaultdict(list)
    for d in ids:
        if d % 4 < 3:
            groups[d // 4].append(d)
    drops = {
        m
        for g in groups.values()
        if len(g) >= 2
        for m in g
        if m != min(g)
    }
    assert drops, "planted corpus produced no duplicate groups"
    assert kept == [d for d in ids if d not in drops]


def test_mixture_sample_rates_and_determinism():
    import hashlib

    ids = list(range(200))
    src = [
        "keep" if i % 3 == 0 else ("drop" if i % 3 == 1 else "other")
        for i in ids
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "source": pa.array(src)}
        )
    )
    rates = {"keep": 1_000_000, "drop": 0}
    kept = set(
        textstats.mixture_sample(ds, rates, default_ppm=500_000)
        .to_pandas()["doc_id"]
        .tolist()
    )
    for i in ids:
        if src[i] == "keep":
            assert i in kept
        elif src[i] == "drop":
            assert i not in kept
        else:  # default rate follows the md5 closed form exactly
            h = (
                int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:], "little")
                % 1_000_000
            )
            assert (i in kept) == (h < 500_000), i
    # repartition/reorder-stable
    kept2 = set(
        textstats.mixture_sample(ds.repartition(7), rates, default_ppm=500_000)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert kept2 == kept
    with pytest.raises(ValueError):
        textstats.mixture_sample(ds, {"keep": 2_000_000})


def test_token_histogram_exact():
    import re as _re

    texts = ["a b c", None, "", "x " * 120, "one two", "a b  c d e", "w"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))
    out = (
        textstats.token_histogram(ds, bin_width=3)
        .to_pandas()
        .set_index("bin")["n_docs"]
        .to_dict()
    )
    want = {}
    for t in texts:
        if t is None:
            continue
        b = len(_re.split(r"\s+", t.strip())) // 3
        want[b] = want.get(b, 0) + 1
    assert out == want
    # partition-stable (partials combine exactly)
    out2 = (
        textstats.token_histogram(ds.repartition(5), bin_width=3)
        .to_pandas()
        .set_index("bin")["n_docs"]
        .to_dict()
    )
    assert out2 == want
    with pytest.raises(ValueError):
        textstats.token_histogram(ds, bin_width=0)


def test_epoch_shuffle_deterministic_permutation():
    import hashlib

    ids = list(range(500))
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64())}))

    def hk(i):
        return (
            int.from_bytes(hashlib.md5(f"7:{i}".encode()).digest()[8:], "little")
            & ((1 << 63) - 1)
        )

    want = sorted(ids, key=lambda i: (hk(i), i))
    out = textstats.epoch_shuffle(ds, seed=7).to_pandas().sort_values("pos")
    assert out["pos"].tolist() == ids  # contiguous 0..n-1
    assert out["doc_id"].tolist() == want
    # bit-stable under a different partitioning
    out2 = (
        textstats.epoch_shuffle(ds.repartition(9), seed=7)
        .to_pandas()
        .sort_values("pos")
    )
    assert out2["doc_id"].tolist() == want
    # a different seed is an (overwhelmingly) different permutation
    out3 = textstats.epoch_shuffle(ds, seed=8).to_pandas().sort_values("pos")
    assert out3["doc_id"].tolist() != want


def test_embedding_near_dups_ivf_matches_brute():
    """assign_top == num_centroids is exhaustive (every pair shares every
    bucket) and must equal the brute-force pair set; a 2-probe assignment
    still finds the planted near-identical pair."""
    rng = np.random.default_rng(42)
    m = rng.standard_normal((120, 16))
    m[30] = m[10] + rng.standard_normal(16) * 0.01
    tbl = pa.table(
        {
            "vec_id": pa.array(range(120), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  type=pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    brute = _pairs_list(dedup.embedding_near_dups(ds, threshold=0.9))
    full = _pairs_list(
        dedup.embedding_near_dups_ivf(
            ds, threshold=0.9, num_centroids=6, assign_top=6
        )
    )
    assert [(a, b, round(s, 9)) for a, b, s in full] == [
        (a, b, round(s, 9)) for a, b, s in brute
    ]
    part = _pairs_list(
        dedup.embedding_near_dups_ivf(
            ds, threshold=0.9, num_centroids=6, assign_top=2
        )
    )
    assert any(a == 10 and b == 30 for a, b, _ in part)
    assert set((a, b) for a, b, _ in part) <= set((a, b) for a, b, _ in brute)


def test_langid_templates_unambiguous():
    """The planted-language oracle is sound only if every Latin template
    word is a stopword of EXACTLY its own language (argmax has no ties)
    and the unknown/zh templates hit no stopword list at all."""
    from engine.queries import _LANGID_TEMPLATES
    from engine.textstats import _STOPWORDS, TextAnalyzer

    for lang, tpl in _LANGID_TEMPLATES.items():
        for w in tpl.split():
            hits = {lg for lg, sw in _STOPWORDS.items() if w in sw}
            if lang in _STOPWORDS:
                assert hits == {lang}, (lang, w, hits)
            else:
                assert not hits, (lang, w, hits)
    ta = TextAnalyzer()
    for lang, tpl in _LANGID_TEMPLATES.items():
        assert ta.lang_of(tpl) == lang, lang


def test_textstats():
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "the cat and the dog are in the house with a mouse",
                "der hund und die katze sind nicht in dem haus",
                "!!! ??? ,,, ...",
            ],
        }
    )
    out = textstats.analyze(ray.data.from_arrow(tbl), concurrency=1).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "lang_id"] == "en"
    assert out.loc[1, "lang_id"] == "de"
    assert out.loc[0, "n_words"] == 12
    assert out.loc[0, "n_tokens_ws"] == 12
    assert out.loc[2, "punct_ratio"] > 0.5
    assert out.loc[0, "stopword_ratio"] > 0.4
    assert 0.0 <= out.loc[2, "quality"] <= 1.0
    # fingerprint: deterministic, order-sensitive
    ta = textstats.TextAnalyzer()
    assert ta.fingerprint("a b c") == ta.fingerprint("a b c")
    assert ta.fingerprint("a b c") != ta.fingerprint("c b a")


def test_multimodal_plumbing():
    tbl = multimodal.synthetic_media_table(n=30)
    ds = ray.data.from_arrow(tbl).repartition(2)
    feats = multimodal.featurize(ds, feature_dim=8, concurrency=2, batch_size=8)
    df = feats.to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(df) == 30
    assert all(len(f) == 8 for f in df["features"])
    # deterministic: same payload → same features
    again = multimodal.featurize(
        ray.data.from_arrow(tbl).repartition(2), feature_dim=8, concurrency=2,
        batch_size=8
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    np.testing.assert_allclose(
        np.stack(df["features"].map(np.asarray)),
        np.stack(again["features"].map(np.asarray)),
    )


def test_multimodal_real_backend_edges():
    cls = multimodal.DecodeAndFeaturize(decode_backend="real")
    # non-AVI / non-PNG bytes fail loudly, never a silent fake decode
    with pytest.raises(ValueError):
        cls._real_features(b"anything", "video")
    with pytest.raises(ValueError):
        cls._real_features(b"not a png", "image")


def test_frame_sample():
    tbl = multimodal.synthetic_media_table(n=9)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            multimodal.FrameSample,
            fn_constructor_kwargs=dict(frames_per_video=4),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    n_videos = sum(1 for k in tbl.column("kind").to_pylist() if k == "video")
    assert len(out) == 4 * n_videos
    assert set(out["frame_no"]) == {0, 1, 2, 3}


def test_resize_stub():
    tbl = multimodal.synthetic_media_table(n=6)
    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            multimodal.Resize,
            fn_constructor_kwargs=dict(width=64, height=48),
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    assert (out["meta_width"] == 64).all()
    assert (out["meta_height"] == 48).all()
    assert out["payload"].map(len).gt(0).all()


def test_ivf_topk_recall():
    """IVF-bucketed ANN: probing all centroids must equal brute force
    exactly; a partial probe keeps high recall on the planted neighbor."""
    import ray.data
    from engine.annsearch import brute_force_topk, ivf_build, ivf_topk

    rng = np.random.default_rng(42)
    m = rng.standard_normal((400, 32))
    m[77] = m[5] * 0.9 + rng.standard_normal(32) * 0.05  # planted neighbor
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in m], type=pa.list_(pa.float64())
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    q = m[5]
    brute = brute_force_topk(ds, q, k=5).to_pandas()
    idx = ivf_build(ds, num_centroids=8, sample_rows=400)
    full = ivf_topk(idx, q, k=5, nprobe=8).to_pandas()
    assert full["vec_id"].tolist() == brute["vec_id"].tolist()
    part = ivf_topk(idx, q, k=5, nprobe=3).to_pandas()
    assert 5 in part["vec_id"].tolist() and 77 in part["vec_id"].tolist()


def test_hll_error_bound_and_order_invariance():
    """HLL estimate within ~5% (3σ at p=12) of the exact distinct count,
    and identical under repartitioning (register max-merge is
    order-independent)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.sketch import approx_distinct

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 50_000, 120_000).astype("int64")
    exact = len(np.unique(vals))
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    est, nz = approx_distinct(ds, "v", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)
    est2, nz2 = approx_distinct(ds.repartition(13), "v", p=12)
    assert est2 == est and nz2 == nz


def test_hll_linear_counting_branch_small():
    import pandas as pd
    import ray.data as rd

    from engine.sketch import approx_distinct

    ds = rd.from_pandas(pd.DataFrame({"v": list(range(100)) * 5}))
    est, nz = approx_distinct(ds, "v", p=12)
    # tiny cardinality -> linear counting branch, which is near-exact here
    assert abs(est - 100) < 3, est


def test_tfidf_scores_manual_corpus():
    """Exact postings + df + tfidf on a hand-checkable corpus."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.textstats import tfidf_scores

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple banana apple",
                "banana cherry",
                "apple",
                "",  # empty doc contributes no postings
            ],
        }
    )
    out = tfidf_scores(rd.from_pandas(docs).repartition(3)).to_pandas()
    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.tfidf) for r in out.itertuples()
    }
    n = 4.0
    exp = {
        (1, "apple"): (2, 2), (1, "banana"): (1, 2),
        (2, "banana"): (1, 2), (2, "cherry"): (1, 1),
        (3, "apple"): (1, 2),
    }
    assert set(got) == set(exp)
    for k, (tf, df) in exp.items():
        gtf, gdf, gtfidf = got[k]
        assert (gtf, gdf) == (tf, df), k
        assert gtfidf == np.round(tf * np.log(n / df), 9), k


def test_pricing_summary_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.summarize import pricing_summary

    rng = np.random.default_rng(3)
    m = 5000
    df = pd.DataFrame(
        {
            "l_returnflag": rng.choice(list("ANR"), m),
            "l_linestatus": rng.choice(list("FO"), m),
            "l_quantity": rng.integers(1, 51, m).astype(float),
            "l_extendedprice": np.round(rng.uniform(900, 10500, m), 2),
            "l_discount": np.round(rng.integers(0, 11, m) / 100.0, 2),
            "l_tax": np.round(rng.integers(0, 9, m) / 100.0, 2),
            "l_shipdate": pd.to_datetime("2000-01-01")
            + pd.to_timedelta(rng.integers(0, 900, m), unit="D"),
        }
    )
    cutoff = np.datetime64("2001-06-01")
    out = (
        pricing_summary(rd.from_pandas(df).repartition(7), ship_cutoff=cutoff)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    f = df[df["l_shipdate"] <= pd.Timestamp(cutoff)].copy()
    f["qty"] = np.round(f["l_quantity"]).astype(np.int64)
    f["pc"] = np.round(f["l_extendedprice"] * 100).astype(np.int64)
    f["dc"] = np.round(f["l_discount"] * 100).astype(np.int64)
    f["tc"] = np.round(f["l_tax"] * 100).astype(np.int64)
    f["disc_price"] = f["pc"] * (100 - f["dc"])
    f["charge"] = f["disc_price"] * (100 + f["tc"])
    f["one"] = 1
    want = (
        f.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(
            sum_qty=("qty", "sum"),
            sum_base_price_cents=("pc", "sum"),
            sum_disc_price_e4=("disc_price", "sum"),
            sum_charge_e6=("charge", "sum"),
            count_order=("one", "sum"),
        )
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    for c in ["sum_qty", "sum_base_price_cents", "sum_disc_price_e4",
              "sum_charge_e6", "count_order"]:
        np.testing.assert_array_equal(
            out[c].to_numpy(), want[c].to_numpy(), err_msg=c
        )
    np.testing.assert_allclose(
        out["avg_qty"].to_numpy(),
        np.round(want["sum_qty"] / want["count_order"], 9).to_numpy(),
    )


def test_heavy_hitters_exact_vs_brute():
    """Two-pass heavy hitters == brute-force HAVING count*k > N, under
    small batches (many pass-1 candidate windows) and a skewed corpus."""
    import re
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.textstats import heavy_hitter_tokens

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    weights = 1.0 / (np.arange(1, 201) ** 1.3)  # zipf-ish skew
    weights /= weights.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40), p=weights))
        for _ in range(300)
    ]
    docs = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(17)
    k = 60
    out = heavy_hitter_tokens(docs, k=k).to_pandas()
    got = dict(zip(out["token"], out["cnt"]))
    counts = Counter()
    for x in texts:
        counts.update(re.findall(r"\w+", x.lower()))
    n = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * k > n}
    assert got == want
    assert len(want) > 0  # the test corpus must actually have heavy hitters


# ---------------------------------------------------------------------------
# decontamination (engine/decontam.py)
# ---------------------------------------------------------------------------


def test_doc_grams_edges():
    from engine.decontam import _doc_grams

    assert _doc_grams("a b c d e f", 5) == {"a b c d e", "b c d e f"}
    assert _doc_grams("a b c", 5) == set()
    assert _doc_grams("", 5) == set()
    assert _doc_grams(None, 5) == set()
    # literal single-space split keeps empty tokens (== DuckDB string_split)
    assert _doc_grams("a  b c d", 3) == {"a  b", " b c", "b c d"}


def test_decontaminate_bruteforce():
    """Distributed flags+counts == brute-force set intersection per doc."""
    import ray.data as rd

    from engine.decontam import _doc_grams, decontaminate

    rng = np.random.default_rng(3)
    words = BASE.split()
    texts = [" ".join(rng.choice(words, size=rng.integers(6, 30))) for _ in range(60)]
    ids = list(range(60))
    held_idx = set(range(0, 60, 9))
    held = pa.table(
        {
            "doc_id": pa.array([i for i in ids if i in held_idx], type=pa.int64()),
            "text": pa.array([texts[i] for i in ids if i in held_idx]),
        }
    )
    train = pa.table(
        {
            "doc_id": pa.array([i for i in ids if i not in held_idx], type=pa.int64()),
            "text": pa.array([texts[i] for i in ids if i not in held_idx]),
        }
    )
    n = 3
    out = decontaminate(
        rd.from_arrow(train).repartition(5), rd.from_arrow(held).repartition(2), n=n
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated_grams"]))

    held_grams = set()
    for i in held_idx:
        held_grams |= _doc_grams(texts[i], n)
    want = {}
    for i in ids:
        if i in held_idx:
            continue
        c = len(_doc_grams(texts[i], n) & held_grams)
        if c:
            want[i] = c
    assert got == want
    assert len(want) > 0  # corpus must actually produce contamination


def test_heldout_gram_guard():
    import ray.data as rd

    from engine.decontam import heldout_gram_set

    docs = rd.from_arrow(
        pa.table({"doc_id": [0], "text": ["a b c d e f g h i j"]})
    )
    with pytest.raises(ValueError, match="max_grams"):
        heldout_gram_set(docs, n=2, max_grams=3)


# ---------------------------------------------------------------------------
# PII scan (engine/pii.py)
# ---------------------------------------------------------------------------


def test_pii_scanner_counts_and_redaction():
    import ray.data as rd

    from engine.pii import scan_pii

    rows = [
        ("mail a@b.com or c.d-e_f@g-h.org", 2, 0, "mail [EMAIL] or [EMAIL]"),
        ("call +1-555-0042 and +1-555-9999", 0, 2, "call [PHONE] and [PHONE]"),
        ("both x9@y.io +1-555-1000 end", 1, 1, "both [EMAIL] [PHONE] end"),
        ("clean text no pii here", 0, 0, "clean text no pii here"),
        ("", 0, 0, ""),
        (None, 0, 0, ""),
        ("+1-555-123 too short, 1-555-1234 no plus", 0, 0, None),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), type=pa.int64()),
            "text": pa.array([r[0] for r in rows], type=pa.string()),
        }
    )
    out = (
        scan_pii(rd.from_arrow(tbl).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, (_, ne, np_, red) in enumerate(rows):
        assert out.loc[i, "n_emails"] == ne, i
        assert out.loc[i, "n_phones"] == np_, i
        if red is not None:
            assert out.loc[i, "redacted"] == red, i


def test_bpeish_template_linearity():
    """The planted-corpus oracle's closed form: 9 tokens per repetition."""
    import re as _re

    from engine.textstats import _BPEISH

    rx = _re.compile(_BPEISH)
    template = "it's rock 42 ok!!  end."
    for k in range(1, 8):
        assert len(rx.findall(" ".join([template] * k))) == 9 * k


def test_chunk_documents_edges():
    import ray.data as rd

    from engine.textstats import chunk_documents

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(
                ["abcdefghij", "abc", "", None, "abcdef"], type=pa.string()
            ),
        }
    )
    out = (
        chunk_documents(rd.from_arrow(tbl).repartition(2), size=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    got = list(zip(out["doc_id"], out["chunk_idx"], out["chunk"]))
    assert got == [
        (0, 0, "abcd"), (0, 1, "defg"), (0, 2, "ghij"), (0, 3, "j"),
        (1, 0, "abc"),
        (4, 0, "abcd"), (4, 1, "def"),
    ]
    with pytest.raises(ValueError):
        chunk_documents(rd.from_arrow(tbl), size=0, stride=3)


def test_pii_matches_re_bruteforce_property():
    """Randomized planted strings: scanner counts == plain re on driver."""
    import re as _re

    import ray.data as rd

    from engine.pii import EMAIL_RE, PHONE_RE, scan_pii

    rng = np.random.default_rng(11)
    words = ["foo", "bar", "a@b.cd", "x_1@y-z.org", "+1-555-0000",
             "+1-555-12345", "1-555-1234", "no@tld", "a@b.c", "end."]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 12)))
        for _ in range(80)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = (
        scan_pii(rd.from_arrow(tbl).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    em, ph = _re.compile(EMAIL_RE), _re.compile(PHONE_RE)
    for i, t in enumerate(texts):
        assert out.loc[i, "n_emails"] == len(em.findall(t)), t
        assert out.loc[i, "n_phones"] == len(ph.findall(t)), t
        assert out.loc[i, "redacted"] == ph.sub(
            "[PHONE]", em.sub("[EMAIL]", t)
        ), t


def test_analyze_adversarial_long_token():
    """A single huge token must not blow up the fixed-width numpy path
    (object-dtype fallback) and statistics stay exact."""
    import ray.data as rd

    from engine.textstats import analyze

    long_tok = "x" * 100_000
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([f"the {long_tok} end", "the and of to that"]),
        }
    )
    out = (
        analyze(rd.from_arrow(tbl), concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "n_words"] == 3
    assert out.loc[0, "mean_word_len"] == (3 + 100_000 + 3) / 3
    assert out.loc[1, "lang_id"] == "en"


def test_token_percentiles_null_text_skipped():
    """Nulls are excluded from the percentile population (SQL
    percentile_disc semantics), not counted as 0."""
    import duckdb
    import ray.data as rd

    from engine.textstats import token_count_percentiles

    texts = ["a b c", None, "a b c d e", "a", None, "a b"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    got = token_count_percentiles(rd.from_arrow(tbl)).to_pandas().iloc[0]
    want = duckdb.sql(
        r"""WITH n AS (SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n
             FROM (SELECT unnest(['a b c', NULL, 'a b c d e', 'a', NULL, 'a b']) AS text))
            SELECT percentile_disc(0.5) WITHIN GROUP (ORDER BY n),
                   percentile_disc(0.9) WITHIN GROUP (ORDER BY n),
                   percentile_disc(0.99) WITHIN GROUP (ORDER BY n) FROM n"""
    ).fetchone()
    assert (got["p50"], got["p90"], got["p99"]) == want

    empty = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "text": pa.array([None], type=pa.string())}
    )
    with pytest.raises(Exception, match="empty population"):
        token_count_percentiles(rd.from_arrow(empty)).to_pandas()


def test_repetition_stats_brute_and_oracle():
    """RepetitionStats == a Counter brute force AND the registered DuckDB
    oracle SQL, including null/empty/mixed-case/short-doc edges."""
    import re
    from collections import Counter

    import duckdb

    from engine.queries import ORACLE_SQL
    from engine.textstats import RepetitionStats

    rng = np.random.default_rng(13)
    vocab = ["a", "b", "the", "dog", "cat", "lorem"]
    docs = [
        " ".join(rng.choice(vocab, size=int(k)))
        for k in rng.integers(0, 15, size=60)
    ]
    docs += ["", "x", "y y", "z z z", "the the the the", None,
             "Mixed CASE the THE tHe", "a b a b a b a b"]
    n = len(docs)
    tbl = pa.table(
        {"doc_id": pa.array(range(n), type=pa.int64()),
         "text": pa.array(docs, type=pa.string())}
    )
    out = RepetitionStats()(tbl)

    word = re.compile(r"[^\W\d_]+", re.U)
    for i, t in enumerate(docs):
        ws = word.findall((t or "").lower())
        for col, width, kind in (
            ("top_token_frac_micro", 1, "top"),
            ("top_bigram_frac_micro", 2, "top"),
            ("dup_trigram_frac_micro", 3, "dup"),
        ):
            grams = Counter(
                tuple(ws[j:j + width]) for j in range(len(ws) - width + 1)
            )
            total = sum(grams.values())
            num = (max(grams.values()) if grams else 0) if kind == "top" \
                else total - len(grams)
            want = int(np.floor(num / max(total, 1) * 1e6 + 0.5))
            assert out.column(col)[i].as_py() == want, (i, col)

    con = duckdb.connect()
    con.register("documents", tbl)
    oracle = (
        con.execute(ORACLE_SQL["repetition_stats"] + " ORDER BY doc_id")
        .fetch_arrow_table()
    )
    mine = out.select(
        ["doc_id", "n_words", "top_token_frac_micro",
         "top_bigram_frac_micro", "dup_trigram_frac_micro"]
    ).sort_by("doc_id")
    assert mine.equals(oracle.cast(mine.schema))


def test_repetition_actor_pipeline(docs_ds):
    """The repetition() actor-pool path over a multi-block Dataset agrees
    with a single direct batch call on the same rows."""
    from engine.textstats import RepetitionStats, repetition

    got = (
        repetition(docs_ds, batch_size=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    direct = RepetitionStats()(_docs_table()).to_pandas()
    direct = direct.sort_values("doc_id").reset_index(drop=True)
    for col in ("n_words", "top_token_frac_micro",
                "top_bigram_frac_micro", "dup_trigram_frac_micro"):
        assert (got[col] == direct[col]).all(), col


def test_group_centroids_exact_and_partition_stable():
    """group_centroids vs a numpy brute-force mean per (label, dim):
    exact after the shared 6-decimal round, stable across partitionings,
    and empty-batch-safe."""
    from engine.annsearch import group_centroids

    rng = np.random.default_rng(3)
    n, dim = 40, 5
    labels = rng.integers(0, 4, n).astype(np.int32)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.array(
                [v for v in vecs.tolist()], type=pa.list_(pa.float32())
            ),
        }
    )
    want = {}
    for lab in np.unique(labels):
        m = vecs[labels == lab].astype(np.float64).mean(axis=0)
        for d in range(dim):
            want[(int(lab), d + 1)] = round(float(m[d]), 6)

    for parts in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = group_centroids(ds).to_pandas()
        got = {
            (int(l), int(d)): round(float(c), 6)
            for l, d, c in zip(df["label"], df["dim"], df["c"])
        }
        assert got == want


def test_cms_registers_and_estimate_properties():
    """CMS registers vs a driver brute-force sketch (exact, partition
    stable); point estimates are one-sided (>= true count) and exact for
    tokens whose counters carry no collision mass."""
    import re as _re
    from collections import Counter

    from engine.sketch import _cms_hash, cms_estimate, cms_registers

    depth, width = 4, 64
    texts = ["a b a c", None, "", "b  b\tc", "d e f g a", "zz zz"]
    true = Counter()
    for t in texts:
        if t is not None:
            # the engine/SQL token contract: regex split of the stripped
            # text — an empty doc contributes ONE empty token
            true.update(_re.split(r"\s+", t.strip()))
    # brute-force register table with the identical hash
    want = Counter()
    for tok, cnt in true.items():
        for r in range(depth):
            want[(r, _cms_hash(r, tok, width))] += cnt

    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))
    for parts in (1, 5):
        regs = {
            (int(x["r"]), int(x["c"])): int(x["cnt"])
            for x in cms_registers(
                ds.repartition(parts), depth=depth, width=width
            ).take_all()
        }
        assert regs == dict(want)

    for tok, cnt in true.items():
        est = cms_estimate(regs, tok, depth=depth, width=width)
        assert est >= cnt
        # exact when some row's counter holds only this token's mass
        if any(
            want[(r, _cms_hash(r, tok, width))] == cnt for r in range(depth)
        ):
            assert est == cnt
    # absent token estimates only collision mass (possibly 0)
    assert cms_estimate(regs, "absent-token", depth=depth, width=width) >= 0


def test_grouped_token_percentiles_brute_and_partition_stable():
    """grouped_token_percentiles vs a driver brute-force percentile_disc
    per group (smallest value with cumulative count >= ceil(q*total)),
    including a group of size 1 and null-text exclusion."""
    import re as _re

    rng = np.random.default_rng(9)
    groups = ["a"] * 17 + ["b"] * 30 + ["c"]
    texts = ["w " * int(k) for k in rng.integers(1, 40, len(groups))]
    texts[3] = None  # null text in group a: excluded from its population
    tbl = pa.table(
        {
            "source": pa.array(groups, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    want = {}
    by_g: dict = {}
    for g, t in zip(groups, texts):
        if t is not None:
            by_g.setdefault(g, []).append(len(_re.split(r"\s+", t.strip())))
    for g, ns in by_g.items():
        ns.sort()
        row = {}
        for q in (0.5, 0.9, 0.99):
            row[f"p{int(q * 100)}"] = ns[max(0, int(np.ceil(q * len(ns))) - 1)]
        want[g] = row

    for parts in (1, 6):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = textstats.grouped_token_percentiles(ds).to_pandas()
        got = {
            r["source"]: {k: int(r[k]) for k in ("p50", "p90", "p99")}
            for _, r in df.iterrows()
        }
        assert got == want


def test_length_band_filter_brute():
    """length_band_filter vs a driver brute force: per-group disc
    percentile band, inclusive bounds, null texts dropped, groups
    independent (a verbose group keeps its own long docs)."""
    import re as _re

    rng = np.random.default_rng(13)
    rows = []
    for i in range(60):
        g = "short" if i % 2 == 0 else "long"
        k = int(rng.integers(1, 12)) if g == "short" else int(rng.integers(50, 200))
        rows.append((i, g, "w " * k))
    rows.append((900, "short", None))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "source": pa.array([r[1] for r in rows], type=pa.string()),
            "text": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    lo, hi = 0.1, 0.9
    by_g: dict = {}
    for i, g, t in rows:
        if t is not None:
            by_g.setdefault(g, []).append((i, len(_re.split(r"\s+", t.strip()))))
    want = {}
    for g, pairs in by_g.items():
        ns = sorted(n for _, n in pairs)
        b_lo = ns[max(0, int(np.ceil(lo * len(ns))) - 1)]
        b_hi = ns[max(0, int(np.ceil(hi * len(ns))) - 1)]
        for i, n in pairs:
            if b_lo <= n <= b_hi:
                want[i] = n

    ds = ray.data.from_arrow(tbl).repartition(5)
    df = textstats.length_band_filter(ds, lo=lo, hi=hi).to_pandas()
    got = dict(zip(df["doc_id"].astype(int), df["n_tokens"].astype(int)))
    assert got == want
    # both groups must have survivors (bands are per-group)
    kept_groups = {("short" if i % 2 == 0 else "long") for i in got if i < 900}
    assert kept_groups == {"short", "long"}


def test_json_field_sum_brute_and_partition_stable():
    """json_field_sum vs a driver brute force: null JSON excluded,
    missing/null field counts the row but adds 0 (matching SQL SUM over
    NULL), partials combine exactly across partitionings."""
    from engine.jsonops import json_field_sum

    rows = [
        ("a", '{"k": 5}'),
        ("a", '{"k": -2}'),
        ("a", None),
        ("b", '{"k": 0}'),
        ("b", '{"other": 9}'),
        ("b", '{"k": null}'),
        ("c", '{"k": 1000000}'),
    ]
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "props": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
    want = {"a": (3, 2), "b": (0, 3), "c": (1000000, 1)}
    for parts in (1, 4):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        df = json_field_sum(ds).to_pandas()
        got = {
            r["event_type"]: (int(r["sum_k"]), int(r["n_events"]))
            for _, r in df.iterrows()
        }
        assert got == want
