"""Property-based testing (SURVEY.md §5.4): random seeded digraphs, engine
vs sequential oracle. Hypothesis generates edge lists; the Ray session is
shared (conftest), so examples are kept small and deadline disabled."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from engine import oracle
from engine.components import connected_components
from engine.pagerank import pagerank

edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


def _ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], type=pa.uint64()),
                "dst": pa.array([b for _, b in edges], type=pa.uint64()),
            }
        )
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_pagerank_matches_oracle_on_random_graphs(edges):
    want = oracle.pagerank_sync(edges, iterations=5)
    res = pagerank(_ds(edges), iterations=5)
    got = res.as_dict()
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_cc_matches_oracle_on_random_graphs(edges):
    want = oracle.connected_components(edges)
    got, _ = connected_components(_ds(edges))
    assert got == want


def test_pagerank_multigraph_semantics():
    """Duplicate edges count twice (ref: src/Graph.cpp:92-97); the engine
    must match the oracle on a multigraph with duplicates and self-loops."""
    edges = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 2), (2, 0)]
    want = oracle.pagerank_sync(edges, iterations=8)
    got = pagerank(_ds(edges), iterations=8).as_dict()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # and differs from the deduped graph (proving duplicates matter)
    dedup = oracle.pagerank_sync(list(set(edges)), iterations=8)
    assert any(abs(dedup[v] - want[v]) > 1e-6 for v in want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(edges=edges_strategy)
def test_bfs_matches_python_on_random_graphs(edges):
    from collections import deque

    from engine import graph as G
    from engine.bsp import BSPGraph

    ds = _ds(edges)
    ids = G.vertex_ids(ds)
    enc = G.encode_edges(ds, ids)
    g = BSPGraph(enc, n=len(ids), num_shards=3, symmetric_copy=True)
    out, _ = g.bfs(source_vid=0)
    g.shutdown()
    n = len(ids)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    src = int(ids[0])
    want = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in want:
                want[w] = want[u] + 1
                q.append(w)
    df = out.to_pandas()
    got = {
        int(ids[v]): int(d) for v, d in zip(df["vid"], df["label"]) if d < n
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    vals=st.lists(st.integers(0, 1000), min_size=1, max_size=60),
    nblocks=st.integers(1, 7),
)
def test_running_total_property(vals, nblocks):
    import pandas as pd

    from engine.windows import running_total

    df = pd.DataFrame(
        {"k": np.arange(len(vals), dtype=np.int64), "v": np.asarray(vals, np.int64)}
    ).sample(frac=1.0, random_state=3)  # shuffled input order
    out = (
        running_total(
            ray.data.from_pandas(df).repartition(nblocks), "k", "v",
            out_col="rt", exclusive=True,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = np.concatenate(([0], np.cumsum(vals)[:-1]))
    np.testing.assert_array_equal(out["rt"].to_numpy(), want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
    ),
    size=st.integers(1, 8),
    stride=st.integers(1, 8),
)
def test_chunk_documents_roundtrip_property(texts, size, stride):
    """Chunks cover the doc: with stride <= size, stripping each chunk to
    its first `stride` chars and concatenating reconstructs the text; and
    every chunk equals the corresponding Python slice."""
    from engine.textstats import chunk_documents

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = chunk_documents(
        ray.data.from_arrow(tbl), size=size, stride=stride
    ).to_pandas()
    # Ray 2.49 returns a column-less frame for an all-empty result
    if len(out) == 0:
        out = out.reindex(columns=["doc_id", "chunk_idx", "chunk"])
    out = out.sort_values(["doc_id", "chunk_idx"])
    by_doc = {d: g["chunk"].tolist() for d, g in out.groupby("doc_id")}
    for i, t in enumerate(texts):
        chunks = by_doc.get(i, [])
        want = [t[o : o + size] for o in range(0, len(t), stride)]
        assert chunks == want
        if stride <= size and t:
            assert "".join(c[:stride] for c in chunks) == t


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 50),  # second
            st.sampled_from(["a", "b", "c", "x"]),
        ),
        min_size=1,
        max_size=40,
    ),
    within=st.one_of(st.none(), st.integers(1, 20)),
)
def test_funnel_matches_bruteforce_property(events, within):
    import pandas as pd

    from engine.windows import funnel

    df = pd.DataFrame(
        {
            "user_id": [u for u, _, _ in events],
            "ts": [pd.Timestamp(s, unit="s") for _, s, _ in events],
            "event_type": [e for _, _, e in events],
        }
    )
    out = funnel(
        ray.data.from_pandas(df), steps=("a", "b", "c"), within_sec=within
    ).to_pandas()
    got = (
        dict(zip(out["user_id"], out["funnel_stage"])) if len(out) else {}
    )

    want = {}
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        t, stage = None, 0
        for step in ("a", "b", "c"):
            cand = [
                r.ts
                for r in g.itertuples()
                if r.event_type == step
                and (t is None or (r.ts > t and (within is None or (r.ts - t).total_seconds() <= within)))
            ]
            if not cand:
                break
            t = min(cand)
            stage += 1
        if stage:
            want[u] = stage
    assert got == want
