"""2-hop neighborhood aggregation — "how many distinct vertices share a
neighbor with me", the friends-of-friends / co-purchase primitive (on
the lineitem-projected bipartite graph: distinct other orders sharing a
part). No reference analog (the reference stops at 1-hop gathers); this
is the expansion step a co-occurrence or negative-sampling pipeline runs.

Shape: group edges by the JOIN side (dst), emit ordered pairs per group
(the O(d²) expansion every exact formulation pays), pack each pair into
one int64 and run the house sort-based DISTINCT (Ray 2.49 hash-agg is
~100× slower at ≥10M rows), then a per-batch count combiner + tiny
groupby. Skew: a hot dst of degree d contributes d² pairs — ``cap``
truncates groups beyond it (deterministically, by sorted src) and the
result then carries a ``dropped_groups`` attr the caller must surface;
the contract query runs uncapped/exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from . import graph as G

_PACK = np.int64(1) << np.int64(32)


def adamic_adar_topk(
    edges: ray.data.Dataset,
    k: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
) -> ray.data.Dataset:
    """Top-``k`` Adamic-Adar link-prediction scores (Adamic & Adar,
    "Friends and neighbors on the Web", 2003): for each unordered src
    pair, AA(a,b) = Σ over shared dst neighbors of 1/ln(degree(dst)).

    Weights are quantized to integer nano-units (round(1e9 / ln d)) so
    the pair sums are ORDER-EXACT under any partitioning — a float sum
    would differ in final ulps between engines. Degree-1 neighbors
    create no pairs (and ln 1 = 0 would be a pole). Pairs are packed
    into one int64 and summed with the sort-based grouped SUM
    (``ntile.grouped_sum_sorted`` — Ray 2.49's hash groupby is ~100×
    slower at pair volumes); output is k rows by (score DESC, a, b)."""
    from .ntile import grouped_sum_sorted

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a = np.unique(g[src_col].to_numpy())
        d = len(a)
        if d < 2:
            return pd.DataFrame(
                {"k": np.empty(0, np.int64), "wq": np.empty(0, np.int64)}
            )
        if a[-1] >= (1 << 32) or a[0] < 0:
            raise ValueError("adamic_adar: src ids must be in [0, 2^32)")
        wq = np.int64(round(1e9 / np.log(float(d))))
        x = np.repeat(a, d)
        y = np.tile(a, d)
        m = x < y  # unordered pairs once
        return pd.DataFrame(
            {"k": x[m] * _PACK + y[m], "wq": np.full(int(m.sum()), wq)}
        )

    packed = edges.groupby(dst_col).map_groups(pairs, batch_format="pandas")
    sums = grouped_sum_sorted(packed, "k", "wq", out_col="aa_e9")

    def unpack(t: pa.Table) -> pa.Table:
        kk = t.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(kk // _PACK),
                "b": pa.array(kk % _PACK),
                "aa_e9": t.column("aa_e9"),
            }
        )

    return (
        sums.map_batches(unpack, batch_format="pyarrow")
        .sort(["aa_e9", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def twohop_counts(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    cap: int | None = None,
) -> ray.data.Dataset:
    """Per src vertex: the number of DISTINCT other src vertices sharing
    at least one dst neighbor. Requires 0 <= src ids < 2^32 (pair packing
    — validated per group). Vertices sharing no dst are absent (count 0
    rows are not emitted), matching the SQL join formulation."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        a = np.unique(g[src_col].to_numpy())  # srcs of one dst group
        if cap is not None and len(a) > cap:
            a = a[:cap]
        d = len(a)
        if d < 2:
            return pd.DataFrame({"k": np.empty(0, np.int64)})
        if a[-1] >= (1 << 32) or a[0] < 0:
            raise ValueError("twohop_counts: src ids must be in [0, 2^32)")
        # all ordered pairs (x, y), x != y — both directions, so each
        # side's distinct-neighbor count sees the pair once
        x = np.repeat(a, d)
        y = np.tile(a, d)
        m = x != y
        return pd.DataFrame({"k": x[m] * _PACK + y[m]})

    packed = edges.groupby(dst_col).map_groups(
        pairs, batch_format="pandas"
    ).map_batches(lambda t: t, batch_format="pyarrow")
    # _sorted_distinct_refs reads raw block refs — normalize to arrow first
    refs, _counts = G._sorted_distinct_refs(packed, "k")
    if not refs:
        return ray.data.from_arrow(
            pa.schema([("src", pa.int64()), ("n_twohop", pa.int64())])
            .empty_table()
        )

    @ray.remote
    def count_per_src(tbl: pa.Table) -> pa.Table:
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        src, n = np.unique(k // _PACK, return_counts=True)
        return pa.table(
            {"src": pa.array(src.astype(np.int64)),
             "n_twohop": pa.array(n.astype(np.int64))}
        )

    partial = ray.data.from_arrow_refs(
        [count_per_src.remote(r) for r in refs]
    )
    # blocks are range-partitioned on k, so one src can straddle two
    # blocks — a tiny groupby-sum over the O(srcs) partials settles it
    return partial.groupby("src").aggregate(Sum("n_twohop", alias_name="n_twohop"))


def avg_neighbor_degree(
    edges: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 9,
) -> ray.data.Dataset:
    """Per ``src``: out-degree plus the mean IN-degree of its ``dst``
    neighbors — the "how popular are the things this node references"
    graph feature (sampling / curriculum signal). Shape: one sorted
    grouped count for in-degrees (O(E log E), no hash aggregate), ONE
    hash join to carry the V-sized degree table onto the E-sized edge
    table, then a single sort amortized over both per-src sums via
    :func:`engine.ntile.grouped_sums_sorted`. The float division happens
    once on the final V-sized result, int64-exact before it."""
    from .ntile import grouped_sum_sorted, grouped_sums_sorted

    def with_ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_1", pa.array(np.ones(len(t), dtype=np.int64))
        )

    ones = edges.map_batches(with_ones, batch_format="pyarrow")
    indeg = grouped_sum_sorted(ones, dst_col, "_1", out_col="_ind")
    joined = edges.join(
        indeg,
        join_type="inner",  # every dst has indeg >= 1: no edge is lost
        num_partitions=G.join_partitions_for(edges),
        on=(dst_col,),
    ).map_batches(with_ones, batch_format="pyarrow")
    sums = grouped_sums_sorted(
        joined, src_col, ["_ind", "_1"], ["_s", "outdeg"]
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("_s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("outdeg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                src_col: t.column(src_col),
                "outdeg": t.column("outdeg"),
                "avg_nbr_indeg": pa.array(
                    np.round(s / n, round_to), pa.float64()
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")
