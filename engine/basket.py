"""Market-basket co-occurrence — the within-group all-pairs operator.

"Which items appear together" is the same shape whether the group is a
retail order, a user session, or a document's entity set: a self-join of
(group, item) with itself on the group key. The naive SQL plan (hash
self-join then group-count) ships every row twice and explodes skewed
groups; here the sort does the join: after one global sort by (group,
item), each group's items are contiguous, so every pair is emitted by a
single vectorized pass — no join operator at all, and a group's pair
fan-out (m·(m−1)/2) is generated where the data already sits.

Cross-block state is the house boundary-carry: only the group straddling
a block edge needs help, so each block ships its LAST group's items
(bounded by basket size, ~7 for order baskets) to the driver, which
chains them into the next block's prepend — O(blocks × basket) driver
metadata, never rows. Pairs are packed into one int64 (a·2³² + b,
a < b by sort order) so counting is the sorted grouped SUM.

No reference analog (the reference is graph-only); this is the
co-occurrence/association stage of a curation or recommendation
pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import nonempty_block_refs

_PACK = np.int64(1) << 32


def pair_counts(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    a_col: str = "item_a",
    b_col: str = "item_b",
    n_col: str = "n_groups",
) -> ray.data.Dataset:
    """Count, for every unordered item pair, the number of groups
    containing BOTH (each group counts once however often an item
    repeats inside it). Both columns must be int64 with items in
    [0, 2³²) for the pair packing."""
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort([group_col, item_col]).materialize()
    refs = nonempty_block_refs(s)
    out_schema = pa.schema(
        [(a_col, pa.int64()), (b_col, pa.int64()), (n_col, pa.int64())]
    )
    pair_schema = pa.schema([("_pair", pa.int64()), ("_n", pa.int64())])
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def edge_meta(tbl: pa.Table):
        """(first_group, last_group, last group's items) — tiny."""
        g = tbl.column(group_col).to_numpy(zero_copy_only=False)
        items = tbl.column(item_col).to_numpy(zero_copy_only=False)
        last_run = g == g[-1]
        return g[0], g[-1], items[last_run].astype(np.int64)

    metas = ray.get([edge_meta.remote(r) for r in refs])
    # chain: carry into block i = items of its first group from ALL
    # earlier blocks; drop block i's last run iff it continues into i+1
    carries, acc_key, acc_items = [], None, np.empty(0, np.int64)
    for first_g, last_g, last_items in metas:
        carries.append(acc_items if first_g == acc_key else np.empty(0, np.int64))
        if last_g == first_g == acc_key:
            acc_key, acc_items = last_g, np.concatenate([acc_items, last_items])
        else:
            acc_key, acc_items = last_g, last_items
    drop_last = [
        metas[i][1] == metas[i + 1][0] for i in range(len(metas) - 1)
    ] + [False]

    @ray.remote
    def emit_pairs(tbl: pa.Table, carry_items, drop: bool) -> pa.Table:
        g = tbl.column(group_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v = tbl.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
        first_group = g[0]
        if drop:
            keep = g != g[-1]
            g, v = g[keep], v[keep]
        # the carry belongs to first_group; if that whole run was just
        # dropped (single-group block continuing onward), the NEXT block
        # owns both it and the carry — emit nothing for it here
        ncar = len(carry_items)
        if ncar and len(g) and g[0] == first_group:
            g = np.concatenate([np.full(ncar, first_group), g])
            v = np.concatenate([np.asarray(carry_items, np.int64), v])
        if len(g) == 0:
            return pair_schema.empty_table()
        # distinct (group, item): carried items and in-block repeats both
        # collapse under one lexsort (groups already contiguous)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
        g, v = g[keep], v[keep]
        if v.max(initial=0) >= (1 << 32) or v.min(initial=0) < 0:
            raise ValueError("pair packing needs items in [0, 2^32)")
        # vectorized within-group all-pairs (a before b in sorted order):
        # row at in-run position p of a run of length m is the LEFT of
        # (m - 1 - p) pairs; the RIGHTs are the rows just after it.
        new_run = np.concatenate(([True], g[1:] != g[:-1]))
        idx = np.arange(len(g), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        rep = (run_len[run_id] - 1 - (idx - run_start)).astype(np.int64)
        total = int(rep.sum())
        if total == 0:
            return pair_schema.empty_table()
        left_idx = np.repeat(idx, rep)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep
        )
        right_idx = left_idx + 1 + within
        pair = v[left_idx] * _PACK + v[right_idx]
        up, cnt = np.unique(pair, return_counts=True)  # per-block combiner
        return pa.table(
            {"_pair": pa.array(up), "_n": pa.array(cnt.astype(np.int64))}
        )

    pairs = ray.data.from_arrow_refs(
        [
            emit_pairs.remote(r, c, d)
            for r, c, d in zip(refs, carries, drop_last)
        ]
    )
    from .ntile import grouped_sum_sorted

    summed = grouped_sum_sorted(pairs, "_pair", "_n", out_col=n_col)

    def unpack(t: pa.Table) -> pa.Table:
        p = t.column("_pair").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                a_col: pa.array(p // _PACK),
                b_col: pa.array(p % _PACK),
                n_col: t.column(n_col),
            }
        )

    return summed.map_batches(unpack, batch_format="pyarrow")
