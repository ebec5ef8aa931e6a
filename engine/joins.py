"""Temporal joins Ray Data has no native operator for: as-of join and
banded range join over keyed, timestamped tables (the feature-engineering
primitives: "attach the most recent prior signal" / "attach everything
within ±W").

The reference has no joins at all (SURVEY.md §2.2); these are engine
additions (SURVEY.md §2.5).

As-of join design (fully distributed, no per-group Python, no per-key
volume assumption — one key's rows may span any number of blocks):

1. Tag both sides and union them into one unified-schema Dataset
   (side 0 = right/reference stream, side 1 = left/probe stream; the
   other side's payload columns are null).
2. ONE global ``sort([key, on, side, tie])`` — the only shuffle. Right
   rows sort before left rows at equal (key, on), which makes the match
   inclusive (``r.on <= l.on``); ties between right rows are ordered by
   ``tie`` ascending so the LAST one (max tie value) wins
   deterministically.
3. Per-block vectorized forward-fill: for every row, the index of the
   latest right row at-or-before it within its key run (one
   ``np.maximum.accumulate`` over segment-offset-encoded indices).
4. Cross-block carry: a left row at the head of a block whose match lies
   in an earlier block gets it from per-block metadata chained on the
   driver — (first_key, last_key, last right row of the trailing key
   run), one tiny tuple per block, never rows (the same pattern as
   engine/topk.py block-rank offsets).

Range join design: band both sides into width-``window`` buckets of the
``on`` axis; replicate each RIGHT row into its bucket ±1 so every
qualifying pair co-locates in the left row's bucket exactly once (no
dedup pass needed); ``groupby([key, bucket]).map_groups`` emits pairs via
two vectorized searchsorteds. Partitioning assumption: one (key, window)
bucket's rows fit one group — i.e. bounded per-key event rate per window,
the standard banded-join premise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .util import nonempty_block_refs

_SIDE = "__side"
_TIE = "__tie"
_BUCKET = "__bucket"


def _unify(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    on_col: str,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str,
    tie_col: str | None,
) -> tuple[ray.data.Dataset, list[str], list[str], pa.Schema]:
    """Side-tagged union with one unified schema: key, on, side, tie,
    left payload (original names), right payload (suffixed)."""
    lschema = left.schema()
    rschema = right.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lpay = [c for c in left_cols if c not in (key_col, on_col)]
    rpay = [c for c in right_cols if c not in (key_col, on_col)]
    rpay_out = [c + suffix for c in rpay]
    # the output also carries the generated right on-column (on_col+suffix)
    # — include it in the clash set or a left payload named e.g. "ts_us_r"
    # silently produces a duplicate field in out_schema
    clash = set(rpay_out + [on_col + suffix]) & set(lpay + [key_col, on_col])
    if clash:
        raise ValueError(
            f"suffixed right columns collide with left columns: {clash}"
        )
    dunder = [c for c in lpay + rpay + [key_col, on_col] if c.startswith("__")]
    if dunder:
        raise ValueError(
            f"column names starting with '__' are reserved internals: {dunder}"
        )
    for c in (key_col, on_col):
        if ltypes[c] != rtypes[c]:
            raise ValueError(
                f"{c!r} dtype differs between sides: {ltypes[c]} vs {rtypes[c]}"
            )

    def tag_left(t: pa.Table) -> pa.Table:
        n = len(t)
        if t.column(key_col).null_count or t.column(on_col).null_count:
            raise ValueError("asof/range join: null key/on values")
        cols = {
            key_col: t.column(key_col),
            on_col: t.column(on_col),
            _SIDE: pa.array(np.ones(n, dtype=np.int8)),
            _TIE: pa.array(np.zeros(n, dtype=np.int64)),
        }
        for c in lpay:
            cols[c] = t.column(c)
        for c, co in zip(rpay, rpay_out):
            cols[co] = pa.nulls(n, type=rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        if t.column(key_col).null_count or t.column(on_col).null_count:
            raise ValueError("asof/range join: null key/on values")
        if tie_col is not None:
            tie = pc.cast(t.column(tie_col), pa.int64())
        else:
            tie = pa.array(np.zeros(n, dtype=np.int64))
        cols = {
            key_col: t.column(key_col),
            on_col: t.column(on_col),
            _SIDE: pa.array(np.zeros(n, dtype=np.int8)),
            _TIE: tie,
        }
        for c in lpay:
            cols[c] = pa.nulls(n, type=ltypes[c])
        for c, co in zip(rpay, rpay_out):
            cols[co] = t.column(c)
        return pa.table(cols)

    uni = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [
            (key_col, ltypes[key_col]),
            (on_col, ltypes[on_col]),
            (on_col + suffix, rtypes[on_col]),
        ]
        + [(c, ltypes[c]) for c in lpay]
        + [(co, rtypes[c]) for c, co in zip(rpay, rpay_out)]
    )
    return uni, lpay, rpay_out, out_schema


def _ffill_right_idx(key: np.ndarray, side: np.ndarray) -> np.ndarray:
    """Per row: index of the latest side-0 row at-or-before it within its
    contiguous key run, -1 if none. One maximum.accumulate: offsetting by
    segment_id * (n + 2) makes every value of run k dominate every value
    of run k-1, so the running max never leaks across runs."""
    n = len(key)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    new_run = np.concatenate(([True], key[1:] != key[:-1]))
    seg = np.cumsum(new_run) - 1
    big = np.int64(n + 2)
    a = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
    return np.maximum.accumulate(seg * big + a) - seg * big


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    on_col: str,
    left_cols: list[str],
    right_cols: list[str],
    tie_col: str | None = None,
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Inner backward as-of join: each left row is matched to the single
    right row with the same ``key_col`` and the largest ``on_col`` value
    ``<=`` the left row's (ties between right rows broken by largest
    ``tie_col``); unmatched left rows are dropped. Output columns:
    ``key_col``, left ``on_col``, right ``on_col + suffix``, the
    requested left payload columns (original names) and right payload
    columns (suffixed). ``key_col`` must be a numeric/comparable Arrow
    type; ``on_col`` any totally ordered type.
    """
    uni, lpay, rpay_out, out_schema = _unify(
        left, right, key_col, on_col, left_cols, right_cols, suffix, tie_col
    )
    s = uni.sort([key_col, on_col, _SIDE, _TIE]).materialize()

    refs = nonempty_block_refs(s)
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    carry_cols = [on_col] + rpay_out

    @ray.remote
    def block_meta(tbl: pa.Table):
        key = tbl.column(key_col).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        in_last = key == key[-1]
        idxs = np.flatnonzero(in_last & (side == 0))
        row = None
        if len(idxs):
            i = int(idxs[-1])
            row = {c: tbl.column(c)[i].as_py() for c in carry_cols}
        return key[0], key[-1], row

    metas = ray.get([block_meta.remote(r) for r in refs])

    # chain the trailing right row across blocks: a key run may span any
    # number of blocks, some of which contain no right rows of that key
    carries: list[dict | None] = []
    cur_key, cur_row = None, None
    for fk, lk, row in metas:
        carry = cur_row if cur_key is not None and fk == cur_key else None
        carries.append(carry)
        if row is not None:
            cur_key, cur_row = lk, row
        elif lk == fk:
            cur_key, cur_row = lk, carry  # single-key block, run continues
        else:
            cur_key, cur_row = lk, None

    @ray.remote
    def emit(tbl: pa.Table, carry: dict | None) -> pa.Table:
        key = tbl.column(key_col).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        ffill = _ffill_right_idx(key, side)
        li = np.flatnonzero(side == 1)
        match = ffill[li]
        first_run = key[li] == key[0] if len(key) else np.zeros(0, bool)
        lead = (match == -1) & first_run & (carry is not None)
        keep = (match >= 0) | lead
        li, match, lead = li[keep], match[keep], lead[keep]
        lrows = pa.array(li)
        ridx = pa.array(np.where(match >= 0, match, 0))
        lead_pa = pa.array(lead)
        cols = {
            key_col: pc.take(tbl.column(key_col), lrows),
            on_col: pc.take(tbl.column(on_col), lrows),
        }
        for src, out, from_right in (
            [(on_col, on_col + suffix, True)]
            + [(c, c, False) for c in lpay]
            + [(c, c, True) for c in rpay_out]
        ):
            if from_right:
                arr = pc.take(tbl.column(src), ridx)
                if carry is not None:
                    arr = pc.if_else(
                        lead_pa, pa.scalar(carry[src], type=arr.type), arr
                    )
                cols[out] = arr
            else:
                cols[out] = pc.take(tbl.column(src), lrows)
        return pa.table(cols, schema=out_schema)

    out_refs = [emit.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    on_col: str,
    window: int,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
) -> ray.data.Dataset:
    """All (left, right) pairs with equal ``key_col`` and
    ``|left.on - right.on| <= window`` (``on_col`` must be int64 — e.g.
    epoch microseconds). Banded-bucket equi-join: each right row is
    replicated into its ``on // window`` bucket ±1, so every qualifying
    pair meets in the left row's bucket exactly once. Output columns as
    in :func:`asof_join` (left payload unsuffixed, right suffixed)."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    lpay = [c for c in left_cols if c not in (key_col, on_col)]
    rpay = [c for c in right_cols if c not in (key_col, on_col)]
    rpay_out = [c + suffix for c in rpay]
    # on_col+suffix is part of the output schema too — see _unify
    clash = set(rpay_out + [on_col + suffix]) & set(lpay + [key_col, on_col])
    if clash:
        raise ValueError(
            f"suffixed right columns collide with left columns: {clash}"
        )
    dunder = [c for c in lpay + rpay + [key_col, on_col] if c.startswith("__")]
    if dunder:
        raise ValueError(
            f"column names starting with '__' are reserved internals: {dunder}"
        )
    w = np.int64(window)

    rschema = right.schema()
    rtypes = {n: t for n, t in zip(rschema.names, rschema.types)}
    lschema = left.schema()
    ltypes = {n: t for n, t in zip(lschema.names, lschema.types)}
    for c in (key_col, on_col):
        if ltypes[c] != rtypes[c]:
            raise ValueError(
                f"{c!r} dtype differs between sides: {ltypes[c]} vs {rtypes[c]}"
            )

    def tag_left(t: pa.Table) -> pa.Table:
        if t.column(key_col).null_count or t.column(on_col).null_count:
            raise ValueError("asof/range join: null key/on values")
        on = t.column(on_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            key_col: t.column(key_col),
            _BUCKET: pa.array(np.floor_divide(on, w)),
            on_col: t.column(on_col),
            _SIDE: pa.array(np.ones(len(t), dtype=np.int8)),
        }
        for c in lpay:
            cols[c] = t.column(c)
        for c in rpay:
            cols["__r_" + c] = pa.nulls(len(t), type=rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        if t.column(key_col).null_count or t.column(on_col).null_count:
            raise ValueError("asof/range join: null key/on values")
        on = t.column(on_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.floor_divide(on, w)
        rep = np.repeat(np.arange(n), 3)
        bucket = (b[:, None] + np.array([-1, 0, 1], dtype=np.int64)[None, :]).reshape(-1)
        idx = pa.array(rep)
        cols = {
            key_col: pc.take(t.column(key_col), idx),
            _BUCKET: pa.array(bucket),
            on_col: pc.take(t.column(on_col), idx),
            _SIDE: pa.array(np.zeros(3 * n, dtype=np.int8)),
        }
        for c in lpay:
            cols[c] = pa.nulls(3 * n, type=ltypes[c])
        for c in rpay:
            cols["__r_" + c] = pc.take(t.column(c), idx)
        return pa.table(cols)

    uni = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            (key_col, ltypes[key_col]),
            (on_col, ltypes[on_col]),
            (on_col + suffix, rtypes[on_col]),
        ]
        + [(c, ltypes[c]) for c in lpay]
        + [(co, rtypes[c]) for c, co in zip(rpay, rpay_out)]
    )

    def pairs(g: pa.Table) -> pa.Table:
        side = g.column(_SIDE).to_numpy(zero_copy_only=False)
        on = g.column(on_col).to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.flatnonzero(side == 1)
        ri = np.flatnonzero(side == 0)
        if len(li) == 0 or len(ri) == 0:
            return out_schema.empty_table()
        order = np.argsort(on[ri], kind="stable")
        ri = ri[order]
        rt = on[ri]
        lt = on[li]
        lo = np.searchsorted(rt, lt - int(w), side="left")
        hi = np.searchsorted(rt, lt + int(w), side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        lrep = np.repeat(np.arange(len(li)), counts)
        rpos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(lo, counts)
        )
        lrows = pa.array(li[lrep])
        rrows = pa.array(ri[rpos])
        cols = {
            key_col: pc.take(g.column(key_col), lrows),
            on_col: pc.take(g.column(on_col), lrows),
            on_col + suffix: pc.take(g.column(on_col), rrows),
        }
        for c in lpay:
            cols[c] = pc.take(g.column(c), lrows)
        for c, co in zip(rpay, rpay_out):
            cols[co] = pc.take(g.column("__r_" + c), rrows)
        return pa.table(cols, schema=out_schema)

    return uni.groupby([key_col, _BUCKET]).map_groups(
        pairs, batch_format="pyarrow"
    )


def broadcast_join(
    left: ray.data.Dataset,
    right_small: ray.data.Dataset,
    on: str,
    right_cols: list[str],
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Equi-join against a SMALL dimension table without any shuffle: the
    right side is materialized once into the object store (``ray.put``)
    and every map task hash-joins its Arrow batch against it in C++
    (``pyarrow.Table.join``) — the canonical broadcast-join pattern the
    100-TB guidance mandates for small sides (ship the table once, not
    per batch; the big side streams). Right side must fit comfortably in
    a worker's heap (guard: 50M rows).

    ``join_type`` is restricted to the batch-local-correct set: the join
    runs once per LEFT batch, so right-outer/full-outer would emit each
    unmatched right row once per batch instead of once overall."""
    batch_local_safe = {"inner", "left outer", "left semi", "left anti"}
    if join_type not in batch_local_safe:
        raise ValueError(
            f"join_type {join_type!r} is not batch-local-correct for a "
            f"broadcast join (allowed: {sorted(batch_local_safe)})"
        )
    cols = [on] + [c for c in right_cols if c != on]
    batches, total = [], 0
    for b in right_small.select_columns(cols).iter_batches(
        batch_format="pyarrow", batch_size=1 << 20
    ):
        total += b.num_rows
        if total > 50_000_000:
            # bail BEFORE concatenating the rest into driver heap — the
            # guard must fire before the OOM it exists to prevent
            raise ValueError(
                f"broadcast side exceeds 50M rows — use a shuffle join"
            )
        batches.append(b)
    rt = pa.concat_tables(batches)
    ref = ray.put(rt.combine_chunks())

    def f(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        return batch.join(small, keys=on, join_type=join_type)

    return left.map_batches(f, batch_format="pyarrow")


def lag_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "lag",
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Distributed LAG window function: each row gets the previous row's
    ``value_col`` within its ``key_col`` partition ordered by
    ``order_col`` (ties by ``tie_col``); the first row of each key is
    DROPPED (inner-lag semantics — no null sentinel to reconcile across
    engines). One global sort; the cross-block predecessor is the
    previous non-empty block's last row, shipped as one tiny per-block
    tuple via the driver (no accumulation chain needed — the predecessor
    of a block head is always the previous block's tail)."""
    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    if out_col in ds.schema().names:
        raise ValueError(
            f"out_col {out_col!r} already exists in the input schema"
        )
    # normalize block format: a pandas-blocked input (e.g. from_pandas)
    # would otherwise surface pandas blocks from the sort
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(sort_cols).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    vtype = dict(zip(sch.names, sch.types))[value_col]
    out_fields = [(n, t) for n, t in zip(sch.names, sch.types)] + [
        (out_col, vtype)
    ]
    out_schema = pa.schema(out_fields)
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def tail_meta(tbl: pa.Table):
        i = len(tbl) - 1
        return (
            tbl.column(key_col)[i].as_py(),
            tbl.column(value_col)[i].as_py(),
        )

    tails = ray.get([tail_meta.remote(r) for r in refs])
    carries = [None] + tails[:-1]

    @ray.remote
    def emit(tbl: pa.Table, carry) -> pa.Table:
        if tbl.column(key_col).null_count:
            # nulls coerce the int64 key array to float64, where distinct
            # keys > 2^53 compare equal — refuse instead
            raise ValueError("lag_per_key: null partition keys")
        key = tbl.column(key_col).to_numpy(zero_copy_only=False)
        n = len(key)
        same = np.concatenate(([False], key[1:] == key[:-1]))
        prev_idx = np.arange(n, dtype=np.int64) - 1
        head_from_carry = (
            carry is not None and n > 0 and key[0] == carry[0]
        )
        keep = same.copy()
        if head_from_carry:
            keep[0] = True
        lag_vals = pc.take(
            tbl.column(value_col),
            pa.array(np.where(prev_idx >= 0, prev_idx, 0)),
        )
        if head_from_carry:
            first = pa.array([True] + [False] * (n - 1))
            lag_vals = pc.if_else(
                first, pa.scalar(carry[1], type=lag_vals.type), lag_vals
            )
        out = tbl.append_column(out_col, lag_vals)
        return out.filter(pa.array(keep)).cast(out_schema)

    out_refs = [emit.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def lookup_join_sorted(
    facts: ray.data.Dataset,
    dims: ray.data.Dataset,
    on: str,
    dim_on: str | None = None,
) -> ray.data.Dataset:
    """Distributed sorted lookup join (dim ⋈ fact): attach the UNIQUE-keyed
    ``dims`` row to every matching ``facts`` row (inner semantics —
    unmatched fact rows drop).

    Neither side is broadcast and nothing hash-shuffles: both sides take
    ONE range-partitioning sort by the key, then each fact block reads
    only the dim block(s) whose key range overlaps its own (almost always
    1–2 blocks — O(blocks) driver metadata, zero-copy plasma reads, the
    merge-join plan for a dimension table too big for ``broadcast_join``
    and a fact table too big to hash-move). Dim-key uniqueness is
    VALIDATED (within blocks and across the sorted block boundaries), not
    assumed — duplicate keys raise instead of silently multiplying rows.

    Ray's own ``Dataset.join`` covers the general hash path (used by
    ``graph.encode_edges_join``); this operator is the sort-based
    alternative that avoids moving every row through a hash exchange and
    sidesteps its empty-partition crash (CLAUDE.md)."""
    dim_on = dim_on or on
    fschema = facts.schema()
    dschema = dims.schema()
    dpay = [c for c in dschema.names if c != dim_on]
    clash = set(dpay) & set(fschema.names)
    if clash:
        raise ValueError(
            f"dim payload columns collide with fact columns: {clash} — "
            "rename before joining"
        )
    dtypes = dict(zip(dschema.names, dschema.types))
    out_schema = pa.schema(
        list(zip(fschema.names, fschema.types))
        + [(c, dtypes[c]) for c in dpay]
    )

    def _blocks(ds, key):
        arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
        return nonempty_block_refs(arrow.sort(key).materialize())

    def _as_table(blk) -> pa.Table:
        if isinstance(blk, pa.Table):
            return blk
        return pa.Table.from_pandas(blk, preserve_index=False)

    frefs = _blocks(facts, on)
    drefs = _blocks(dims, dim_on)
    if not frefs or not drefs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def key_range(blk, col: str, check_unique: bool):
        tbl = _as_table(blk)
        if tbl.column(col).null_count:
            raise ValueError(f"lookup_join_sorted: null keys in {col!r}")
        k = tbl.column(col).to_numpy(zero_copy_only=False)
        if check_unique and len(np.unique(k)) != len(k):
            raise ValueError(f"duplicate dim keys inside a block ({col})")
        return k[0], k[-1]

    franges = ray.get([key_range.remote(r, on, False) for r in frefs])
    dranges = ray.get([key_range.remote(r, dim_on, True) for r in drefs])
    for (lo1, hi1), (lo2, _hi2) in zip(dranges, dranges[1:]):
        if hi1 >= lo2:  # sorted blocks: equality ⇒ same key in both
            raise ValueError("duplicate dim keys across sorted blocks")
    dmins = np.asarray([r[0] for r in dranges])
    dmaxs = np.asarray([r[1] for r in dranges])

    @ray.remote
    def emit(fact_blk, *dim_blks) -> pa.Table:
        ft = _as_table(fact_blk)
        fk = ft.column(on).to_numpy(zero_copy_only=False)
        if not dim_blks:
            return out_schema.empty_table()
        dts = [_as_table(b) for b in dim_blks]
        dk = np.concatenate(
            [t.column(dim_on).to_numpy(zero_copy_only=False) for t in dts]
        )  # globally sorted: selected blocks are range-consecutive
        pos = np.searchsorted(dk, fk)
        pos_c = np.clip(pos, 0, len(dk) - 1)
        hit = dk[pos_c] == fk
        kept = ft.filter(pa.array(hit))
        take = pa.array(pos_c[hit])
        dim_all = pa.concat_tables(dts)
        for c in dpay:
            kept = kept.append_column(c, pc.take(dim_all.column(c), take))
        return kept.cast(out_schema)

    out_refs = []
    for fref, (flo, fhi) in zip(frefs, franges):
        # dim blocks overlapping [flo, fhi] (both sides sorted)
        i0 = int(np.searchsorted(dmaxs, flo, side="left"))
        i1 = int(np.searchsorted(dmins, fhi, side="right"))
        out_refs.append(emit.remote(fref, *drefs[i0:i1]))
    return ray.data.from_arrow_refs(out_refs)
