"""Sorted-run grouped window operators: grouped NTILE (equi-depth
bucketing per key, the SQL ``NTILE(k) OVER (PARTITION BY key ORDER BY
...)``) and the above-group-mean filter — both built on one sort plus
O(blocks) boundary-run metadata, never a per-group materialization or a
per-key broadcast.

Design (no per-group materialization — a single key may exceed a
machine at 100 TB, so ``groupby().map_groups`` is the wrong shape):

1. global ``sort(key, order...)`` — rows of one key are contiguous,
   possibly spanning blocks.
2. per-block boundary metadata (first_key, first_run_len, last_key,
   last_run_len, n_rows) — tiny tuples, same as ``topk_per_group``.
3. the driver chains the tuples into, per block, the RANK OFFSET of its
   leading run plus the GLOBAL TOTALS of its first and last keys (runs
   interior to a block never need driver help — their rank offset is 0
   and their total is the local run length).
4. per-block vectorized emit: within-key rank = local run position
   (+ leading offset), ntile via the standard SQL rule (first ``n % k``
   buckets get one extra row).

O(blocks) driver metadata regardless of key cardinality or skew.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import nonempty_block_refs


def _ntile_of(rank: np.ndarray, total: np.ndarray, k: int) -> np.ndarray:
    """1-based NTILE bucket for 0-based ``rank`` within a partition of
    ``total`` rows: base size total//k, the first total%k buckets hold
    one extra row (the ANSI / DuckDB rule)."""
    base = total // k
    rem = total % k
    big = rem * (base + 1)  # rows covered by the oversized buckets
    in_big = rank < big
    tile = np.where(
        in_big,
        rank // np.maximum(base + 1, 1),
        rem + (rank - big) // np.maximum(base, 1),
    )
    return (tile + 1).astype(np.int64)


def filter_above_key_mean(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
) -> ray.data.Dataset:
    """Groupwise-comparison filter: keep rows whose integer ``value_col``
    strictly exceeds their key's mean — ``HAVING``-style per-group
    normalization (above-average orders per customer, above-average
    docs per domain) WITHOUT a broadcast or a join: one sort by key,
    per-block exact integer (count, sum) runs, and the same O(blocks)
    boundary-chaining walk as :func:`ntile_per_key` for runs spanning
    blocks. Scale-safe at any key cardinality (a broadcast of per-key
    means is O(keys) driver/heap state; this is O(blocks)).

    The mean is evaluated ``sum / count`` in float64 — mirror the same
    expression in the SQL oracle."""
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(key_col).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    out_schema = pa.schema(list(zip(sch.names, sch.types)))
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def block_meta(tbl: pa.Table):
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        v = tbl.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        run_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        n = len(keys)
        fl = int(run_starts[1]) if len(run_starts) > 1 else n
        ll = n - int(run_starts[-1])
        return (
            keys[0], fl, int(v[:fl].sum()),
            keys[-1], ll, int(v[n - ll :].sum()),
            n,
        )

    metas = ray.get([block_meta.remote(r) for r in refs])
    nblocks = len(metas)
    # (count, sum) totals of each block's first and last key runs
    first_cs = [(0, 0)] * nblocks
    last_cs = [(0, 0)] * nblocks
    open_key, open_c, open_s, open_members = None, 0, 0, []

    def _close():
        nonlocal open_key, open_c, open_s, open_members
        for bi, which in open_members:
            if which == "first":
                first_cs[bi] = (open_c, open_s)
            else:
                last_cs[bi] = (open_c, open_s)
        open_key, open_c, open_s, open_members = None, 0, 0, []

    for i, (fk, fl, fs, lk, ll, ls, n) in enumerate(metas):
        single = fl == n
        if open_key is not None and open_key == fk:
            open_c += fl
            open_s += fs
            open_members.append((i, "first"))
            if single:
                open_members.append((i, "last"))
                continue
            _close()
        else:
            if open_key is not None:
                _close()
            if single:
                open_key, open_c, open_s = fk, n, fs
                open_members = [(i, "first"), (i, "last")]
                continue
            first_cs[i] = (fl, fs)
        open_key, open_c, open_s, open_members = lk, ll, ls, [(i, "last")]
    if open_key is not None:
        _close()

    @ray.remote
    def emit(tbl: pa.Table, f_cs, l_cs) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        v = tbl.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(keys)
        new_run = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [n]]))
        run_sum = np.add.reduceat(v, starts)
        cnt = np.repeat(lens, lens).astype(np.float64)
        sm = np.repeat(run_sum, lens).astype(np.float64)
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        lead = run_start == 0
        trail = run_start == starts[-1]
        cnt = np.where(lead, float(f_cs[0]), cnt)
        sm = np.where(lead, float(f_cs[1]), sm)
        cnt = np.where(trail, float(l_cs[0]), cnt)
        sm = np.where(trail, float(l_cs[1]), sm)
        keep = v > sm / cnt  # float64, the oracle's operation order
        return tbl.filter(pa.array(keep)).cast(out_schema)

    out_refs = [
        emit.remote(r, fc, lc) for r, fc, lc in zip(refs, first_cs, last_cs)
    ]
    return ray.data.from_arrow_refs(out_refs)


def grouped_sum_sorted(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "sum",
) -> ray.data.Dataset:
    """Sort-based grouped integer SUM — one (key, sum) row per key, the
    aggregation shape Ray 2.49's hash ``groupby().aggregate`` handles
    ~100× slower than its sort at volume (CLAUDE.md). One sort by key,
    per-block run reduceat, and the boundary walk: a run spanning blocks
    is emitted ONCE by the block where it starts, with its full total
    chained through O(blocks) driver metadata."""
    return grouped_sums_sorted(ds, key_col, [val_col], [out_col])


_REDUCE_UFUNC = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def grouped_sums_sorted(
    ds: ray.data.Dataset,
    key_col: str,
    val_cols: list,
    out_cols: list,
    op: str | list = "sum",
) -> ray.data.Dataset:
    """Multi-column :func:`grouped_sum_sorted`: one sort amortized over
    any number of integer reduce columns (e.g. sum + count for an exact
    grouped AVG, or min + sum for dedup's survivor-id + dup-count).
    ``op`` picks the associative integer reduction per column —
    ``"sum"`` (default), ``"min"`` or ``"max"`` (grouped first-seen /
    extent without a hash aggregate), either one string for all columns
    or a list aligned with ``val_cols``. Same O(blocks) boundary-chain;
    the per-block metadata carries one vector of partial reductions per
    boundary run."""
    if len(val_cols) != len(out_cols) or not val_cols:
        raise ValueError("val_cols and out_cols must align and be non-empty")
    ops = [op] * len(val_cols) if isinstance(op, str) else list(op)
    if len(ops) != len(val_cols) or any(o not in _REDUCE_UFUNC for o in ops):
        raise ValueError(
            f"op must be (a list of) {sorted(_REDUCE_UFUNC)}, one per val col"
        )
    ufuncs = [_REDUCE_UFUNC[o] for o in ops]
    nv = len(val_cols)
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(key_col).materialize()
    refs = nonempty_block_refs(s)
    # key type from the MATERIALIZED arrow dataset: the input's schema
    # may carry pandas/Python types (from_pandas blocks), not Arrow ones
    sch = s.schema() if s.schema() is not None else ds.schema()
    ktype = dict(zip(sch.names, sch.types))[key_col]
    if not isinstance(ktype, pa.DataType):  # empty pandas-block input
        ktype = pa.string() if ktype in (str, object) else pa.int64()
    out_schema = pa.schema(
        [(key_col, ktype)] + [(c, pa.int64()) for c in out_cols]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def block_meta(tbl: pa.Table):
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        vs = [
            tbl.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in val_cols
        ]
        run_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        n = len(keys)
        fl = int(run_starts[1]) if len(run_starts) > 1 else n
        ll = n - int(run_starts[-1])
        fs = tuple(int(u.reduce(v[:fl])) for u, v in zip(ufuncs, vs))
        ls = tuple(int(u.reduce(v[n - ll :])) for u, v in zip(ufuncs, vs))
        return keys[0], fs, keys[-1], ls, fl == n

    metas = ray.get([block_meta.remote(r) for r in refs])
    nblocks = len(metas)
    first_continued = [False] * nblocks  # leading run started earlier?
    zero = (0,) * nv
    last_total = [zero] * nblocks  # full totals of the trailing run
    open_key, open_s, open_members = None, zero, []

    def _add(a, b):
        return tuple(int(u(x, y)) for u, x, y in zip(ufuncs, a, b))

    def _close():
        nonlocal open_key, open_s, open_members
        for bi in open_members:
            last_total[bi] = open_s
        open_key, open_s, open_members = None, zero, []

    for i, (fk, fs, lk, ls, single) in enumerate(metas):
        if open_key is not None and open_key == fk:
            first_continued[i] = True
            open_s = _add(open_s, fs)
            if single:
                continue
            _close()
        elif open_key is not None:
            _close()
        if single:
            if open_key is None:
                open_key, open_s, open_members = fk, fs, [i]
            continue
        # trailing run starts here; may continue into later blocks
        open_key, open_s, open_members = lk, ls, [i]
    if open_key is not None:
        _close()

    @ray.remote
    def emit(tbl: pa.Table, f_cont: bool, l_tot: tuple, single: bool) -> pa.Table:
        keys = tbl.column(key_col)
        kn = keys.to_numpy(zero_copy_only=False)
        vs = [
            tbl.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in val_cols
        ]
        starts = np.flatnonzero(
            np.concatenate(([True], kn[1:] != kn[:-1]))
        )
        if single:
            if f_cont:  # an earlier block owns this run
                return out_schema.empty_table()
            return pa.table(
                {key_col: keys.take(pa.array([0]))}
                | {c: pa.array([t]) for c, t in zip(out_cols, l_tot)}
            ).cast(out_schema)
        cols = {}
        lo = 1 if f_cont else 0
        for j, (c, v) in enumerate(zip(out_cols, vs)):
            sums = ufuncs[j].reduceat(v, starts)
            sums[-1] = l_tot[j]  # trailing run: full chained total
            cols[c] = pa.array(sums[lo:])
        return pa.table(
            {key_col: keys.take(pa.array(starts[lo:]))} | cols
        ).cast(out_schema)

    out_refs = [
        emit.remote(r, fc, lt, m[4])
        for r, fc, lt, m in zip(refs, first_continued, last_total, metas)
    ]
    return ray.data.from_arrow_refs(out_refs)


def ntile_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list,
    k: int = 4,
    out_col: str = "ntile",
) -> ray.data.Dataset:
    """Append a 1..k equi-depth bucket per row within its ``key_col``
    partition ordered by ``order_cols`` (which must fully order rows
    within a key for a deterministic result)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if out_col in ds.schema().names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort([key_col] + list(order_cols)).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def block_meta(tbl: pa.Table):
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        run_starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        n = len(keys)
        first_len = int(run_starts[1]) if len(run_starts) > 1 else n
        last_len = n - int(run_starts[-1])
        return keys[0], first_len, keys[-1], last_len, n

    metas = ray.get([block_meta.remote(r) for r in refs])

    # Driver walk: chain boundary runs across blocks. For every block we
    # produce (first_offset, first_total, last_total); runs that both
    # start and end inside one block are resolved locally in emit.
    nblocks = len(metas)
    first_offset = [0] * nblocks
    first_total = [0] * nblocks
    last_total = [0] * nblocks
    open_key, open_count, open_members = None, 0, []

    def _close():
        nonlocal open_key, open_count, open_members
        for bi, which in open_members:
            if which == "first":
                first_total[bi] = open_count
            else:
                last_total[bi] = open_count
        open_key, open_count, open_members = None, 0, []

    for i, (fk, fl, lk, ll, n) in enumerate(metas):
        single = fl == n  # whole block is one key (then fk == lk)
        if open_key is not None and open_key == fk:
            first_offset[i] = open_count
            open_count += fl
            open_members.append((i, "first"))
            if single:
                open_members.append((i, "last"))
                continue
            _close()
        else:
            if open_key is not None:
                _close()
            if single:
                open_key, open_count = fk, n
                open_members = [(i, "first"), (i, "last")]
                continue
            first_total[i] = fl  # leading run confined to this block
        # trailing run may continue into the next block
        open_key, open_count, open_members = lk, ll, [(i, "last")]
    if open_key is not None:
        _close()

    @ray.remote
    def emit(tbl: pa.Table, f_off: int, f_tot: int, l_tot: int) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        n = len(keys)
        new_run = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(n, dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        rank = idx - run_start
        # run length per row (local), then boundary overrides
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [n]]))
        total = np.repeat(lens, lens).astype(np.int64)
        lead = run_start == 0
        trail = run_start == starts[-1]
        rank = rank + np.where(lead, f_off, 0)
        total = np.where(lead, f_tot, total)
        total = np.where(trail, l_tot, total)
        out = tbl.append_column(out_col, pa.array(_ntile_of(rank, total, k)))
        return out.cast(out_schema)

    out_refs = [
        emit.remote(r, int(fo), int(ft), int(lt))
        for r, fo, ft, lt in zip(refs, first_offset, first_total, last_total)
    ]
    return ray.data.from_arrow_refs(out_refs)


def grouped_pdisc(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple = (0.5,),
) -> dict:
    """Per-key exact ``percentile_disc`` over an integer column — the
    generic core of textstats' grouped token percentiles: one global
    sort by (key, val), then the driver reads only per-block RUN-LENGTH
    summaries of the key column (O(blocks × keys-per-block) tiny rows,
    never data) and issues one single-row remote pick per (key,
    quantile). No per-group shuffle or materialization; any key
    cardinality or skew costs the same driver state. NULL values are the
    caller's concern (filter first — SQL percentile_disc ignores them).
    Returns ``{key: {q: value}}`` — a driver-side dict sized O(keys),
    meant for ``ray.put`` broadcast into a following filter/apply."""
    s = (
        ds.map_batches(lambda t: t, batch_format="pyarrow")
        .sort([key_col, val_col])
        .materialize()
    )
    refs = nonempty_block_refs(s)
    if not refs:
        return {}

    @ray.remote
    def block_key_runs(tbl: pa.Table):
        arr = np.asarray(tbl.column(key_col).to_pylist(), dtype=object)
        new = np.ones(len(arr), dtype=bool)
        new[1:] = arr[1:] != arr[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(arr))).astype(np.int64)
        return arr[starts].tolist(), counts.tolist()

    runs = ray.get([block_key_runs.remote(r) for r in refs])
    spans: dict = {}  # key -> [(block idx, start row, count)]
    for bi, (vals, counts) in enumerate(runs):
        row = 0
        for v, c in zip(vals, counts):
            spans.setdefault(v, []).append((bi, row, c))
            row += c

    @ray.remote
    def pick(tbl: pa.Table, row: int) -> int:
        return int(tbl.column(val_col)[row].as_py())

    pending = {}
    for kval, sp in spans.items():
        cum = np.cumsum([0] + [c for _, _, c in sp])
        total = int(cum[-1])
        for q in qs:
            idx = max(0, int(np.ceil(q * total)) - 1)
            j = int(np.searchsorted(cum, idx, side="right")) - 1
            bi, start, _ = sp[j]
            pending[(kval, q)] = pick.remote(refs[bi], start + idx - int(cum[j]))
    resolved = dict(zip(pending.keys(), ray.get(list(pending.values()))))
    out: dict = {}
    for (kval, q), v in resolved.items():
        out.setdefault(kval, {})[q] = v
    return out


def percent_rank_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "pr",
    round_to: int = 9,
    max_pairs: int = 5_000_000,
) -> ray.data.Dataset:
    """Per-key PERCENT_RANK — quantile normalization within each key
    (the window SQL ``PERCENT_RANK() OVER (PARTITION BY key ORDER BY
    val)``): pr = (rank − 1) / (n_key − 1) with min-rank ties, 0.0 for a
    single-row key.

    Scale design: the INPUT never shuffles. Per-batch (key, val) count
    partials settle through the sorted grouped SUM into the distinct
    (key, val) frequency table — bounded by value cardinality per key,
    not rows (the vocab-broadcast tier: guarded at ``max_pairs``; beyond
    that discretize ``val`` first). Ranks and key totals come from one
    numpy pass over that table; the (pair → pr) map ships once via
    ray.put and every batch resolves through a vectorized searchsorted.
    ``val_col`` must be integer-valued.
    """
    sep = "\x1f"

    def pair_partial(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and v.min() < 0:
            raise ValueError("negative values break the zero-padded order")
        pair = np.char.add(
            np.char.add(k, sep), np.char.zfill(v.astype("U19"), 19)
        )
        u, c = np.unique(pair, return_counts=True)
        return pa.table(
            {"pair": pa.array(u.tolist(), pa.string()),
             "cnt": pa.array(c.astype(np.int64))}
        )

    counts = grouped_sums_sorted(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        "pair", ["cnt"], ["cnt"],
    )
    tbl = counts.sort("pair").to_pandas()
    if len(tbl) > max_pairs:
        raise ValueError(
            f"distinct (key, val) pairs exceed the broadcast tier "
            f"({len(tbl)} > {max_pairs}) — discretize {val_col!r} first"
        )
    pairs = tbl["pair"].to_numpy()
    cnt = tbl["cnt"].to_numpy().astype(np.int64)
    keys = np.asarray([p.split(sep, 1)[0] for p in pairs], dtype=object)
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    grp = np.cumsum(new_key) - 1  # dense key index per pair row
    totals = np.bincount(grp, weights=cnt).astype(np.int64)
    cum = np.cumsum(cnt) - cnt  # rows before this (key,val) pair overall
    key_start = cum[new_key][grp]  # rows before this pair's KEY
    rank_minus_1 = cum - key_start  # min-rank ties: smaller values only
    denom = np.maximum(totals[grp] - 1, 1)  # n=1 → pr 0 via rank 0
    pr = np.round(rank_minus_1 / denom, round_to)
    pairs_ref = ray.put(pairs.astype(str))
    pr_ref = ray.put(pr)

    def attach(t: pa.Table) -> pa.Table:
        sp = ray.get(pairs_ref)
        spr = ray.get(pr_ref)
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pair = np.char.add(
            np.char.add(k, sep), np.char.zfill(v.astype("U19"), 19)
        )
        idx = np.searchsorted(sp, pair)
        return t.append_column(out_col, pa.array(spr[idx]))

    return ds.map_batches(attach, batch_format="pyarrow")
