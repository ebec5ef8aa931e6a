"""Stream-shaped operators over the ordered ``events`` table.

Ray Data is a batch engine (no watermarks); the events log is treated as a
partitioned, timestamp-ordered table (guide pattern): tumbling windows are
a vectorized computed-column groupby; session windows sort each key's
events by time inside ``map_groups`` and split on inactivity gaps. The
ordering assumption: events for one key fit one group (hash-partitioned by
key), which holds for any keyed stream with bounded per-key volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .util import nonempty_block_refs
from ray.data.aggregate import Count, Sum


def tumbling_window(
    events: ray.data.Dataset,
    window_sec: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (key, tumbling window): event count and value sum.

    Window id = floor(epoch_seconds / window_sec) — one vectorized Arrow
    expression, then a hash groupby. Result: (user_id, window_start
    epoch-seconds, n_events, sum_value_cents). The value sum is kept as an
    integer-cents sum (round(value*100) per event) so the aggregate is
    exact and comparable across engines — float sums differ in final ulps
    between arrow/duckdb and no post-hoc rounding reconciles them."""

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        epoch = pc.divide(pc.cast(ts, pa.int64()), 1_000_000)  # us → s
        win = pc.multiply(
            pc.floor(pc.divide(pc.cast(epoch, pa.float64()), window_sec)),
            float(window_sec),
        )
        # round_mode matches duckdb ROUND (half away from zero — arrow calls
        # it half_towards_infinity); arrow's default half-to-even would
        # diverge on exact .5-cent values
        cents = pc.cast(
            pc.round(
                pc.multiply(batch.column(value_col), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                key_col: batch.column(key_col),
                "window_start": pc.cast(win, pa.int64()),
                "value_cents": cents,
            }
        )

    wds = events.map_batches(add_window, batch_format="pyarrow")
    return wds.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents")
    )


def hopping_window(
    events: ray.data.Dataset,
    window_sec: int = 3600,
    hop_sec: int = 900,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (key, hopping/sliding window): event count and value-cents sum.

    Each event belongs to ``window_sec / hop_sec`` overlapping windows; the
    expansion is one vectorized repeat (rows × k), then the same hash
    groupby as the tumbling case. ``window_sec`` must be a multiple of
    ``hop_sec``."""
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    k = window_sec // hop_sec

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        epoch = (
            pc.divide(pc.cast(ts, pa.int64()), 1_000_000)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        last = (epoch // hop_sec) * hop_sec
        starts = (
            last[:, None] - hop_sec * np.arange(k, dtype=np.int64)[None, :]
        ).reshape(-1)
        cents = pc.cast(
            pc.round(
                pc.multiply(batch.column(value_col), 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(len(epoch)), k)
        keys = batch.column(key_col).take(pa.array(rep))
        return pa.table(
            {
                key_col: keys,
                "window_start": pa.array(starts),
                "value_cents": pa.array(cents[rep]),
            }
        )

    wds = events.map_batches(expand, batch_format="pyarrow")
    return wds.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_value_cents")
    )


def session_windows(
    events: ray.data.Dataset,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Sessionization: per key, sort by ts and split where the gap to the
    previous event exceeds ``gap_sec``. Result: (user_id, session_start
    epoch-seconds, n_events, duration_sec)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        sec = g[ts_col].astype("int64") // 1_000_000
        new_session = (sec.diff().fillna(np.inf) > gap_sec).cumsum()
        out = (
            pd.DataFrame({key_col: g[key_col], "sec": sec, "sid": new_session})
            .groupby("sid")
            .agg(
                **{
                    key_col: (key_col, "first"),
                    "session_start": ("sec", "min"),
                    "n_events": ("sec", "size"),
                    "_end": ("sec", "max"),
                }
            )
        )
        out["duration_sec"] = out["_end"] - out["session_start"]
        return out[[key_col, "session_start", "n_events", "duration_sec"]]

    return events.groupby(key_col).map_groups(sessions, batch_format="pandas")


def funnel(
    events: ray.data.Dataset,
    steps: tuple,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_sec: int | None = None,
) -> ray.data.Dataset:
    """Ordered-sequence funnel: per key, how many of ``steps`` were
    completed IN ORDER with strictly increasing timestamps, matching
    earliest-first (the standard greedy funnel semantics: stage k's
    timestamp is the MIN ts of a step-k event strictly after stage
    k-1's — and, when ``within_sec`` is set, no more than that many
    seconds after it; the anchor stays the earliest qualifying event,
    deterministic by construction). Output: (key, funnel_stage) for
    keys that completed at least stage 1.

    Greedy-earliest is exactly the chained-MIN SQL formulation, so the
    oracle is a cascade of ``MIN(ts) ... WHERE ts > prev [AND ts <=
    prev + INTERVAL]`` joins. One
    shuffle of the (key, ts, type) projection groups each key's events;
    per-group work is a vectorized argmin per step over an
    already-sorted frame. Like sessionization, per-key event counts are
    assumed to fit a group (true for user-event data; a key whose
    events don't fit one machine needs pre-aggregation upstream)."""
    if not steps:
        raise ValueError("steps must be non-empty")

    def stage_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].to_numpy()
        types = g[type_col].to_numpy()
        stage = 0
        t = None
        win = (
            np.timedelta64(int(within_sec), "s") if within_sec is not None else None
        )
        for step in steps:
            m = types == step
            if t is not None:
                m &= ts > t
                if win is not None:
                    m &= ts <= t + win
            idx = np.flatnonzero(m)
            if idx.size == 0:
                break
            t = ts[idx[0]]  # earliest qualifying event (frame is sorted)
            stage += 1
        if stage == 0:
            return pd.DataFrame({key_col: [], "funnel_stage": []}).astype(
                {key_col: g[key_col].dtype, "funnel_stage": np.int64}
            )
        return pd.DataFrame(
            {key_col: [g[key_col].iloc[0]], "funnel_stage": [np.int64(stage)]}
        )

    proj = events.select_columns([key_col, ts_col, type_col])
    return proj.groupby(key_col).map_groups(stage_of, batch_format="pandas")


def running_total(
    ds: ray.data.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "running",
    exclusive: bool = True,
) -> ray.data.Dataset:
    """Distributed cumulative sum over a global ordering (the window
    ``SUM(v) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)``).

    One global sort; each block computes its LOCAL vectorized cumsum and
    a one-number total; the driver turns the O(blocks) totals into
    exclusive prefix offsets and each block adds its offset — the same
    tiny-metadata chaining as the LAG / set-ops operators, no
    sequential scan, no O(rows) driver traffic. ``exclusive=True``
    yields the sum of STRICTLY earlier rows (the packing/prefix form);
    ``order_col`` must be unique for a deterministic order (sums are
    integer-exact under any block split for int inputs)."""
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(order_col).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    out_fields = list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    out_schema = pa.schema(out_fields)
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    def _as_table(blk) -> pa.Table:
        # Ray's sort can surface the original block unchanged on
        # degenerate plans (e.g. single-block inputs), so a pandas-blocked
        # source may still reach us as a DataFrame despite the arrow
        # normalization stage
        if isinstance(blk, pa.Table):
            return blk
        return pa.Table.from_pandas(blk, preserve_index=False)

    def _values(tbl: pa.Table) -> np.ndarray:
        # NULL values contribute 0, matching SQL's window SUM (which
        # skips NULLs); without the fill, to_numpy surfaces NaN floats
        # and the int cast/sum below raises or produces garbage
        col = tbl.column(value_col)
        if col.null_count:
            col = pc.fill_null(col, 0)
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    @ray.remote
    def block_total(blk) -> int:
        return int(np.sum(_values(_as_table(blk))))

    totals = ray.get([block_total.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(totals[:-1]))).astype(np.int64)

    @ray.remote
    def emit(blk, offset: int) -> pa.Table:
        tbl = _as_table(blk)
        v = _values(tbl)
        cum = np.cumsum(v) + offset
        if exclusive:
            cum = cum - v
        return tbl.append_column(out_col, pa.array(cum)).cast(out_schema)

    out_refs = [emit.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def rolling_sum_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    window: int = 5,
    out_col: str = "rolling_sum",
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Distributed rolling-window aggregate: for each row, the sum of
    ``value_col`` over the current row and the ``window - 1`` preceding
    rows of the SAME key, ordered by (``order_col``, ``tie_col``) — the
    window SQL ``SUM(v) OVER (PARTITION BY key ORDER BY o ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW)``.

    Same house pattern as :func:`running_total` / ``lag_per_key``: one
    global sort by (key, order), then per-block vectorized cumsum-diff;
    the only cross-block state is each block's last ``window - 1``
    (key, value) rows, shipped to the driver as tiny tuples and chained
    so a block whose head run starts in ANY earlier block (including
    runs spanning several tiny blocks) still sees its full lookback.
    O(blocks × window) driver metadata, never rows. ``value_col`` must
    be integer (exact under any block split)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    if out_col in ds.schema().names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(sort_cols).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())
    lookback = window - 1

    @ray.remote
    def tail_rows(tbl: pa.Table):
        """Last min(n, window-1) (key, value) pairs — tiny by construction."""
        t = tbl.slice(max(0, len(tbl) - lookback))
        return (
            t.column(key_col).to_numpy(zero_copy_only=False),
            t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64),
        )

    if lookback:
        tails = ray.get([tail_rows.remote(r) for r in refs])
        # carry for block i = last (window-1) rows of ALL earlier blocks;
        # concatenating the per-block tails is exact because a block
        # shorter than the lookback contributes its whole content
        carries = []
        for i in range(len(refs)):
            if i == 0:
                carries.append((np.zeros(0, np.int64), np.zeros(0, np.int64)))
                continue
            ks = np.concatenate([tails[j][0] for j in range(i)])
            vs = np.concatenate([tails[j][1] for j in range(i)])
            carries.append((ks[-lookback:], vs[-lookback:]))
    else:
        carries = [(np.zeros(0, np.int64), np.zeros(0, np.int64))] * len(refs)

    @ray.remote
    def emit(tbl: pa.Table, carry_keys, carry_vals) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        col = tbl.column(value_col)
        if col.null_count:
            col = pc.fill_null(col, 0)
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        ncar = len(carry_keys)
        k = np.concatenate([np.asarray(carry_keys), keys])
        v = np.concatenate([np.asarray(carry_vals, np.int64), vals])
        # position of each row within its contiguous same-key run
        new_run = np.concatenate(([True], k[1:] != k[:-1]))
        idx = np.arange(len(k), dtype=np.int64)
        run_rank = idx - np.maximum.accumulate(np.where(new_run, idx, 0))
        cs = np.cumsum(v)
        start = idx - np.minimum(run_rank, lookback)
        roll = cs - np.where(start > 0, cs[start - 1], 0)
        out = tbl.append_column(out_col, pa.array(roll[ncar:]))
        return out.cast(out_schema)

    out_refs = [
        emit.remote(r, ck, cv) for r, (ck, cv) in zip(refs, carries)
    ]
    return ray.data.from_arrow_refs(out_refs)


def cumsum_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "running_sum",
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Distributed per-key UNBOUNDED running total — the window SQL
    ``SUM(v) OVER (PARTITION BY key ORDER BY o ROWS UNBOUNDED PRECEDING)``.

    Same one-sort house pattern as :func:`rolling_sum_per_key`, but the
    cross-block state is a single scalar per block boundary instead of a
    row tail: after sorting by (key, order), only the key straddling each
    block edge can carry mass forward, so block ``i``'s carry is the
    accumulated total of its FIRST key over all earlier blocks — an
    O(blocks) driver-side chain of (first_key, last_key, last_key_sum)
    triples, never rows. ``value_col`` must be integer (exact under any
    block split)."""
    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    if out_col in ds.schema().names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(sort_cols).materialize()
    refs = nonempty_block_refs(s)
    sch = ds.schema()
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def edge_meta(tbl: pa.Table):
        """(first_key, last_key, sum of values over the last key's run)."""
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        col = tbl.column(value_col)
        if col.null_count:
            col = pc.fill_null(col, 0)
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        last_run = keys == keys[-1]
        return keys[0], keys[-1], int(vals[last_run].sum())

    metas = ray.get([edge_meta.remote(r) for r in refs])
    carries = []
    acc_key, acc_sum = None, 0  # running total of the key open at the edge
    for first_k, last_k, last_sum in metas:
        carries.append(acc_sum if first_k == acc_key else 0)
        if last_k == first_k == acc_key:
            acc_key, acc_sum = last_k, acc_sum + last_sum
        else:
            acc_key, acc_sum = last_k, last_sum

    @ray.remote
    def emit(tbl: pa.Table, carry: int) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        col = tbl.column(value_col)
        if col.null_count:
            col = pc.fill_null(col, 0)
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        new_run = np.concatenate(([True], keys[1:] != keys[:-1]))
        idx = np.arange(len(keys), dtype=np.int64)
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        cs = np.cumsum(vals)
        run_cum = cs - np.where(run_start > 0, cs[run_start - 1], 0)
        if carry:
            run_cum = run_cum + np.where(keys == keys[0], carry, 0)
        out = tbl.append_column(out_col, pa.array(run_cum))
        return out.cast(out_schema)

    out_refs = [emit.remote(r, c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


def ordered_concat_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_cols: list,
    value_col: str,
    sep: str = ">",
    out_col: str = "seq",
    count_col: str = "n",
) -> ray.data.Dataset:
    """Grouped ORDERED string aggregation — the SQL
    ``string_agg(v, sep ORDER BY o) GROUP BY key`` over the full group
    (contrast ``user_event_seq``'s bounded top-5): per-block partial
    concats (one row per key per block, values joined in sorted order)
    are the combiner, then a ``groupby(key).map_groups`` stitch over the
    O(keys × blocks-per-key) partials ordered by block index. The hash
    shuffle moves only the combined partials — the per-key output is the
    same size as the final answer, which any grouped concat must ship
    somewhere — and the stitch is per-group work, embarrassingly
    parallel across keys."""
    sort_cols = [key_col] + list(order_cols)
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(sort_cols).materialize()
    refs = nonempty_block_refs(s)
    ktype = dict(zip(ds.schema().names, ds.schema().types))[key_col]
    out_schema = pa.schema(
        [(key_col, ktype), (out_col, pa.string()), (count_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def partials(tbl: pa.Table, blk: int) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        vals = tbl.column(value_col).to_pylist()
        new_run = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(new_run)
        ends = np.concatenate((starts[1:], [len(keys)]))
        return pa.table(
            {
                key_col: pa.array(keys[starts], type=ktype),
                "_part": pa.array(
                    [sep.join(vals[s0:e0]) for s0, e0 in zip(starts, ends)]
                ),
                "_n": pa.array((ends - starts).astype(np.int64)),
                "_blk": pa.array(np.full(len(starts), blk, np.int64)),
            }
        )

    parts = ray.data.from_arrow_refs(
        [partials.remote(r, i) for i, r in enumerate(refs)]
    )

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_blk")
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                out_col: [sep.join(g["_part"])],
                count_col: [int(g["_n"].sum())],
            }
        )

    return parts.groupby(key_col).map_groups(stitch, batch_format="pandas")


def _sorted_rank_blocks(ds: ray.data.Dataset, order_cols: list):
    """One global sort + O(blocks) row-count metadata: returns
    (block refs, per-block global rank offsets, total rows, schema) —
    the shared machinery of the global rank-family windows. Schema is
    ``None`` for an empty input (Ray 2.49 gives empty datasets no
    schema at all)."""
    from .util import nonempty_block_refs

    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(list(order_cols)).materialize()
    sch = s.schema()
    if sch is None:
        return [], np.empty(0, np.int64), 0, None
    refs, counts = nonempty_block_refs(s, return_counts=True)
    total = int(sum(counts))
    offsets = (
        np.concatenate(([0], np.cumsum(counts[:-1]))).astype(np.int64)
        if counts
        else np.empty(0, np.int64)
    )
    return refs, offsets, total, sch


def _as_table(blk) -> pa.Table:
    return (
        blk
        if isinstance(blk, pa.Table)
        else pa.Table.from_pandas(blk, preserve_index=False)
    )


def global_percent_rank(
    ds: ray.data.Dataset,
    order_cols: list,
    out_col: str = "pr",
    decimals: int = 9,
) -> ray.data.Dataset:
    """Global PERCENT_RANK (CDF / quantile-normalization transform):
    rank / (n - 1) over the total order given by ``order_cols``, which
    MUST be unique in combination (include an id column) so rank ==
    row_number and the SQL window agrees. One sort; positions come from
    O(blocks) row-count metadata (the epoch-shuffle house pattern); a
    single-row dataset gets 0.0 (the SQL convention)."""
    refs, offsets, total, sch = _sorted_rank_blocks(ds, order_cols)
    if sch is None:
        return ray.data.from_arrow(
            pa.table({out_col: pa.array([], pa.float64())})
        )
    if out_col in sch.names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.float64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def emit(blk, offset: int) -> pa.Table:
        tbl = _as_table(blk)
        pos = offset + np.arange(len(tbl), dtype=np.int64)
        pr = (
            pos / (total - 1)
            if total > 1
            else np.zeros(len(tbl), np.float64)
        )
        return tbl.append_column(out_col, pa.array(np.round(pr, decimals))).cast(
            out_schema
        )

    out_refs = [emit.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def global_ntile(
    ds: ray.data.Dataset,
    order_cols: list,
    k: int,
    out_col: str = "bucket",
) -> ray.data.Dataset:
    """Global equi-depth bucketing — ``NTILE(k) OVER (ORDER BY
    order_cols)`` with the ANSI rule (first ``n % k`` buckets hold one
    extra row). ``order_cols`` must be unique in combination for a
    deterministic result. Same one-sort + O(blocks) offset machinery as
    :func:`global_percent_rank`; the bucket rule itself is the shared
    vectorized :func:`engine.ntile._ntile_of`."""
    from .ntile import _ntile_of

    if k < 1:
        raise ValueError("global_ntile: k must be >= 1")
    refs, offsets, total, sch = _sorted_rank_blocks(ds, order_cols)
    if sch is None:
        return ray.data.from_arrow(
            pa.table({out_col: pa.array([], pa.int64())})
        )
    if out_col in sch.names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def emit(blk, offset: int) -> pa.Table:
        tbl = _as_table(blk)
        pos = offset + np.arange(len(tbl), dtype=np.int64)
        buckets = _ntile_of(pos, np.full(len(tbl), total, np.int64), k)
        return tbl.append_column(out_col, pa.array(buckets)).cast(out_schema)

    out_refs = [emit.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def pack_sequences(
    docs_with_tokens: ray.data.Dataset,
    chunk_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> ray.data.Dataset:
    """Token-budget sequence packing (training-data curriculum step):
    documents are concatenated in ``id_col`` order and split into
    fixed-size ``chunk_tokens`` windows; each document reports the tokens
    before it and the chunk its first token lands in. Built on
    :func:`running_total` — deterministic, repartition-stable, exact."""
    rt = running_total(
        docs_with_tokens, order_col=id_col, value_col=tokens_col,
        out_col="tokens_before", exclusive=True,
    )

    def chunk(t: pa.Table) -> pa.Table:
        before = t.column("tokens_before").to_numpy(zero_copy_only=False)
        return t.append_column(
            "chunk_id", pa.array((before // chunk_tokens).astype(np.int64))
        )

    return rt.map_batches(chunk, batch_format="pyarrow")


def transition_counts(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    label_col: str,
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Per-key adjacent-label transition counts — the Markov-bigram
    feature over behavioral sequences (the window SQL
    ``LAG(label) OVER (PARTITION BY key ORDER BY o)`` folded into a
    GROUP BY (prev, next) count).

    House one-sort pattern: after the global sort by (key, order[, tie])
    every transition is a pair of ADJACENT rows, so each block counts its
    own pairs vectorized (label[:-1] → label[1:] where the key matches)
    and the only cross-block state is one (last_key, last_label) /
    (first_key, first_label) pair per block edge — O(blocks) driver
    metadata, never rows. Pairs ride as a single separator-joined string
    key through the sorted grouped SUM (no hash aggregate).

    Returns (prev, next, n) — one row per observed transition.
    """
    from .ntile import grouped_sums_sorted

    sep = "\x1f"
    sort_cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort(sort_cols).materialize()
    refs = nonempty_block_refs(s)
    out_schema = pa.schema(
        [("prev", pa.string()), ("next", pa.string()), ("n", pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote(num_returns=2)
    def block_pairs(tbl: pa.Table):
        """(partial (pair, cnt) table, (first_key, first_label,
        last_key, last_label) edge metadata)."""
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        labels = tbl.column(label_col).to_numpy(zero_copy_only=False)
        meta = (keys[0], str(labels[0]), keys[-1], str(labels[-1]))
        same = keys[:-1] == keys[1:]
        if not same.any():
            return pa.table(
                {"pair": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            ), meta
        prev = labels[:-1][same]
        nxt = labels[1:][same]
        pairs = np.char.add(
            np.char.add(prev.astype(str), sep), nxt.astype(str)
        )
        u, c = np.unique(pairs, return_counts=True)
        return pa.table(
            {"pair": pa.array(u.tolist(), pa.string()),
             "cnt": pa.array(c.astype(np.int64))}
        ), meta

    parts = [block_pairs.remote(r) for r in refs]
    metas = ray.get([m for _, m in parts])
    boundary = [
        f"{metas[i][3]}{sep}{metas[i + 1][1]}"
        for i in range(len(metas) - 1)
        if metas[i][2] == metas[i + 1][0]
    ]
    partials = ray.data.from_arrow_refs([t for t, _ in parts])
    if boundary:
        u, c = np.unique(np.asarray(boundary, dtype=object), return_counts=True)
        partials = partials.union(
            ray.data.from_arrow(
                pa.table(
                    {"pair": pa.array(list(u), pa.string()),
                     "cnt": pa.array(c.astype(np.int64))}
                )
            )
        )
    summed = grouped_sums_sorted(partials, "pair", ["cnt"], ["n"])

    def split(t: pa.Table) -> pa.Table:
        parts_ = pc.split_pattern(t.column("pair"), sep)
        return pa.table(
            {
                "prev": pc.list_element(parts_, 0),
                "next": pc.list_element(parts_, 1),
                "n": t.column("n"),
            }
        )

    return summed.map_batches(split, batch_format="pyarrow")


def rolling_sum_time_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    horizon: int,
    out_col: str = "rolling_sum",
) -> ray.data.Dataset:
    """Time-horizon rolling aggregate — the RANGE-frame sibling of
    :func:`rolling_sum_per_key`'s ROWS frame: for each row the sum of
    ``value_col`` over all rows of the SAME key with
    ``ts ∈ [ts_row − horizon, ts_row]`` (the window SQL ``SUM(v) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN horizon PRECEDING AND
    CURRENT ROW)``; peers — equal timestamps — are all included on both
    sides, exactly the SQL RANGE peer rule, so no tie column is needed).

    House one-sort pattern with a TIME-BOUNDED tail carry: after the
    global sort by (key, ts) each block ships forward only its last
    key's rows within ``horizon`` of its last timestamp — the superset
    any successor can need — and a block whose head run spans several
    earlier blocks concatenates their tails. Driver metadata is
    O(blocks × events-per-horizon): bounded by the key's event RATE
    times the horizon, not by data size; a hot key bursting inside one
    horizon inflates it, so keep horizons modest (document the skew
    assumption at call sites). ``ts_col`` and ``value_col`` must be
    integer (timestamps as epoch-us int64)."""
    if horizon < 0:
        raise ValueError("horizon must be >= 0")
    if out_col in ds.schema().names:
        raise ValueError(f"out_col {out_col!r} already exists in the input")
    arrow = ds.map_batches(lambda t: t, batch_format="pyarrow")
    s = arrow.sort([key_col, ts_col]).materialize()
    refs = nonempty_block_refs(s)
    # schema from the MATERIALIZED arrow dataset: a from_pandas input's
    # schema carries pandas types, not Arrow ones (grouped_sums_sorted's
    # fix, engine/ntile.py)
    sch = s.schema() if s.schema() is not None else ds.schema()
    out_schema = pa.schema(
        list(zip(sch.names, sch.types)) + [(out_col, pa.int64())]
    )
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def tail_rows(tbl: pa.Table):
        """(key, ts, value) of the LAST key's rows within horizon of the
        block's last timestamp — the superset any successor block's
        lookback can reach (its windows start at ts > last_ts here)."""
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ts = tbl.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tbl.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        m = (keys == keys[-1]) & (ts >= ts[-1] - horizon)
        return keys[m], ts[m], vals[m]

    tails = ray.get([tail_rows.remote(r) for r in refs])
    firsts = ray.get(
        [
            _first_key_ts.remote(r, key_col, ts_col)
            for r in refs
        ]
    )
    empty = (np.zeros(0, object), np.zeros(0, np.int64), np.zeros(0, np.int64))
    carries = [empty]
    for i in range(1, len(refs)):
        fk, fts = firsts[i]
        parts_k, parts_t, parts_v = [], [], []
        # walk back while the SAME key keeps straddling block boundaries
        for j in range(i - 1, -1, -1):
            tk, tt, tv = tails[j]
            if len(tk) == 0 or tk[-1] != fk:
                break
            keep = tt >= fts - horizon
            parts_k.append(tk[keep]); parts_t.append(tt[keep]); parts_v.append(tv[keep])
            if not keep.all() or firsts[j][0] != fk:
                break  # older rows are out of every successor window
        if parts_k:
            carries.append(
                (
                    np.concatenate(parts_k[::-1]),
                    np.concatenate(parts_t[::-1]),
                    np.concatenate(parts_v[::-1]),
                )
            )
        else:
            carries.append(empty)

    @ray.remote
    def emit(tbl: pa.Table, ck, ct, cv) -> pa.Table:
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ts = tbl.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = tbl.column(value_col)
        if col.null_count:
            col = pc.fill_null(col, 0)
        vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
        ncar = len(ck)
        k = np.concatenate([np.asarray(ck), keys])
        t = np.concatenate([np.asarray(ct, np.int64), ts])
        v = np.concatenate([np.asarray(cv, np.int64), vals])
        n = len(k)
        new_run = np.concatenate(([True], k[1:] != k[:-1]))
        run_starts = np.flatnonzero(new_run)
        run_ends = np.append(run_starts[1:], n)
        cs = np.cumsum(v)
        out = np.empty(n, np.int64)
        for rs, re in zip(run_starts, run_ends):
            if re - rs == 1:
                out[rs] = v[rs]
                continue
            rt = t[rs:re]
            lo = rs + np.searchsorted(rt, rt - horizon, side="left")
            hi = rs + np.searchsorted(rt, rt, side="right") - 1
            out[rs:re] = cs[hi] - np.where(lo > 0, cs[lo - 1], 0)
        res = tbl.append_column(out_col, pa.array(out[ncar:]))
        return res.cast(out_schema)

    out_refs = [emit.remote(r, *c) for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)


@ray.remote
def _first_key_ts(tbl: pa.Table, key_col: str, ts_col: str):
    return (
        tbl.column(key_col)[0].as_py(),
        int(tbl.column(ts_col)[0].as_py()),
    )
