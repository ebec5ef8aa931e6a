"""Multi-metric grouped aggregation with a per-batch combiner — the
TPC-H-Q1-shaped reporting primitive.

The 100-TB-relevant property: each ``map_batches`` task pre-aggregates its
batch down to ≤ |distinct keys in batch| rows (vectorized ``np.unique`` +
``reduceat``, no Python loops), so the global ``groupby`` shuffles
O(keys × blocks) partial rows instead of O(rows) — for low-cardinality
report keys the exchange is negligible regardless of input size, and skew
cannot concentrate (every partial row is already a combined aggregate).
Money columns ride as exact integer cents / 1e-4 / 1e-6 units (the repo's
standard order-insensitive-compare trick) and only the final tiny result
computes float averages.

No reference analog (the reference is graph-only); this is the relational
reporting stage a corpus pipeline runs next to it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

ROUND = 9


def pivot_counts(
    ds: ray.data.Dataset,
    group_expr,
    type_col: str,
    types: tuple,
    group_name: str = "day",
    value_col: str | None = None,
    value_type: str | None = None,
    value_name: str = "value_cents",
) -> ray.data.Dataset:
    """Pivot / conditional aggregation: one row per group, one count
    column per ``types`` member (``n_<type>``), plus an optional exact
    integer-cents sum of ``value_col`` restricted to rows of
    ``value_type``. Rows whose type is outside ``types`` count toward no
    column (standard CASE WHEN semantics).

    ``group_expr(table) -> int64 array`` computes the group key
    vectorized (e.g. epoch-day from a timestamp). Same combiner shape as
    :func:`pricing_summary`: each batch reduces to ≤ |distinct groups in
    batch| rows before the global groupby, so the shuffle is
    O(groups × blocks) regardless of input size."""
    out_cols = [f"n_{t}" for t in types] + (
        [value_name] if value_col else []
    )

    def partial(t: pa.Table) -> pa.Table:
        grp = np.asarray(group_expr(t), dtype=np.int64)
        ty = t.column(type_col).to_numpy(zero_copy_only=False)
        order = np.argsort(grp, kind="stable")
        gs = grp[order]
        starts = (
            np.concatenate(([0], np.flatnonzero(gs[1:] != gs[:-1]) + 1))
            if len(gs)
            else np.empty(0, np.int64)
        )
        cols = {group_name: pa.array(gs[starts] if len(gs) else gs)}
        for name in types:
            ind = (ty == name).astype(np.int64)[order]
            cols[f"n_{name}"] = pa.array(
                np.add.reduceat(ind, starts) if len(gs) else ind
            )
        if value_col:
            cents = pc.cast(
                pc.round(
                    pc.multiply(t.column(value_col), 100.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            masked = np.where(ty == value_type, cents, 0)[order]
            cols[value_name] = pa.array(
                np.add.reduceat(masked, starts) if len(gs) else masked
            )
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_name)
        .aggregate(*[Sum(c, alias_name=c) for c in out_cols])
    )


def _dict_codes(t: pa.Table, cols: list):
    """Per-batch dictionary encode of string dimension columns: int64
    code arrays (one per row — the only O(rows) work), the small value
    dictionaries, and a radix per column with one extra slot reserved
    (rollup's ALL). Null dimension values are rejected — fill first."""
    codes, dicts, radix = [], [], []
    for c in cols:
        da = pc.dictionary_encode(t.column(c)).combine_chunks()
        if da.null_count:
            raise ValueError(f"null values in dimension column {c!r}")
        codes.append(da.indices.to_numpy(zero_copy_only=False).astype(np.int64))
        dicts.append(da.dictionary)
        radix.append(len(da.dictionary) + 1)
    total = 1
    for r in radix:
        total *= r
    if total >= 1 << 62:
        raise ValueError("dimension cardinality product overflows int64 packing")
    return codes, dicts, radix


def rollup_counts(
    ds: ray.data.Dataset,
    cols: list,
    all_token: str = "ALL",
) -> ray.data.Dataset:
    """OLAP CUBE counts: one row per combination of every grouping
    subset of ``cols`` (the SQL ``GROUP BY GROUPING SETS`` /  ``CUBE``),
    rolled-up dimensions replaced by ``all_token`` (so the output has no
    NULL-vs-NULL compare ambiguity; null dimension values are rejected —
    filter or fill first). Per-batch combiner: dictionary-encode each
    dimension once, pack the int codes (the ALL slot is a reserved
    code), ``np.unique`` per grouping set — the only O(rows) work is
    vectorized integer packing; strings are materialized only for the
    ≤ 2^d × |distinct combos in batch| partial rows, so the global
    groupby is O(combos × blocks) no matter the input size."""
    d = len(cols)
    if not 1 <= d <= 4:
        raise ValueError("rollup_counts supports 1..4 dimensions")
    out_schema = pa.schema(
        [(c, pa.string()) for c in cols] + [("n", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        nrows = len(t)
        if nrows == 0:
            return out_schema.empty_table()
        codes, dicts, radix = _dict_codes(t, cols)
        # dictionary + ALL slot, per dim — decode is a vectorized take
        decode = [
            pa.concat_arrays(
                [dicts[i].cast(pa.string()), pa.array([all_token], pa.string())]
            )
            for i in range(d)
        ]
        parts = []
        for mask in range(1 << d):
            packed = np.zeros(nrows, np.int64)
            for i in range(d):
                code_i = (
                    codes[i]
                    if (mask >> i) & 1
                    else np.full(nrows, radix[i] - 1, np.int64)
                )
                packed = packed * radix[i] + code_i
            u, cts = np.unique(packed, return_counts=True)
            cols_out = {}
            rem = u
            dim_codes = [None] * d
            for i in range(d - 1, -1, -1):
                dim_codes[i] = rem % radix[i]
                rem = rem // radix[i]
            for i, c in enumerate(cols):
                cols_out[c] = decode[i].take(pa.array(dim_codes[i]))
            cols_out["n"] = pa.array(cts.astype(np.int64))
            parts.append(pa.table(cols_out).cast(out_schema))
        return pa.concat_tables(parts)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Sum("n", alias_name="n"))
    )


def pricing_summary(
    li: ray.data.Dataset, ship_cutoff: np.datetime64 | None = None
) -> ray.data.Dataset:
    """TPC-H-Q1-style pricing summary by (l_returnflag, l_linestatus).

    Integer metric encodings (exact under any summation order):
    ``sum_qty`` whole units, ``sum_base_price_cents`` ×100,
    ``sum_disc_price_e4`` = Σ price_cents·(100−disc_cents),
    ``sum_charge_e6`` = Σ price_cents·(100−disc_cents)·(100+tax_cents).
    Averages are float64 of the exact integer sums, rounded to 9.

    Scale bound: charge terms are ~1e11 per row, so the exact int64
    global sum holds to ~1e8 rows PER GROUP KEY; beyond that it would
    silently wrap while a DuckDB HUGEINT oracle stays exact. A float64
    shadow sum rides along and ``finalize`` raises ``OverflowError`` on
    int-vs-shadow divergence instead of returning a wrapped number."""

    def partial(t: pa.Table) -> pa.Table:
        if ship_cutoff is not None:
            # epoch-µs compare: robust to the date/timestamp unit of the
            # python-side cutoff vs the column's timestamp[us]
            cut = int(np.datetime64(ship_cutoff, "us").astype(np.int64))
            ts = t.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64())
            t = t.filter(pc.less_equal(ts, pa.scalar(cut)))
        rf = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        ls = t.column("l_linestatus").to_numpy(zero_copy_only=False)
        qty = np.round(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        price_c = np.round(
            t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_c = np.round(
            t.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        tax_c = np.round(
            t.column("l_tax").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        disc_price = price_c * (100 - disc_c)
        charge = disc_price * (100 + tax_c)
        # combined group key; the key space is tiny (report dimensions)
        key = np.char.add(rf.astype("U8"), ls.astype("U8"))
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1)
        ) if len(ks) else np.empty(0, np.int64)
        uk = ks[starts] if len(ks) else np.empty(0, dtype=key.dtype)

        def seg_sum(v):
            return (
                np.add.reduceat(v[order], starts)
                if len(ks)
                else np.empty(0, np.int64)
            )

        ones = np.ones(len(ks), dtype=np.int64)
        return pa.table(
            {
                "rf_ls": pa.array([str(k) for k in uk], type=pa.string()),
                "sum_qty": pa.array(seg_sum(qty)),
                "sum_base_price_cents": pa.array(seg_sum(price_c)),
                "sum_disc_price_e4": pa.array(seg_sum(disc_price)),
                "sum_charge_e6": pa.array(seg_sum(charge)),
                "sum_disc_cents": pa.array(seg_sum(disc_c)),
                "count_order": pa.array(seg_sum(ones)),
                # float64 shadow of the widest integer sum: charge terms
                # are ~1e11/row, so the exact int64 global Sum silently
                # wraps past ~9e7 ROWS-equivalent of headroom per 2**63;
                # the shadow (53-bit mantissa, relative error ~n·eps)
                # can't wrap, so a large int-vs-float divergence in
                # finalize() is a reliable overflow detector at any scale.
                "shadow_charge_f": pa.array(
                    seg_sum(charge).astype(np.float64)
                    if len(ks)
                    else np.empty(0, np.float64)
                ),
            }
        )

    cols = [
        "sum_qty",
        "sum_base_price_cents",
        "sum_disc_price_e4",
        "sum_charge_e6",
        "sum_disc_cents",
        "count_order",
        "shadow_charge_f",
    ]
    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("rf_ls")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )

    def finalize(t: pa.Table) -> pa.Table:
        key = t.column("rf_ls").to_pylist()
        n = t.column("count_order").to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t.column("sum_qty").to_numpy(zero_copy_only=False)
        sp = t.column("sum_base_price_cents").to_numpy(zero_copy_only=False)
        sd = t.column("sum_disc_cents").to_numpy(zero_copy_only=False)
        # overflow guard: int64 wrap shifts the exact sum by ~2**64,
        # which the float shadow (error ~ blocks · eps · sum) can't miss
        ci = t.column("sum_charge_e6").to_numpy(zero_copy_only=False).astype(np.float64)
        cf = t.column("shadow_charge_f").to_numpy(zero_copy_only=False)
        bad = np.abs(ci - cf) > 1e-6 * np.maximum(np.abs(cf), 1.0)
        if bad.any():
            raise OverflowError(
                "sum_charge_e6 int64 accumulator wrapped (exact int sum "
                f"diverges from float64 shadow for keys "
                f"{[key[i] for i in np.flatnonzero(bad)]}); re-run with a "
                "coarser money unit or a decimal accumulator"
            )
        out = {
            "l_returnflag": pa.array([k[0] for k in key], type=pa.string()),
            "l_linestatus": pa.array([k[1:] for k in key], type=pa.string()),
        }
        for c in cols:
            if c not in ("sum_disc_cents", "shadow_charge_f"):
                out[c] = t.column(c)
        out["avg_qty"] = pa.array(np.round(sq / n, ROUND))
        out["avg_price"] = pa.array(np.round(sp / 100.0 / n, ROUND))
        out["avg_disc"] = pa.array(np.round(sd / 100.0 / n, ROUND))
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


def grouped_mode(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_n: str = "n",
) -> ray.data.Dataset:
    """Most frequent ``val_col`` per ``key_col`` (SQL mode / grouped
    argmax) with deterministic ties: highest count first, then smallest
    value — ``row_number() OVER (PARTITION BY key ORDER BY n DESC, val
    ASC)``. Per-batch (key, val) count combiner bounds the shuffle at
    O(combos × blocks); the argmax itself rides the grouped-top-k
    machinery (k=1) over the tiny combined table. String key/val only
    (no nulls). The per-batch combiner packs dictionary codes — the
    only O(rows) work is vectorized integer packing; strings are
    materialized only for the batch-distinct combos."""
    out_schema = pa.schema(
        [(key_col, pa.string()), (val_col, pa.string()), (out_n, pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        codes, dicts, radix = _dict_codes(t, [key_col, val_col])
        packed = codes[0] * radix[1] + codes[1]
        u, c = np.unique(packed, return_counts=True)
        return pa.table(
            {
                key_col: dicts[0].cast(pa.string()).take(pa.array(u // radix[1])),
                val_col: dicts[1].cast(pa.string()).take(pa.array(u % radix[1])),
                out_n: pa.array(c.astype(np.int64)),
            }
        ).cast(out_schema)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Sum(out_n, alias_name=out_n))
    )
    from .topk import topk_per_group

    # k=1 by n DESC; the remaining column (val) breaks ties ascending —
    # exactly the SQL order above
    return topk_per_group(counts, key_col, out_n, k=1, descending=True)


def grouped_count_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    """Exact per-key COUNT(DISTINCT val) without a hash aggregate:
    per-batch pair dedup → packed sort-based distributed DISTINCT
    (``graph._sorted_distinct_refs`` — Ray 2.49's hash aggregate is
    ~100× slower than its sort at volume) → per-block vectorized per-key
    counts → an O(keys × blocks) groupby-sum to settle keys straddling
    block boundaries. String key, any string-castable val ('\\x1f' must
    not occur in either; no nulls). Per-batch dedup packs dictionary
    codes — O(rows) work is vectorized integer packing; the pair
    strings for the global DISTINCT are built only for batch-distinct
    pairs."""
    import ray as _ray

    from . import graph as G

    SEP = "\x1f"

    def pack(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"k": pa.array([], pa.string())})
        kc = t.column(key_col)
        vc = t.column(val_col)
        if kc.type != pa.string():
            kc = pc.cast(kc, pa.string())
        if vc.type != pa.string():
            vc = pc.cast(vc, pa.string())
        codes, dicts, radix = _dict_codes(
            pa.table({key_col: kc, val_col: vc}), [key_col, val_col]
        )
        packed = codes[0] * radix[1] + codes[1]
        u = np.unique(packed)
        pairs = pc.binary_join_element_wise(
            dicts[0].cast(pa.string()).take(pa.array(u // radix[1])),
            dicts[1].cast(pa.string()).take(pa.array(u % radix[1])),
            SEP,
        )
        return pa.table({"k": pairs})

    packed = ds.map_batches(pack, batch_format="pyarrow")
    refs, _counts = G._sorted_distinct_refs(packed, "k")
    out_schema = pa.schema([(key_col, pa.string()), (out_col, pa.int64())])
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @_ray.remote
    def per_key(tbl: pa.Table) -> pa.Table:
        # rows here are globally-distinct pairs; split + value_counts
        # are vectorized arrow kernels over that (already reduced) set
        keys = pc.list_element(
            pc.split_pattern(tbl.column("k"), SEP, max_splits=1), 0
        )
        vc = pc.value_counts(keys)
        return pa.table(
            {
                key_col: vc.field("values"),
                out_col: pc.cast(vc.field("counts"), pa.int64()),
            }
        ).cast(out_schema)

    partial = ray.data.from_arrow_refs([per_key.remote(r) for r in refs])
    return partial.groupby(key_col).aggregate(Sum(out_col, alias_name=out_col))


def _grouped_moments(
    ds: ray.data.Dataset, key_col: str, x_col: str, y_col: str
) -> ray.data.Dataset:
    """Exact integer second-moment sums per key — the shared combiner of
    the grouped Pearson / OLS family: each batch reduces to one (n, Σx,
    Σy, Σxy, Σx², Σy²) row per key it contains (vectorized argsort +
    reduceat), so the global groupby ships O(keys × blocks) partials.
    Caller bounds: |x·y|·rows_per_group must stay < 2⁶³."""
    moment_schema = pa.schema(
        [(key_col, pa.string())]
        + [(c, pa.int64()) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return moment_schema.empty_table()
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        x = t.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks, xs, ys = k[order], x[order], y[order]
        starts = np.concatenate(([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1))
        ends = np.append(starts[1:], len(ks))
        return pa.table(
            {
                key_col: pa.array(ks[starts].tolist(), pa.string()),
                "n": pa.array((ends - starts).astype(np.int64)),
                "sx": pa.array(np.add.reduceat(xs, starts)),
                "sy": pa.array(np.add.reduceat(ys, starts)),
                "sxy": pa.array(np.add.reduceat(xs * ys, starts)),
                "sxx": pa.array(np.add.reduceat(xs * xs, starts)),
                "syy": pa.array(np.add.reduceat(ys * ys, starts)),
            }
        ).cast(moment_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            *[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
        )
    )


def grouped_pearson(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    out_col: str = "corr",
    round_to: int = 9,
) -> ray.data.Dataset:
    """Grouped Pearson correlation from exact integer moment sums —
    the feature-association report. ``x_col``/``y_col`` MUST already be
    int64-quantized (the repo's order-insensitive-compare trick): the
    per-batch combiner reduces each batch to one (n, Σx, Σy, Σxy, Σx²,
    Σy²) row per key it contains, the global groupby ships
    O(keys × blocks) partials, and only the final tiny result evaluates
    floats — term-for-term in the oracle's operation order
    (n·Σxy − Σx·Σy over the √ product, products exact before the float
    cast). Caller bounds: |x·y|·rows_per_group must stay < 2⁶³."""

    agg = _grouped_moments(ds, key_col, x_col, y_col)

    def finish(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()  # tiny: one row per key
        corr = []
        for r in rows:
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
            num = float(n) * float(sxy) - float(sx * sy)
            dx = float(n) * float(sxx) - float(sx * sx)
            dy = float(n) * float(syy) - float(sy * sy)
            den = np.sqrt(dx) * np.sqrt(dy)
            corr.append(round(num / den, round_to) if den > 0 else None)
        return pa.table(
            {
                key_col: pa.array([r[key_col] for r in rows]),
                out_col: pa.array(corr, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_median_mad(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    k: float = 3.0,
) -> ray.data.Dataset:
    """Robust per-key outlier report — median, MAD (median absolute
    deviation, the robust sigma) and the count of rows with
    ``|x − median| > k·MAD``: the distribution-free anomaly screen a
    curation pipeline runs where mean/stddev would be dragged by the
    very outliers it hunts.

    Two passes of the sorted grouped percentile-pick (engine/ntile.py
    grouped_pdisc — O(keys) driver state, never a per-group
    materialization), the medians riding between passes as ONE ray.put
    broadcast dict; the outlier count is a per-batch combiner into the
    tiny sorted grouped SUM. ``val_col`` must be integer (exact disc
    percentiles, exact counts); k·MAD is compared in integers via
    ``dev > k·mad`` evaluated as float multiply of an int — exact for
    k with a short binary expansion (3.0)."""
    import ray as _ray

    from .ntile import grouped_pdisc, grouped_sums_sorted

    med = grouped_pdisc(ds, key_col, val_col, (0.5,))
    med_map = {kv: v[0.5] for kv, v in med.items()}
    med_ref = _ray.put(med_map)

    def absdev(t: pa.Table) -> pa.Table:
        import pandas as pd

        m = _ray.get(med_ref)
        keys = t.column(key_col).to_pandas()
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dev = np.abs(v - keys.map(m).to_numpy(dtype=np.int64))
        return pa.table({key_col: t.column(key_col), "_dev": pa.array(dev)})

    devs = ds.map_batches(absdev, batch_format="pyarrow")
    mad = grouped_pdisc(devs, key_col, "_dev", (0.5,))
    mad_map = {kv: v[0.5] for kv, v in mad.items()}
    mad_ref = _ray.put(mad_map)

    def flag(t: pa.Table) -> pa.Table:
        import pandas as pd

        mm = _ray.get(mad_ref)
        keys = t.column(key_col).to_pandas()
        dev = t.column("_dev").to_numpy(zero_copy_only=False)
        thresh = keys.map(mm).to_numpy(dtype=np.int64) * float(k)
        return pa.table(
            {
                key_col: t.column(key_col),
                "_1": pa.array(np.ones(len(t), np.int64)),
                "_out": pa.array((dev > thresh).astype(np.int64)),
            }
        )

    counts = grouped_sums_sorted(
        devs.map_batches(flag, batch_format="pyarrow"),
        key_col,
        ["_1", "_out"],
        ["n", "n_outliers"],
    )

    def attach(t: pa.Table) -> pa.Table:
        import pandas as pd

        keys = t.column(key_col).to_pandas()
        return pa.table(
            {
                key_col: t.column(key_col),
                "med": pa.array(keys.map(med_map).to_numpy(dtype=np.int64)),
                "mad": pa.array(keys.map(mad_map).to_numpy(dtype=np.int64)),
                "n": t.column("n"),
                "n_outliers": t.column("n_outliers"),
            }
        )

    return counts.map_batches(attach, batch_format="pyarrow")


def minmax_scale_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "scaled",
) -> ray.data.Dataset:
    """Per-key min-max feature scaling: append
    ``(x − min_key) / (max_key − min_key)`` (0.0 for a constant key) —
    the normalization pass before mixing heterogeneous sources into one
    training signal. Grouped extent via the sorted (min, max) reduce —
    O(keys) rows — broadcast once with ``ray.put``, then a stateless
    streamed apply; the input never shuffles."""
    import ray as _ray

    from .ntile import grouped_sums_sorted

    ext = grouped_sums_sorted(
        ds, key_col, [val_col, val_col], ["_mn", "_mx"], op=["min", "max"]
    ).to_pandas()
    mn_map = dict(zip(ext[key_col], (int(x) for x in ext["_mn"])))
    mx_map = dict(zip(ext[key_col], (int(x) for x in ext["_mx"])))
    span_ref = _ray.put((mn_map, mx_map))

    def apply(t: pa.Table) -> pa.Table:
        import pandas as pd

        mns, mxs = _ray.get(span_ref)
        keys = t.column(key_col).to_pandas()
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mn = keys.map(mns).to_numpy(dtype=np.int64)
        mx = keys.map(mxs).to_numpy(dtype=np.int64)
        rng = mx - mn
        scaled = np.where(rng > 0, (v - mn) / np.where(rng > 0, rng, 1), 0.0)
        return t.append_column(out_col, pa.array(scaled))

    return ds.map_batches(apply, batch_format="pyarrow")


def grouped_ols(
    ds: ray.data.Dataset,
    key_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 9,
) -> ray.data.Dataset:
    """Grouped simple linear regression y = slope·x + intercept — the
    per-key trend report, from the SAME exact integer moment combiner as
    :func:`grouped_pearson` (one O(keys × blocks) partial shuffle):
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), intercept =
    (Σy − slope·Σx) / n, floats only on the final tiny result,
    term-for-term in the oracle's operation order. Zero x-variance →
    NULL slope/intercept (SQL regr_slope semantics)."""
    agg = _grouped_moments(ds, key_col, x_col, y_col)

    def finish(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()  # tiny: one row per key
        slope, icept = [], []
        for r in rows:
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxy, sxx = int(r["sxy"]), int(r["sxx"])
            den = float(n) * float(sxx) - float(sx * sx)
            if den > 0:
                m = (float(n) * float(sxy) - float(sx * sy)) / den
                slope.append(round(m, round_to))
                icept.append(round((float(sy) - m * float(sx)) / n, round_to))
            else:
                slope.append(None)
                icept.append(None)
        return pa.table(
            {
                key_col: pa.array([r[key_col] for r in rows]),
                "slope": pa.array(slope, pa.float64()),
                "intercept": pa.array(icept, pa.float64()),
                "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def winsorize_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str = "clipped",
) -> ray.data.Dataset:
    """Per-key winsorization: clip ``val_col`` into its OWN key's
    [p_lo, p_hi] band (percentile_disc) — the tail-taming normalization
    a curation pipeline applies before averaging heterogeneous sources
    (contrast length_band_filter, which DROPS the tails instead).
    Grouped percentiles via the sorted percentile-pick (O(keys) driver
    state), one ray.put broadcast, stateless streamed clip; the input
    never shuffles. ``val_col`` must be integer."""
    import ray as _ray

    from .ntile import grouped_pdisc

    bands = grouped_pdisc(ds, key_col, val_col, (lo, hi))
    lo_map = {k: v[lo] for k, v in bands.items()}
    hi_map = {k: v[hi] for k, v in bands.items()}
    band_ref = _ray.put((lo_map, hi_map))

    def clip(t: pa.Table) -> pa.Table:
        los, his = _ray.get(band_ref)
        keys = t.column(key_col).to_pandas()
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lo_v = keys.map(los).to_numpy(dtype=np.int64)
        hi_v = keys.map(his).to_numpy(dtype=np.int64)
        return t.append_column(
            out_col, pa.array(np.clip(v, lo_v, hi_v))
        )

    return ds.map_batches(clip, batch_format="pyarrow")


def grouped_entropy(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    round_to: int = 9,
) -> ray.data.Dataset:
    """Per-key Shannon entropy (nats) of the ``val_col`` distribution —
    the label-diversity / mixture-balance report a curation pipeline
    runs per source or per shard. Per-batch (key, val) count combiner
    (vectorized Arrow concat + np.unique — each batch reduces to its
    distinct pairs), partials settle through the sorted grouped SUM (no
    hash aggregate), and only the final O(keys × distinct-vals) count
    rows evaluate floats: H = ln(n) − (Σ c·ln c)/n from exact integer
    counts, term-for-term the oracle's operation order. Both columns
    must be strings free of the \\x1f pack separator; the (key, val)
    pair cardinality must be small enough for one final block (the
    report contract — counts, not data). Emits
    (key, entropy, n, n_distinct)."""
    from .ntile import grouped_sum_sorted

    sep = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        kv = pc.binary_join_element_wise(
            pc.cast(t.column(key_col), pa.string()),
            pc.cast(t.column(val_col), pa.string()),
            sep,
        )
        uniq, counts = np.unique(
            kv.to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "kv": pa.array(uniq, pa.string()),
                "c": pa.array(counts.astype(np.int64)),
            }
        )

    counts = grouped_sum_sorted(
        ds.map_batches(partial, batch_format="pyarrow"), "kv", "c", out_col="c"
    )
    out_schema = pa.schema(
        [
            (key_col, pa.string()),
            ("entropy", pa.float64()),
            ("n", pa.int64()),
            ("n_distinct", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        kv = t.column("kv").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.array([s.split(sep, 1)[0] for s in kv], dtype=object)
        order = np.argsort(keys, kind="stable")
        keys, c = keys[order], c[order]
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        n = np.add.reduceat(c, starts)
        clnc = np.add.reduceat(c.astype(np.float64) * np.log(c), starts)
        h = np.round(np.log(n.astype(np.float64)) - clnc / n, round_to)
        ndis = np.diff(np.append(starts, len(keys)))
        return pa.table(
            {
                key_col: pa.array(keys[starts], pa.string()),
                "entropy": pa.array(h, pa.float64()),
                "n": pa.array(n.astype(np.int64)),
                "n_distinct": pa.array(ndis.astype(np.int64)),
            }
        ).cast(out_schema)

    return counts.repartition(1).map_batches(finish, batch_format="pyarrow")


def weighted_median_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    weight_col: str,
    out_col: str = "wmedian",
    max_pairs: int = 5_000_000,
) -> ray.data.Dataset:
    """Per-key lower weighted median — the smallest value v with
    cumulative weight ≥ half the key's total (exact integers: the
    threshold compares 2·cumw ≥ total, never a float). The
    importance-weighted center of a score distribution (weights =
    trustworthiness / token counts / exposure), where the plain median
    over-counts low-weight rows.

    Scale design (the percent-rank tier): the input never shuffles —
    per-batch (key, val) weight-sum partials settle through the sorted
    grouped SUM into the distinct-pair table (bounded by value
    cardinality per key, guarded at ``max_pairs``; discretize ``val``
    beyond), and one numpy pass picks each key's crossing point.
    ``val_col`` and ``weight_col`` must be non-negative integers."""
    from .ntile import grouped_sums_sorted

    sep = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(str)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and (v.min() < 0 or w.min() < 0):
            raise ValueError("val/weight must be non-negative integers")
        pair = np.char.add(
            np.char.add(k, sep), np.char.zfill(v.astype("U19"), 19)
        )
        u, inv = np.unique(pair, return_inverse=True)
        return pa.table(
            {
                "pair": pa.array(u.tolist(), pa.string()),
                "w": pa.array(np.bincount(inv, weights=w).astype(np.int64)),
            }
        )

    counts = grouped_sums_sorted(
        ds.map_batches(partial, batch_format="pyarrow"), "pair", ["w"], ["w"]
    )
    tbl = counts.sort("pair").to_pandas()
    if len(tbl) > max_pairs:
        raise ValueError(
            f"distinct (key, val) pairs exceed the pull tier "
            f"({len(tbl)} > {max_pairs}) — discretize {val_col!r} first"
        )
    pairs = tbl["pair"].to_numpy()
    w = tbl["w"].to_numpy().astype(np.int64)
    keys = np.asarray([p.split(sep, 1)[0] for p in pairs], dtype=object)
    vals = np.asarray([int(p.split(sep, 1)[1]) for p in pairs], dtype=np.int64)
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    grp = (np.cumsum(new_key) - 1).astype(np.int64)
    totals = np.bincount(grp, weights=w).astype(np.int64)
    cum = np.cumsum(w)
    key_start_cum = np.where(new_key, cum - w, 0)
    key_start_cum = np.maximum.accumulate(key_start_cum)
    cumw = cum - key_start_cum  # cumulative weight within key
    crossed = 2 * cumw >= totals[grp]
    # first crossing per key: mark positions where crossed and (new key
    # or previous not crossed-in-same-key)
    first = crossed & (new_key | ~np.concatenate(([False], crossed[:-1])))
    out_keys = keys[first]
    out_vals = vals[first]
    return ray.data.from_arrow(
        pa.table(
            {
                key_col: pa.array(out_keys.tolist(), pa.string()),
                out_col: pa.array(out_vals),
            }
        )
    )
