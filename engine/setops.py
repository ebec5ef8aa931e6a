"""Distributed set operations on a key column: EXCEPT and INTERSECT
(DISTINCT semantics). The reference has no set ops (SURVEY.md §2.2);
Ray Data offers only ``union``.

Design — ONE sort, no hash aggregate (Ray 2.49's hash aggregate is ~100×
slower than its sort at ≥10M rows, CLAUDE.md), no driver-side rows:

1. Tag side (a=0, b=1) and union into one two-column Dataset.
2. Global ``sort([col, side])`` — equal keys become one contiguous run,
   possibly spanning blocks.
3. Per block, vectorized run analysis (``np.logical_or.reduceat``):
   distinct keys with per-key "seen in a" / "seen in b" flags.
4. Cross-block runs: each block ships a tiny (first_key, last_key,
   per-end flags) tuple; the driver chains the accumulated flags of the
   run that spans a boundary into the next block and marks which block
   owns (ends) each run — that block emits the key. The driver handles
   O(blocks) tuples, never rows (same pattern as engine/topk.py /
   engine/graph._sorted_distinct_refs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .util import nonempty_block_refs

_SIDE = "__side"


def _tag(ds: ray.data.Dataset, col: str, side: int) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                col: t.column(col),
                _SIDE: pa.array(np.full(len(t), side, dtype=np.int8)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _run_flags(key: np.ndarray, side: np.ndarray):
    """(run_keys, has_a, has_b) per contiguous same-key run."""
    starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
    has_a = np.logical_or.reduceat(side == 0, starts)
    has_b = np.logical_or.reduceat(side == 1, starts)
    return key[starts], has_a, has_b


def set_op_keys(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    col: str,
    op: str,
) -> ray.data.Dataset:
    """Distinct keys of ``a EXCEPT b`` (``op="except"``: in a, not in b)
    or ``a INTERSECT b`` (``op="intersect"``: in both). Single key column
    (pack composites into one column upstream)."""
    if op not in ("except", "intersect"):
        raise ValueError(f"unknown set op {op!r}")
    uni = _tag(a, col, 0).union(_tag(b, col, 1))
    s = uni.sort([col, _SIDE]).materialize()

    refs = nonempty_block_refs(s)
    sch = a.schema()
    key_type = dict(zip(sch.names, sch.types))[col]
    out_schema = pa.schema([(col, key_type)])
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())

    @ray.remote
    def block_meta(tbl: pa.Table):
        key = tbl.column(col).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        rk, ha, hb = _run_flags(key, side)
        return (
            rk[0],
            bool(ha[0]),
            bool(hb[0]),
            rk[-1],
            bool(ha[-1]),
            bool(hb[-1]),
            len(rk) == 1,
        )

    metas = ray.get([block_meta.remote(r) for r in refs])

    # chain the flags of the run spanning each block boundary; the block
    # where a run ENDS owns (emits) its key
    carries: list[tuple[bool, bool]] = []
    cur_key, cur_a, cur_b = None, False, False
    for fk, fa, fb, lk, la, lb, single in metas:
        carry = (
            (cur_a, cur_b)
            if cur_key is not None and fk == cur_key
            else (False, False)
        )
        carries.append(carry)
        if single:
            cur_key, cur_a, cur_b = lk, carry[0] or la, carry[1] or lb
        else:
            cur_key, cur_a, cur_b = lk, la, lb
    emit_last = [
        i == len(metas) - 1 or metas[i + 1][0] != metas[i][3]
        for i in range(len(metas))
    ]

    @ray.remote
    def emit(tbl: pa.Table, carry, owns_last: bool) -> pa.Table:
        key = tbl.column(col).to_numpy(zero_copy_only=False)
        side = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        rk, ha, hb = _run_flags(key, side)
        ha[0] |= carry[0]
        hb[0] |= carry[1]
        if op == "except":
            mask = ha & ~hb
        else:
            mask = ha & hb
        if not owns_last:
            mask[-1] = False  # the run continues into the next block
        return pa.table({col: pa.array(rk[mask])}, schema=out_schema)

    out_refs = [
        emit.remote(r, c, e) for r, c, e in zip(refs, carries, emit_last)
    ]
    return ray.data.from_arrow_refs(out_refs)


def except_keys(
    a: ray.data.Dataset, b: ray.data.Dataset, col: str
) -> ray.data.Dataset:
    """Distinct ``col`` values present in ``a`` but not in ``b``."""
    return set_op_keys(a, b, col, "except")


def intersect_keys(
    a: ray.data.Dataset, b: ray.data.Dataset, col: str
) -> ray.data.Dataset:
    """Distinct ``col`` values present in both ``a`` and ``b``."""
    return set_op_keys(a, b, col, "intersect")
