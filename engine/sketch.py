"""HyperLogLog approximate-distinct sketch — the cardinality primitive a
100-TB pipeline uses where an exact distinct would shuffle everything
(vocabulary sizes, id-space estimates, per-source distinct counts).

Fully deterministic and SQL-reproducible, unlike library HLLs: the hash
is md5-low-64 of the value's decimal string (== DuckDB
``md5_number_lower``), registers are ``idx = h % m``, ``rho =
(64 - p) - bit_length(h // m) + 1``, and the estimator keeps the register
sum in EXACT integer arithmetic (Σ 2^(53-rho) as a python int) so engine
and oracle divide by the identical value — float-sum ordering can never
flip a digit. Per-batch register partials (≤ m rows each) feed one tiny
``groupby(idx).max(rho)`` — a small-output hash aggregate, the shape
CLAUDE.md sanctions it for; nothing O(N) ever reaches the driver.

Estimator: Flajolet et al. HLL with the standard small-range linear
counting branch; 64-bit hashes need no large-range correction.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max


def _hash64(values: list) -> np.ndarray:
    """md5-low-64 of str(value) — object array of python ints (exact,
    DuckDB md5_number_lower-compatible)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
            for v in values
        ),
        dtype=np.object_,
        count=len(values),
    )


def hll_register_partial(col: str, p: int):
    """Per-batch combiner: one (idx, rho) row per touched register."""
    m = 1 << p
    qbits = 64 - p

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if not vals:
            return pa.table(
                {
                    "idx": pa.array([], type=pa.int64()),
                    "rho": pa.array([], type=pa.int64()),
                }
            )
        h = _hash64(vals)
        idx = np.fromiter((int(x) % m for x in h), dtype=np.int64, count=len(h))
        rho = np.fromiter(
            (qbits - (int(x) // m).bit_length() + 1 for x in h),
            dtype=np.int64,
            count=len(h),
        )
        order = np.lexsort((-rho, idx))
        idx_s, rho_s = idx[order], rho[order]
        first = np.concatenate(([True], idx_s[1:] != idx_s[:-1]))
        return pa.table(
            {
                "idx": pa.array(idx_s[first]),
                "rho": pa.array(rho_s[first]),
            }
        )

    return fn


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """Final (idx, rho) register table — at most 2^p rows."""
    partial = ds.map_batches(hll_register_partial(col, p), batch_format="pyarrow")
    return partial.groupby("idx").aggregate(Max("rho", alias_name="rho"))


def hll_estimate_from_registers(
    idx: np.ndarray, rho: np.ndarray, p: int = 12
) -> tuple[float, int]:
    """(estimate, nonzero-register count). Exact-integer register sum,
    scaled by 2^Q with Q = (64 - p) + 1 = max rho so every term is an
    integer: S = Σ_nonzero 2^(Q-rho) + (m - nz)·2^Q, then ONE float
    division — bit-identical to the SQL oracle's arithmetic (a float
    Σ 2^-rho would be addition-order-dependent in its last ulps)."""
    m = 1 << p
    q1 = (64 - p) + 1
    nz = len(idx)
    S = int(sum(1 << (q1 - int(r)) for r in rho)) + (m - nz) * (1 << q1)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m * float(2.0**q1) / float(S)
    if est <= 2.5 * m and nz < m:
        est = m * math.log(m / (m - nz))
    return est, nz


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> tuple[float, int]:
    """HLL cardinality estimate of ``col`` (relative error ≈ 1.04/√2^p,
    ~1.6% at the default p=12)."""
    regs = hll_registers(ds, col, p).take_all()
    idx = np.array([r["idx"] for r in regs], dtype=np.int64)
    rho = np.array([r["rho"] for r in regs], dtype=np.int64)
    return hll_estimate_from_registers(idx, rho, p)


# ---- Count-min sketch (approximate frequencies) --------------------------
#
# The frequency analog of the HLL above: where exact per-token counts would
# shuffle the whole vocabulary (engine/textstats.py heavy_hitter_tokens is
# the exact path), a count-min sketch caps state at depth × width counters
# with one-sided error (estimates only overcount, by ≤ εN with
# ε ≈ e/width at the usual depth ≈ ln(1/δ)). Same determinism contract as
# the HLL: row r's hash is md5-low-64 of "r:token" (== DuckDB
# md5_number_lower), so the register table is exactly SQL-reproducible.
# Per-batch combine builds the dense depth × width partial and emits only
# touched counters — O(depth · width) rows per block, never O(tokens).

import re as _re

_CMS_WS = _re.compile(r"\s+")


def _cms_hash(r: int, token: str, width: int) -> int:
    return (
        int.from_bytes(
            hashlib.md5(f"{r}:{token}".encode()).digest()[8:], "little"
        )
        % width
    )


def cms_register_partial(depth: int, width: int, text_col: str = "text"):
    """Per-batch combiner: tokenize (whitespace split of the stripped
    text, NULLs skipped — the house token contract), count tokens once
    per batch via np.unique, then scatter counts into the dense
    depth × width partial; emit one (r, c, cnt) row per touched cell."""

    def fn(batch: pa.Table) -> pa.Table:
        toks: list = []
        for x in batch.column(text_col).to_pylist():
            if x is not None:
                toks.extend(_CMS_WS.split(x.strip()))
        empty = pa.table(
            {
                "r": pa.array([], type=pa.int64()),
                "c": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if not toks:
            return empty
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        regs = np.zeros((depth, width), dtype=np.int64)
        for tok, cnt in zip(uniq, counts):
            for r in range(depth):
                regs[r, _cms_hash(r, tok, width)] += int(cnt)
        rr, cc = np.nonzero(regs)
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64)),
                "c": pa.array(cc.astype(np.int64)),
                "cnt": pa.array(regs[rr, cc]),
            }
        )

    return fn


def cms_registers(
    ds: ray.data.Dataset, depth: int = 4, width: int = 1024,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Final (r, c, cnt) counter table — at most depth × width rows; the
    groupby input is O(depth × width) per block (small-output hash
    aggregate, the CLAUDE.md-sanctioned shape)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        cms_register_partial(depth, width, text_col), batch_format="pyarrow"
    )
    return partial.groupby(["r", "c"]).aggregate(Sum("cnt", alias_name="cnt"))


def cms_estimate(
    registers: dict, token: str, depth: int = 4, width: int = 1024
) -> int:
    """Point estimate: min over rows of the token's counter. ``registers``
    maps (r, c) -> cnt (missing cells are 0). One-sided: ≥ true count."""
    return min(
        registers.get((r, _cms_hash(r, token, width)), 0) for r in range(depth)
    )
