"""Checkpoint / resume for the superstep engines (north-rule N7).

Layout (resumable, partitioned, atomic):

    <dir>/iter=K/ranks/part-*.parquet     (vid: uint64, rank: float64)
    <dir>/iter=K/metrics.json             superstep metrics + lineage
    <dir>/iter=K/_SUCCESS                 written LAST → iteration complete

``metrics.json`` carries per-partition lineage: for each written part file,
its row count and a content hash, so a resumed run can verify integrity.
Resume = scan for the largest K whose ``_SUCCESS`` exists; incomplete
iterations (crash mid-write) are ignored and overwritten.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_ITER_RE = re.compile(r"^iter=(\d+)$")


def _iter_dir(root: str, it: int) -> str:
    return os.path.join(root, f"iter={it}")


def save_iteration(
    root: str,
    it: int,
    rank: np.ndarray,
    metrics: dict | None = None,
    parts: int = 8,
) -> None:
    """Write iteration K's full rank vector, split into ``parts`` vid-range
    partitions (one file per partition → a rerun can skip finished ones)."""
    d = _iter_dir(root, it)
    tmp = d + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "ranks"), exist_ok=True)
    n = len(rank)
    lineage = []
    bounds = np.linspace(0, n, parts + 1).astype(np.int64)
    for p in range(parts):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        vid = np.arange(lo, hi, dtype=np.uint64)
        tbl = pa.table(
            {"vid": pa.array(vid, type=pa.uint64()), "rank": pa.array(rank[lo:hi])}
        )
        fn = os.path.join(tmp, "ranks", f"part-{p:05d}.parquet")
        pq.write_table(tbl, fn)
        h = hashlib.sha256(rank[lo:hi].tobytes()).hexdigest()[:16]
        lineage.append(
            {"part": p, "vid_range": [lo, hi], "rows": hi - lo, "content_hash": h}
        )
    meta = {"iteration": it, "metrics": metrics or {}, "partitions": lineage}
    with open(os.path.join(tmp, "metrics.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    os.replace(tmp, d)


def completed_iterations(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _ITER_RE.match(name)
        if m and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def load_iteration(root: str, it: int) -> dict:
    """Returns {"vid": np.ndarray, "rank": np.ndarray} (concatenated parts)."""
    d = os.path.join(_iter_dir(root, it), "ranks")
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return {
        "vid": tbl.column("vid").to_numpy(zero_copy_only=False).astype(np.int64),
        "rank": tbl.column("rank").to_numpy(zero_copy_only=False),
    }


def load_latest(root: str) -> tuple[int, dict] | None:
    done = completed_iterations(root)
    if not done:
        return None
    it = done[-1]
    return it, load_iteration(root, it)
