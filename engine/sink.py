"""Resumable partitioned-Parquet sink — the 100-TB output contract: one
directory per deterministic key-hash bucket, each committed atomically
(tmp → rename + ``_SUCCESS``), so a failed run RESUMES by skipping
finished buckets — and skipped buckets are filtered out BEFORE the
shuffle, so resume saves the write *and* the data movement. Never one
giant file.

Bucket = md5-low-64(str(key)) % num_buckets — the same process-stable
hash family as the train/val/test split (DuckDB ``md5_number_lower``
compatible), stable under any repartitioning or reordering of the input.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _bucket_of(values, num_buckets: int) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
            % num_buckets
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


_BUCKET_RE = re.compile(r"^bucket=(\d+)$")


def finished_buckets(out_dir: str) -> set[int]:
    """Buckets already committed by a previous (possibly failed) run.
    Strict name match: a crash can leave ``bucket=K.tmp`` behind (even
    with its _SUCCESS written, pre-rename), and parsing it as a bucket
    id would brick resume with a ValueError — exactly the crash window
    the sink exists to survive."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        m = _BUCKET_RE.match(name)
        if m and os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            done.add(int(m.group(1)))
    return done


def write_parquet_resumable(
    ds: ray.data.Dataset,
    out_dir: str,
    key_col: str,
    num_buckets: int = 64,
) -> dict:
    """Write ``ds`` as ``out_dir/bucket=K/part.parquet`` (+ ``_SUCCESS``),
    K = stable hash of ``key_col`` — rerunning after a failure skips the
    committed buckets entirely (rows are dropped before the co-locating
    shuffle). Partially-written buckets (no ``_SUCCESS``) are discarded
    and rewritten, so output is exactly-once per bucket. Returns
    ``{"written": [...], "skipped": [...], "rows_written": int}``.

    A ``_manifest.json`` records (key_col, num_buckets) on first write;
    resuming with DIFFERENT values raises — the old bucket space and the
    new one are incompatible, and mixing them silently drops and
    duplicates rows. Size ``num_buckets`` so one bucket's rows fit a
    worker: each bucket is written by one task as one file (total_bytes /
    num_buckets ≲ a few GB; raise num_buckets for bigger outputs).
    Single-node semantics here; on a cluster point ``out_dir`` at shared
    storage."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_fn = os.path.join(out_dir, "_manifest.json")
    manifest = {"key_col": key_col, "num_buckets": num_buckets}
    if os.path.exists(manifest_fn):
        with open(manifest_fn) as f:
            prev = json.load(f)
        if prev != manifest:
            raise ValueError(
                f"resume mismatch: {out_dir} was written with {prev}, "
                f"rerun requests {manifest} — a different bucketing would "
                "silently drop/duplicate rows; use a fresh out_dir"
            )
    else:
        with open(manifest_fn, "w") as f:
            json.dump(manifest, f)
    # stale .tmp dirs from a crashed run are dead weight — clear them now
    for name in os.listdir(out_dir):
        if name.endswith(".tmp") and name.startswith("bucket="):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    done = finished_buckets(out_dir)

    def bucketize(t: pa.Table) -> pa.Table:
        b = _bucket_of(t.column(key_col).to_pylist(), num_buckets)
        t = t.append_column("__bucket", pa.array(b))
        if done:
            keep = ~np.isin(b, np.fromiter(done, dtype=np.int64, count=len(done)))
            t = t.filter(pa.array(keep))
        return t

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["__bucket"].iloc[0])
        tbl = pa.Table.from_pandas(
            g.drop(columns="__bucket"), preserve_index=False
        )
        d = os.path.join(out_dir, f"bucket={k}")
        tmp = d + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)  # discard partial writes
        os.makedirs(tmp)
        part = os.path.join(tmp, "part.parquet")
        pq.write_table(tbl, part)
        # fsync data + marker before the rename publishes them: rename
        # without fsync can survive a host crash while the file contents
        # do not, leaving a _SUCCESS over truncated parquet that resume
        # would then skip forever
        with open(part, "rb") as f:
            os.fsync(f.fileno())
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, d)
        dfd = os.open(out_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)  # make the rename itself durable
        finally:
            os.close(dfd)
        return pd.DataFrame({"bucket": [k], "rows": [len(tbl)]})

    stats = bucketed.groupby("__bucket").map_groups(
        write_group, batch_format="pandas"
    )
    written, rows = [], 0
    for b in stats.iter_batches(batch_format="pyarrow"):
        written.extend(b.column("bucket").to_pylist())
        rows += int(np.sum(b.column("rows").to_numpy(zero_copy_only=False)))
    return {
        "written": sorted(written),
        "skipped": sorted(done),
        "rows_written": rows,
    }


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back a resumable-sink directory (committed buckets only)."""
    files = [
        os.path.join(out_dir, f"bucket={k}", "part.parquet")
        for k in sorted(finished_buckets(out_dir))
    ]
    if not files:
        raise ValueError(
            f"no committed buckets under {out_dir!r} (missing dir, or the "
            "producing run failed before its first bucket commit)"
        )
    return ray.data.read_parquet(files)
