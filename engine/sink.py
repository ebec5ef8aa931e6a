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
import os
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


def finished_buckets(out_dir: str) -> set[int]:
    """Buckets already committed by a previous (possibly failed) run."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("bucket=") and os.path.exists(
            os.path.join(out_dir, name, "_SUCCESS")
        ):
            done.add(int(name.split("=", 1)[1]))
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
    ``{"written": [...], "skipped": [...], "rows_written": int}``."""
    os.makedirs(out_dir, exist_ok=True)
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
        pq.write_table(tbl, os.path.join(tmp, "part.parquet"))
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        os.replace(tmp, d)
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
    return ray.data.read_parquet(files)
