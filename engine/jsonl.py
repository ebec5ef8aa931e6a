"""JSONL source + sink — the text-corpus interchange format.

Training corpora arrive and ship as newline-delimited JSON at least as
often as Parquet; this module makes the engine a full citizen of that
format without ever funneling rows through the driver:

- sink: each Ray block serializes itself with pandas ``to_json(orient=
  "records", lines=True)`` (C-vectorized, no per-row Python) and writes
  ONE part file, so the write parallelism equals the pipeline's block
  parallelism and a 100-TB dataset lands as many independent files.
- source: ``ray.data.read_json`` — pyarrow's C JSON parser, one read
  task per file, schema unified across parts.

No reference analog (the reference reads SNAP edge lists only,
src/Graph.cpp:32-116); this is corpus-pipeline surface.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import ray.data


def write_jsonl(
    ds: ray.data.Dataset,
    out_dir: str,
    clean: bool = False,
    compression: str | None = None,
) -> int:
    """Distributed JSONL sink: one ``part-*.jsonl[.gz]`` file per
    non-empty block, written atomically (tmp + rename). Part names carry
    a uuid — re-running into the same directory ACCUMULATES files, so
    pass ``clean=True`` (or a fresh directory) for reproducible output.
    ``compression="gzip"`` writes ``.jsonl.gz`` parts (the standard
    shipped-corpus form). Executes eagerly; returns rows written."""
    if compression not in (None, "gzip"):
        raise ValueError("compression must be None or 'gzip'")
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype="int64")})
        data = df.to_json(orient="records", lines=True, force_ascii=True)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:16]}{ext}")
        tmp = path + ".tmp"
        if compression == "gzip":
            import gzip

            # mtime=0: identical content → identical bytes across runs
            with gzip.GzipFile(tmp, "wb", mtime=0) as f:
                f.write(data.encode("utf-8"))
        else:
            with open(tmp, "w") as f:
                f.write(data)
        os.rename(tmp, path)
        return pd.DataFrame({"rows": [len(df)]})

    summary = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_jsonl(path: str) -> ray.data.Dataset:
    """JSONL source via pyarrow's C JSON reader (one task per file).
    Gzip parts (``.jsonl.gz``) are decompressed transparently by the
    Arrow filesystem layer (inferred from the extension)."""
    return ray.data.read_json(path, file_extensions=None)
