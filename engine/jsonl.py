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


def write_jsonl(ds: ray.data.Dataset, out_dir: str, clean: bool = False) -> int:
    """Distributed JSONL sink: one ``part-*.jsonl`` file per non-empty
    block, written atomically (tmp + rename). Part names carry a uuid —
    re-running into the same directory ACCUMULATES files, so pass
    ``clean=True`` (or a fresh directory) for reproducible output.
    Executes eagerly; returns the number of rows written."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype="int64")})
        data = df.to_json(orient="records", lines=True, force_ascii=True)
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:16]}.jsonl")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
        os.rename(tmp, path)
        return pd.DataFrame({"rows": [len(df)]})

    summary = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_jsonl(path: str) -> ray.data.Dataset:
    """JSONL source via pyarrow's C JSON reader (one task per file)."""
    return ray.data.read_json(path)
