"""JSONL source + sink — the text-corpus interchange format.

Training corpora arrive and ship as newline-delimited JSON at least as
often as Parquet; this module makes the engine a full citizen of that
format without ever funneling rows through the driver:

- sink: each Ray block serializes itself with pandas ``to_json(orient=
  "records", lines=True)`` (C-vectorized, no per-row Python) and writes
  ONE part file, so the write parallelism equals the pipeline's block
  parallelism and a 100-TB dataset lands as many independent files.
  Part names are the sha256 of the serialized bytes and the write is
  rename-over, so a Ray task retry rewrites the same file instead of
  duplicating rows (byte-identical DISTINCT blocks would coalesce — in
  practice impossible for id-carrying corpora; the exactly-once bucketed
  path is engine/sink.py).
- source: ``ray.data.read_json`` — pyarrow's C JSON parser, one read
  task per file, schema unified across parts; only ``*.jsonl[.gz]``
  parts are read, so an interrupted writer's ``*.tmp`` never leaks in.

Fidelity: timestamps are written as ISO-8601 at microsecond precision
and floats at the pandas serializer's maximum ``double_precision=15``
(~1 ulp short of full float64 roundtrip — columns needing exact float
bits should travel as Parquet). No reference analog (the reference
reads SNAP edge lists only, src/Graph.cpp:32-116).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pandas as pd
import ray.data


def write_jsonl(
    ds: ray.data.Dataset,
    out_dir: str,
    clean: bool = False,
    compression: str | None = None,
) -> int:
    """Distributed JSONL sink: one ``part-*.jsonl[.gz]`` file per
    non-empty block, written atomically (tmp + rename-over; content-hash
    names make task retries idempotent). Re-running a DIFFERENT dataset
    into the same directory accumulates files — pass ``clean=True`` (or
    a fresh directory) for reproducible output. ``compression="gzip"``
    writes ``.jsonl.gz`` parts (the standard shipped-corpus form).
    Executes eagerly; returns rows written."""
    if compression not in (None, "gzip"):
        raise ValueError("compression must be None or 'gzip'")
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype="int64")})
        data = df.to_json(
            orient="records",
            lines=True,
            force_ascii=True,
            date_format="iso",
            date_unit="us",
            double_precision=15,
        ).encode("utf-8")
        if compression == "gzip":
            import gzip

            # mtime=0: identical content → identical bytes across runs
            payload = gzip.compress(data, mtime=0)
        else:
            payload = data
        name = hashlib.sha256(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}{ext}")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, path)  # rename-over: retries rewrite, never dup
        return pd.DataFrame({"rows": [len(df)]})

    summary = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_jsonl(path: str, schema=None) -> ray.data.Dataset:
    """JSONL source via pyarrow's C JSON reader (one task per file).
    Reads only ``*.jsonl`` / ``*.jsonl.gz`` parts (a crashed writer's
    ``*.tmp`` is ignored); gzip parts are decompressed transparently by
    the Arrow filesystem layer. Pass ``schema`` (pyarrow.Schema) to pin
    column types — in particular, the parser leaves :func:`write_jsonl`'s
    ISO timestamp strings as strings unless the schema declares the
    column a timestamp."""
    import pyarrow.json as pajson

    kwargs = {}
    if schema is not None:
        kwargs["parse_options"] = pajson.ParseOptions(
            explicit_schema=schema, unexpected_field_behavior="infer"
        )
    return ray.data.read_json(path, file_extensions=["jsonl", "gz"], **kwargs)
