"""Arrow IPC (Feather V2) source + sink — the zero-fidelity-loss format.

JSONL and CSV (engine/jsonl.py, engine/csvio.py) are interchange formats
with documented precision edges (ISO-string timestamps, 15-digit floats,
type re-inference). Arrow IPC is the third family: the on-disk bytes ARE
the in-memory Arrow columns, so every type the engine touches —
timestamp[us], float64, list<float>, large strings — roundtrips
bit-exactly with no parser in the loop. The natural use is inter-stage
handoff between two pipelines of THIS engine (checkpoints, shuffle-free
re-reads), where Parquet's encode/decode CPU buys nothing.

Same distributed shape as the JSONL sink: one part file per non-empty
Ray block (write parallelism = block parallelism), content-hash names +
rename-over so task retries rewrite instead of duplicating, and the
source reads each part as its own Ray task. No reference analog (the
reference reads SNAP edge lists only, src/Graph.cpp:32-116).
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import ray.data


def write_ipc(ds: ray.data.Dataset, out_dir: str, clean: bool = False) -> int:
    """Distributed Arrow-IPC sink: one ``part-*.arrow`` file per
    non-empty block (IPC file format = Feather V2), written atomically
    (tmp + rename-over; content-hash names make task retries
    idempotent). Pass ``clean=True`` or a fresh directory for
    reproducible output. Executes eagerly; returns rows written."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        sink = pa.BufferOutputStream()
        with pa.ipc.new_file(sink, tbl.schema) as writer:
            writer.write_table(tbl)
        payload = sink.getvalue()
        name = hashlib.sha256(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}.arrow")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(payload.to_pybytes())
        os.rename(tmp, path)  # rename-over: retries rewrite, never dup
        return pa.table({"rows": pa.array([len(tbl)], pa.int64())})

    summary = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_ipc(path: str) -> ray.data.Dataset:
    """Arrow-IPC source: ``read_binary_files`` (one Ray read task per
    file) + an in-task zero-parse decode — ``pa.ipc.open_file`` memory-
    maps the columns straight out of the payload bytes. Only ``*.arrow``
    parts are read, so a crashed writer's ``*.tmp`` never leaks in."""

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            pa.ipc.open_file(pa.BufferReader(buf.as_py())).read_all()
            for buf in batch.column("bytes")
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ray.data.read_binary_files(
        path, file_extensions=["arrow"]
    ).map_batches(decode, batch_format="pyarrow")
