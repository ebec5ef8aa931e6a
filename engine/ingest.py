"""Sources: SNAP edge-list text reader and Parquet corpus reader.

- ``read_snap``: Ray-Data-native replacement for the reference's text parser
  (ref: ``src/Graph.cpp:32-116``): ``#`` comment lines skipped, whitespace
  separated ``FromNodeId ToNodeId`` pairs. Unlike the reference, no header
  ``Nodes:`` contract is needed (the reference reserves on it and dangles
  pointers if it lies — ``src/Graph.cpp:62``); we derive N from the data.
  Multigraph semantics preserved: duplicates and self-loops are kept
  (ref: ``src/Graph.cpp:92-97``).

- ``read_corpus``: the engine's primary input per BASELINE.json
  ``input_hint`` — Parquet with columns (repo, path, commit, lang, content).

- ``with_sha256``: appends the per-row ``content_sha256`` invariant column
  (input_hint: "content sha256 equality").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


def _parse_snap_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-ish SNAP line parse: one input row per text line."""
    srcs: list[int] = []
    dsts: list[int] = []
    for line in batch.column("text").to_pylist():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        srcs.append(int(parts[0]))
        dsts.append(int(parts[1]))
    return pa.table(
        {
            "src": pa.array(np.asarray(srcs, dtype=np.uint64), type=pa.uint64()),
            "dst": pa.array(np.asarray(dsts, dtype=np.uint64), type=pa.uint64()),
        }
    )


def read_snap(path: str) -> ray.data.Dataset:
    """SNAP edge-list file(s) → edges Dataset (src: uint64, dst: uint64)."""
    return ray.data.read_text(path).map_batches(
        _parse_snap_batch, batch_format="pyarrow"
    )


def read_snap_edges_local(path: str) -> list[tuple[int, int]]:
    """Driver-side tiny fixture loader for oracle comparison (test-only)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, b = line.split()[:2]
            out.append((int(a), int(b)))
    return out


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Parquet corpus of source files (repo, path, commit, lang, content).

    ``columns`` prunes at the read — e.g. edge extraction only needs
    (repo, lang, content).
    """
    return ray.data.read_parquet(path, columns=columns)


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 hex digest per string row. hashlib has no vectorized kernel;
    the per-row loop is unavoidable but C-dominated (hashing)."""
    return pa.array(
        [
            hashlib.sha256(s.encode("utf-8")).hexdigest() if s is not None else None
            for s in col.to_pylist()
        ],
        type=pa.string(),
    )


def _add_sha256(batch: pa.Table, column: str = "content") -> pa.Table:
    return batch.append_column(column + "_sha256", sha256_column(batch.column(column)))


def with_sha256(ds: ray.data.Dataset, column: str = "content") -> ray.data.Dataset:
    """Append the per-row ``{column}_sha256`` invariant column (input_hint)."""
    return ds.map_batches(
        _add_sha256, batch_format="pyarrow", fn_kwargs={"column": column}
    )
