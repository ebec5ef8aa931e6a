"""Canonical pyarrow schemas for every table the engine produces/consumes.

Data model mapping (SURVEY.md §1.5):

- ``CORPUS``  — the primary input per BASELINE.json ``input_hint``: one row
  per source file of a repository corpus.
- ``EDGES``   — directed edge table, dense ``uint64`` vertex ids
  (ref: the implicit edge representation in ``src/Graph.cpp:92-97``).
- ``VERTICES``— vertex dictionary: dense ``vid`` ↔ original id. Deterministic
  sort-by-id assignment, NOT the reference's first-appearance order
  (ref quirk: ``src/Graph.cpp:60-91``; see SURVEY.md §7.6).
- ``DEGREES`` — out-degree per vertex (ref: ``Node::nlinks_out``,
  ``src/Graph.cpp:16-24``).
- ``RANKS``   — PageRank state, one float64 per vertex
  (ref: ``src/Graph.hpp:17``, ``rank_t = double`` at ``src/Graph.hpp:11``).
- ``LABELS``  — connected-component / community labels (north-rule N4/N5).
"""

from __future__ import annotations

import pyarrow as pa

# Damping factor and the reference's per-vertex freeze threshold
# (ref: src/Graph.hpp:8-9 — D = 0.85, DELTA = 1e-16).
DAMPING = 0.85
REF_DELTA = 1e-16

CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

CORPUS_HASHED = CORPUS.append(pa.field("content_sha256", pa.string()))

EDGES = pa.schema([("src", pa.uint64()), ("dst", pa.uint64())])

EDGES_STR = pa.schema([("src_repo", pa.string()), ("dst_repo", pa.string())])

VERTICES = pa.schema([("vid", pa.uint64()), ("id", pa.string())])

DEGREES = pa.schema([("vid", pa.uint64()), ("outdeg", pa.uint64())])

RANKS = pa.schema([("vid", pa.uint64()), ("rank", pa.float64())])

LABELS = pa.schema([("vid", pa.uint64()), ("label", pa.uint64())])
