"""Checkpoint / resume (north-rule N7): kill after superstep k, resume,
final ranks identical; incomplete iterations ignored."""

import json
import os
import shutil

import numpy as np

from engine import checkpoint as ckpt
from engine.bsp import bsp_pagerank
from engine.ingest import read_snap
from engine.pagerank import pagerank

from .conftest import FIXTURES


def test_dataset_engine_resume(tmp_path):
    path = FIXTURES["small"]
    root = str(tmp_path / "ck")
    full = pagerank(read_snap(path), iterations=10)

    partial = pagerank(read_snap(path), iterations=6, checkpoint_dir=root)
    assert ckpt.completed_iterations(root) == list(range(1, 7))
    resumed = pagerank(read_snap(path), iterations=10, checkpoint_dir=root)
    # resumed from iter 6: only 4 more supersteps ran
    assert [m["iteration"] for m in resumed.metrics] == [7, 8, 9, 10]
    np.testing.assert_allclose(resumed.ranks, full.ranks, atol=1e-15)
    del partial


def test_incomplete_iteration_ignored(tmp_path):
    path = FIXTURES["mini"]
    root = str(tmp_path / "ck")
    pagerank(read_snap(path), iterations=5, checkpoint_dir=root)
    # simulate a crash mid-write of iter 5: drop its _SUCCESS
    os.remove(os.path.join(root, "iter=5", "_SUCCESS"))
    assert ckpt.completed_iterations(root) == [1, 2, 3, 4]
    resumed = pagerank(read_snap(path), iterations=5, checkpoint_dir=root)
    assert [m["iteration"] for m in resumed.metrics] == [5]
    full = pagerank(read_snap(path), iterations=5)
    np.testing.assert_allclose(resumed.ranks, full.ranks, atol=1e-15)


def test_lineage_metadata(tmp_path):
    root = str(tmp_path / "ck")
    pagerank(read_snap(FIXTURES["mini"]), iterations=2, checkpoint_dir=root)
    with open(os.path.join(root, "iter=2", "metrics.json")) as f:
        meta = json.load(f)
    assert meta["iteration"] == 2
    assert meta["metrics"]["l1_residual"] > 0
    parts = meta["partitions"]
    assert sum(p["rows"] for p in parts) == 10
    assert all("content_hash" in p and "vid_range" in p for p in parts)


def test_bsp_engine_resume(tmp_path):
    path = FIXTURES["small"]
    root = str(tmp_path / "ck")
    full = bsp_pagerank(read_snap(path), iterations=10, num_shards=3)
    bsp_pagerank(read_snap(path), iterations=6, num_shards=3, checkpoint_dir=root)
    resumed = bsp_pagerank(
        read_snap(path), iterations=10, num_shards=3, checkpoint_dir=root
    )
    assert [m["iteration"] for m in resumed.metrics] == [7, 8, 9, 10]
    np.testing.assert_allclose(resumed.ranks, full.ranks, atol=1e-15)
    # BSP lineage: one parquet per shard per iteration
    with open(os.path.join(root, "iter=6", "metrics.json")) as f:
        meta = json.load(f)
    assert len(meta["partitions"]) == 3
    assert sum(p["rows"] for p in meta["partitions"]) == 43
    assert meta["num_shards"] == 3 and meta["num_vertices"] == 43


def test_bsp_resume_rejects_mismatched_shard_count(tmp_path):
    import pytest

    path = FIXTURES["mini"]
    root = str(tmp_path / "ck")
    bsp_pagerank(read_snap(path), iterations=3, num_shards=3, checkpoint_dir=root)
    with pytest.raises(ValueError, match="num_shards"):
        bsp_pagerank(read_snap(path), iterations=5, num_shards=2,
                     checkpoint_dir=root)
