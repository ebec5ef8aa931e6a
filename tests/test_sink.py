"""Resumable partitioned-Parquet sink: atomic buckets, skip-on-resume."""

import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data

from engine.sink import finished_buckets, read_partitioned, write_parquet_resumable


def _ds(n=200):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "val": pa.array(np.arange(n) * 3),
            }
        )
    ).repartition(5)


def _read_sorted(out):
    return (
        read_partitioned(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_sink_roundtrip(tmp_path):
    out = str(tmp_path / "out")
    stats = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    assert stats["rows_written"] == 200 and stats["skipped"] == []
    assert finished_buckets(out) == set(stats["written"])
    df = _read_sorted(out)
    assert df["doc_id"].tolist() == list(range(200))
    assert (df["val"].to_numpy() == np.arange(200) * 3).all()


def test_sink_resume_skips_finished(tmp_path):
    out = str(tmp_path / "out")
    first = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    # simulate a failed run: two buckets lost, one left partially written
    lost = first["written"][:2]
    for k in lost:
        shutil.rmtree(os.path.join(out, f"bucket={k}"))
    partial = first["written"][2]
    os.remove(os.path.join(out, f"bucket={partial}", "_SUCCESS"))

    second = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    # only the lost + partial buckets are rewritten; the rest are skipped
    assert sorted(second["written"]) == sorted(lost + [partial])
    assert set(second["skipped"]) == set(first["written"]) - set(lost + [partial])
    df = _read_sorted(out)
    assert df["doc_id"].tolist() == list(range(200))
