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


def test_sink_manifest_rejects_incompatible_resume(tmp_path):
    import pytest

    out = str(tmp_path / "out")
    write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=4)
    with pytest.raises(ValueError, match="resume mismatch"):
        write_parquet_resumable(_ds(), out, key_col="val", num_buckets=8)
    # same parameters still resume fine
    stats = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    assert stats["written"] == [] and stats["rows_written"] == 0


def test_sink_ignores_stale_tmp_dirs(tmp_path):
    out = str(tmp_path / "out")
    first = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    # a crashed run can leave bucket=K.tmp behind, even with _SUCCESS inside
    stale = os.path.join(out, "bucket=3.tmp")
    os.makedirs(stale)
    open(os.path.join(stale, "_SUCCESS"), "w").close()
    assert finished_buckets(out) == set(first["written"])  # .tmp not parsed
    second = write_parquet_resumable(_ds(), out, key_col="doc_id", num_buckets=8)
    assert second["written"] == []
    assert not os.path.exists(stale)  # swept on resume
    assert _read_sorted(out)["doc_id"].tolist() == list(range(200))


def test_read_partitioned_empty_raises(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no committed buckets"):
        read_partitioned(str(tmp_path / "never_written"))


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
