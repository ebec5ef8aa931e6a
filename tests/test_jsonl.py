"""JSONL source/sink (engine/jsonl.py) + canonical dedup (engine/dedup.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from engine.dedup import canonical_dedup
from engine.jsonl import read_jsonl, write_jsonl


def test_jsonl_roundtrip_tricky_strings(tmp_path):
    """Sink → source preserves rows exactly: newlines, quotes, unicode,
    backslashes, nulls, negative ints — across many blocks."""
    df = pd.DataFrame(
        {
            "id": np.arange(8, dtype=np.int64) - 3,
            "text": [
                'line1\nline2\t"quoted"',
                "unicode: žößé→漢",
                "back\\slash and / slash",
                "",
                None,
                " leading and trailing ",
                "{json: looking}",
                "plain",
            ],
        }
    )
    out = str(tmp_path / "jsonl")
    n = write_jsonl(rd.from_pandas(df).repartition(5), out, clean=True)
    assert n == len(df)
    back = read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    want = df.sort_values("id").reset_index(drop=True)
    assert back["id"].tolist() == want["id"].tolist()
    assert back["text"].where(back["text"].notna(), None).tolist() == \
        want["text"].where(want["text"].notna(), None).tolist()


def test_jsonl_clean_vs_accumulate(tmp_path):
    df = pd.DataFrame({"x": np.arange(4, dtype=np.int64)})
    df2 = pd.DataFrame({"x": np.arange(4, 8, dtype=np.int64)})
    out = str(tmp_path / "acc")
    write_jsonl(rd.from_pandas(df), out)
    # content-hash part names: rewriting IDENTICAL content is idempotent
    # (the Ray-task-retry guarantee), it does not duplicate rows
    write_jsonl(rd.from_pandas(df), out)
    assert read_jsonl(out).count() == 4
    write_jsonl(rd.from_pandas(df2), out)  # different content accumulates
    assert read_jsonl(out).count() == 8
    write_jsonl(rd.from_pandas(df), out, clean=True)  # resets
    assert read_jsonl(out).count() == 4


def test_jsonl_timestamp_and_float_fidelity(tmp_path):
    """Timestamps roundtrip at microsecond precision (ISO), floats at
    the serializer's max precision — the events-shaped columns."""
    from pandas.api.types import is_datetime64_any_dtype

    df = pd.DataFrame(
        {
            "id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime(
                ["2026-01-02 03:04:05.123456", "1999-12-31 23:59:59.999999",
                 "2000-01-01 00:00:00.000001"]
            ),
            "v": [1.5, 0.123456789012345, -2e10],
        }
    )
    import pyarrow as pa

    out = str(tmp_path / "fid")
    write_jsonl(rd.from_pandas(df), out, clean=True)
    schema = pa.schema(
        [("id", pa.int64()), ("ts", pa.timestamp("us")), ("v", pa.float64())]
    )
    back = (
        read_jsonl(out, schema=schema)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert is_datetime64_any_dtype(back["ts"])
    assert (pd.to_datetime(back["ts"]) == df["ts"]).all()
    np.testing.assert_allclose(back["v"], df["v"], rtol=1e-14)


def test_canonical_dedup_groups_case_and_whitespace():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "Hello  World",
                "hello world",
                "  HELLO\tWORLD \n",
                "hello worlds",  # different canonical form
                "Hello  World",
                "unique doc",
            ],
        }
    )
    out = canonical_dedup(rd.from_pandas(df).repartition(3)).to_pandas()
    by_id = out.set_index("doc_id")["dup_count"].to_dict()
    # docs 0,1,2,4 share one canonical form -> survivor 0 with count 4
    assert by_id == {0: 4, 3: 1, 5: 1}


def test_csv_roundtrip_tricky_strings(tmp_path):
    """CSV sink → source preserves rows: embedded newlines, commas,
    quotes, unicode — across many blocks (quoted fields + pyarrow
    newlines_in_values)."""
    from engine.csvio import read_csv, write_csv

    df = pd.DataFrame(
        {
            "id": np.arange(6, dtype=np.int64),
            "text": [
                'line1\nline2,with,"commas"',
                "unicode: žöß→漢",
                " leading/trailing ",
                "a,b,c",
                'only "quotes"',
                "plain",
            ],
        }
    )
    out = str(tmp_path / "csv")
    n = write_csv(rd.from_pandas(df).repartition(4), out, clean=True)
    assert n == len(df)
    back = read_csv(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["text"].tolist() == df["text"].tolist()
    assert back["id"].tolist() == df["id"].tolist()


def test_jsonl_gzip_roundtrip(tmp_path):
    """gzip-compressed JSONL parts roundtrip (the shipped-corpus form)."""
    from engine.jsonl import read_jsonl, write_jsonl

    df = pd.DataFrame(
        {
            "id": np.arange(7, dtype=np.int64),
            "text": [f"doc {i}\nsecond line ü{i}" for i in range(7)],
        }
    )
    out = str(tmp_path / "gz")
    n = write_jsonl(
        rd.from_pandas(df).repartition(3), out, clean=True, compression="gzip"
    )
    assert n == 7
    import glob

    parts = glob.glob(out + "/*.jsonl.gz")
    assert parts  # compressed parts on disk
    back = read_jsonl(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert back["text"].tolist() == df["text"].tolist()
    with pytest.raises(ValueError):
        write_jsonl(rd.from_pandas(df), out, compression="zstd")


def test_csv_schema_pins_numeric_looking_strings(tmp_path):
    """A part whose string column is all numeric-looking must come back
    as strings when the writer's schema is pinned (per-file inference
    would type it int64 and break unification / the roundtrip)."""
    import pyarrow as pa

    from engine.csvio import read_csv, write_csv

    df = pd.DataFrame(
        {
            "id": np.arange(4, dtype=np.int64),
            "text": ["123", "456", "789", "007"],  # all numeric-looking
        }
    )
    out = str(tmp_path / "numeric")
    write_csv(rd.from_pandas(df), out, clean=True)
    schema = pa.schema([("id", pa.int64()), ("text", pa.string())])
    back = (
        read_csv(out, schema=schema)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert back["text"].tolist() == ["123", "456", "789", "007"]  # "007" intact
