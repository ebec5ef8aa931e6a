"""CSV source + sink — the lowest-common-denominator interchange format.

Same shape as engine/jsonl.py: the sink writes one part file per block
through the pandas C serializer (quoting handles embedded newlines,
quotes and commas), the source is ``ray.data.read_csv`` over pyarrow's
multithreaded C parser with ``newlines_in_values`` enabled so quoted
multi-line text fields survive the roundtrip. Part names are content
hashes and the write is rename-over (idempotent under Ray task retry);
the read skips anything that is not ``*.csv``.

Caveats (inherent to CSV, not to this engine): the format cannot
distinguish NULL from the empty string, and per-file type inference can
drift when a part's string column happens to look numeric — pass
``schema=`` to :func:`read_csv` (the roundtrip query pins the writer's
schema) or prefer JSONL/Parquet. No reference analog.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pandas as pd
import pyarrow as pa
import ray.data


def write_csv(ds: ray.data.Dataset, out_dir: str, clean: bool = False) -> int:
    """Distributed CSV sink: one headered ``part-*.csv`` per non-empty
    block, written atomically with a content-hash name (retries rewrite
    the same file). Pass ``clean=True`` for reproducible directories
    when writing a different dataset into the same path. Executes
    eagerly; returns rows written."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype="int64")})
        data = df.to_csv(index=False).encode("utf-8")
        name = hashlib.sha256(data).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}.csv")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.rename(tmp, path)
        return pd.DataFrame({"rows": [len(df)]})

    summary = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_csv(path: str, schema: pa.Schema | None = None) -> ray.data.Dataset:
    """CSV source via pyarrow's C parser; quoted embedded newlines are
    honored (``newlines_in_values``). Pass ``schema`` to pin column
    types — per-file inference can type an all-numeric-looking string
    part as int64 and then fail schema unification across parts."""
    import pyarrow.csv as pacsv

    kwargs = {}
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        )
    return ray.data.read_csv(
        path,
        file_extensions=["csv"],
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        **kwargs,
    )
