"""CSV source + sink — the lowest-common-denominator interchange format.

Same shape as engine/jsonl.py: the sink writes one part file per block
through the pandas C serializer (quoting handles embedded newlines,
quotes and commas), the source is ``ray.data.read_csv`` over pyarrow's
multithreaded C parser with ``newlines_in_values`` enabled so quoted
multi-line text fields survive the roundtrip.

Caveat (inherent to CSV, not to this engine): the format cannot
distinguish NULL from the empty string — callers with nullable string
columns should prefer JSONL/Parquet. No reference analog.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import ray.data


def write_csv(ds: ray.data.Dataset, out_dir: str, clean: bool = False) -> int:
    """Distributed CSV sink: one headered ``part-*.csv`` per non-empty
    block, written atomically. Pass ``clean=True`` for reproducible
    directories (names carry a uuid, re-runs otherwise accumulate).
    Executes eagerly; returns rows written."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype="int64")})
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:16]}.csv")
        tmp = path + ".tmp"
        df.to_csv(tmp, index=False)
        os.rename(tmp, path)
        return pd.DataFrame({"rows": [len(df)]})

    summary = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return int(summary["rows"].sum()) if len(summary) else 0


def read_csv(path: str) -> ray.data.Dataset:
    """CSV source via pyarrow's C parser; quoted embedded newlines are
    honored (``newlines_in_values``)."""
    import pyarrow.csv as pacsv

    return ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
    )
