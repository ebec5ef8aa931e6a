"""Column-level data-quality profiling — the "describe" / validation
report an ingestion pipeline runs before anything else touches a new
100-TB drop: row count, per-column null counts, empty-string counts,
exact distinct counts of the categorical columns, numeric min/max.

All metrics stream: counts ride a per-batch combiner (one O(metrics)
partial row per batch), min/max use Ray's native aggregates, and exact
distinct counts use the house sort-based DISTINCT
(``graph._sorted_distinct_refs`` — Ray 2.49's hash aggregate is ~100×
slower at ≥10M rows). The result is O(metrics) rows, assembled
driver-side from scalars only — never row data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Max, Min, Sum

from . import graph as G


def table_profile(
    ds: ray.data.Dataset,
    null_cols: list,
    empty_text_cols: list,
    distinct_cols: list,
    minmax_cols: list,
) -> pd.DataFrame:
    """Long-format (metric, value) quality profile. Metrics: ``rows``,
    ``null_<col>``, ``empty_<col>`` (zero-length non-null strings),
    ``distinct_<col>`` (exact), ``min_<col>`` / ``max_<col>``."""

    def partial(t: pa.Table) -> pa.Table:
        out = {"rows": [len(t)]}
        for c in null_cols:
            out[f"null_{c}"] = [t.column(c).null_count]
        for c in empty_text_cols:
            col = t.column(c)
            out[f"empty_{c}"] = [
                int(
                    pc.sum(
                        pc.equal(pc.utf8_length(pc.drop_null(col)), 0)
                    ).as_py()
                    or 0
                )
            ]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(
            *[
                Sum(c, alias_name=c)
                for c in ["rows"]
                + [f"null_{c}" for c in null_cols]
                + [f"empty_{c}" for c in empty_text_cols]
            ]
        )
    )
    metrics = dict(sums)
    if minmax_cols:
        mm = ds.aggregate(
            *(
                [Min(c, alias_name=f"min_{c}") for c in minmax_cols]
                + [Max(c, alias_name=f"max_{c}") for c in minmax_cols]
            )
        )
        metrics.update(mm)
    for c in distinct_cols:
        _refs, counts = G._sorted_distinct_refs(
            # arrow-normalize: a pandas-blocked source would surface
            # DataFrames to _sorted_distinct_refs' raw block reads
            ds.select_columns([c]).map_batches(
                lambda t: t, batch_format="pyarrow"
            ),
            c,
        )
        metrics[f"distinct_{c}"] = int(sum(counts))
    return pd.DataFrame(
        {
            "metric": list(metrics.keys()),
            "value": np.array([int(v) for v in metrics.values()], np.int64),
        }
    ).sort_values("metric").reset_index(drop=True)
