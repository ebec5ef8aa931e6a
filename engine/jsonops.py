"""Semi-structured (JSON string) column extraction — the log-flattening
ETL pass every event pipeline runs before analytics (the `events.props`
column is exactly the nested-attribute bag production logs carry).

Scale shape: a stateless per-batch parse (stdlib ``json.loads`` — string
parsing is inherently per-row, like the tokenizers elsewhere in this
repo; no state, no broadcast) that emits a PARTIAL per-group (sum, count)
table — O(groups) rows per block, never per-event — feeding one tiny
groupby Sum, the house partial-aggregate shape. Rows with NULL JSON are
excluded on both sides (SQL: WHERE props IS NOT NULL); a parseable row
whose field is missing/null still counts toward ``n_events`` and
contributes 0 to the sum (SQL SUM skips the NULL, identically).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def json_field_sum(
    events: ray.data.Dataset,
    json_col: str = "props",
    field: str = "k",
    group_col: str = "event_type",
) -> ray.data.Dataset:
    """Per-group (SUM of an integer JSON field, row count) over a JSON
    string column. Output: (group_col, sum_<field>, n_events)."""
    from ray.data.aggregate import Sum

    sum_name = f"sum_{field}"
    empty = pa.schema(
        [
            (group_col, pa.string()),
            ("s", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def part(t: pa.Table) -> pa.Table:
        groups = t.column(group_col).to_pylist()
        raw = t.column(json_col).to_pylist()
        agg: dict = {}
        for g, p in zip(groups, raw):
            if p is None:
                continue
            v = json.loads(p).get(field)
            s, c = agg.get(g, (0, 0))
            agg[g] = (s + (int(v) if v is not None else 0), c + 1)
        if not agg:
            return empty.empty_table()
        ks = sorted(agg)
        return pa.table(
            {
                group_col: pa.array(ks, type=pa.string()),
                "s": pa.array([agg[k][0] for k in ks], type=pa.int64()),
                "n": pa.array([agg[k][1] for k in ks], type=pa.int64()),
            }
        )

    return (
        events.map_batches(part, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("s", alias_name=sum_name), Sum("n", alias_name="n_events"))
    )
