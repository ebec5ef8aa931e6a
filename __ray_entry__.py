"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the SQL-checkable operator slices (SURVEY.md §2.4)
implemented in ``engine.queries``. Ray is initialised by the driver before
this module is imported — nothing here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: lineitem-projected bipartite link graph at sf0.001 →
    10 PageRank supersteps → full rank table (vid, rank)."""
    from engine.queries import pagerank10

    return pagerank10("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from engine.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from engine.queries import ORACLE_SQL

    return {k: v for k, v in ORACLE_SQL.items() if v is not None}
