"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query — the frontier engine's BFS
round loop (anti-join first-discovery dedup, per-depth barrier) over the
order↔part graph of the sf0.001 testdata. ``queries()``/``oracle_sql()``
expose every implemented operator slice (SURVEY.md §2 + training-data
pipeline ops) with DuckDB-checkable oracles; see
distributed_web_crawler_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from distributed_web_crawler_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: frontier BFS (depth 3,
    first-discovery dedup) over the order↔part graph."""
    return Q.q_bfs_frontier(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
