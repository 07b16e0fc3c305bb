"""Portable 60-bit hash — identical in Spark and DuckDB, used wherever an
operator's oracle SQL must reproduce engine hashing exactly (MinHash,
SimHash, fingerprints).

Construction: first 15 hex chars of md5 → 60-bit non-negative BIGINT.
Spark:  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)
(xxhash64 stays the engine-internal key — it is not available in DuckDB.)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB-side rendering of the same hash."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
