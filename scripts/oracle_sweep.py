"""Driver-faithful oracle sweep at an arbitrary SF dir (default sf0.01).

Round-end correctness lock helper: runs every (or the named) queries()
entry on Spark and its oracle_sql() on DuckDB over the SAME parquet dir,
comparing column names, row count, and the driver's dtype-sensitive
canonical hash (the exact `_canon_hash` from tests/test_queries_vs_duckdb
— sort columns by name, mergesort rows over all columns, hash the
dtype-sensitive CSV rendering). Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/oracle_sweep.py [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from tests.test_queries_vs_duckdb import TABLES, _canon_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    from distributed_web_crawler_spark.session import get_spark

    spark = get_spark(app="oracle_sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    queries, oracles = E.queries(), E.oracle_sql()
    names = sys.argv[1:] or sorted(queries)
    bad = 0
    for name in names:
        spdf = queries[name](spark, SF_DIR).toPandas()
        opdf = con.sql(oracles[name]).fetchdf()
        cols_ok = sorted(spdf.columns) == sorted(opdf.columns)
        rows_ok = len(spdf) == len(opdf)
        hash_ok = cols_ok and rows_ok and _canon_hash(spdf) == _canon_hash(opdf)
        ok = cols_ok and rows_ok and hash_ok
        bad += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: rows {len(spdf)}/{len(opdf)}"
              f" cols={cols_ok} hash={hash_ok}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    print(f"{len(names) - bad}/{len(names)} green")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
