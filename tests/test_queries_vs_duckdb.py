"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir;
compare row count, column names, and an order-insensitive value hash."""

import hashlib
import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def _row_hashes(cols, rows):
    out = []
    for row in rows:
        cells = dict(zip(cols, row))
        s = "|".join(f"{c}={_norm_cell(cells[c])}" for c in sorted(cols))
        out.append(hashlib.md5(s.encode()).hexdigest())
    return sorted(out)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    oracle = E.oracle_sql().get(name)
    assert oracle is not None, f"{name}: no oracle registered"
    sdf = E.queries()[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.sql(oracle)
    drows = res.fetchall()
    dcols = [d[0] for d in res.description]
    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    sh, dh = _row_hashes(scols, srows), _row_hashes(dcols, drows)
    assert sh == dh, f"{name}: value hash mismatch"


def test_entry_smoke(spark):
    df = E.entry(spark)
    n = df.count()
    assert n > 0 and set(df.columns) == {"url", "depth"}
