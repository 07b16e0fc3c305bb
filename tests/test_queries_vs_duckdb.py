"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir;
compare row count, column names, and an order-insensitive value hash.

HARNESS-FAITHFUL canonicalization (the r6 lesson): the driver compares
pandas frames — `toPandas()` / `fetchdf()`, columns sorted by name, rows
sorted with `sort_values` over all columns, and a DTYPE-SENSITIVE value
hash. The previous gate's `fetchall()` + `str()` normalization collapsed
exactly the two failure classes that shipped red in r6: DuckDB's window
`sum(BIGINT)` → HUGEINT → float64 (`123.0` hashes != `123`), and a
list-valued column (the driver's `sort_values` dies on unhashable
cells). This gate reproduces both behaviors, and the planted-failure
tests below pin that it keeps doing so."""

import hashlib

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_hash(pdf: pd.DataFrame) -> str:
    """Driver-faithful canonical hash of a result frame: sort columns by
    name, sort rows by every column (raises TypeError on unhashable
    cells, e.g. lists — same as the driver's canonicalizer), then hash
    the dtype-sensitive rendering (float64 123.0 renders '123.0' while
    int64 renders '123', so a HUGEINT-induced float dtype mismatches)."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
        pdf = pdf.reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def _compare_frames(name: str, spdf: pd.DataFrame, opdf: pd.DataFrame):
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: columns {list(spdf.columns)} vs {list(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), f"{name}: rows {len(spdf)} vs {len(opdf)}"
    sh, oh = _canon_hash(spdf), _canon_hash(opdf)
    if sh != oh:  # localize the first differing cell for the assert message
        a = spdf[sorted(spdf.columns)].sort_values(
            by=sorted(spdf.columns), kind="mergesort").reset_index(drop=True)
        b = opdf[sorted(opdf.columns)].sort_values(
            by=sorted(opdf.columns), kind="mergesort").reset_index(drop=True)
        detail = ""
        for c in a.columns:
            if a[c].dtype != b[c].dtype:
                detail += f" dtype[{c}]: spark={a[c].dtype} oracle={b[c].dtype};"
            neq = (a[c].astype(str) != b[c].astype(str))
            if neq.any():
                i = int(neq.idxmax())
                detail += (f" first diff [{c}] row {i}:"
                           f" spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r};")
        raise AssertionError(f"{name}: value hash mismatch —{detail or ' (dtype-level only)'}")


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
    spdf = E.queries()[name](spark, SF_DIR).toPandas()
    opdf = con.sql(oracle).fetchdf()
    _compare_frames(name, spdf, opdf)


def test_entry_smoke(spark):
    df = E.entry(spark)
    n = df.count()
    assert n > 0 and set(df.columns) == {"url", "depth"}


# ---------------------------------------------------------- planted failures
#
# The gate must FAIL on the two r6 escape classes; if either planted
# check starts passing, the canonicalization has gone str()-blind again.


def test_gate_catches_hugeint_dtype(con):
    """A window sum(BIGINT) in DuckDB comes back HUGEINT → float64 in
    pandas; an engine producing int64 must hash-mismatch, even though
    str() of every value is numerically equal."""
    opdf = con.sql(
        "SELECT g, sum(CAST(v AS BIGINT)) OVER (ORDER BY g) AS s "
        "FROM (VALUES (1, 10), (2, 20)) t(g, v)"
    ).fetchdf()
    assert opdf["s"].dtype == "float64", "planted HUGEINT no longer maps to float64"
    spark_like = pd.DataFrame({"g": [1, 2], "s": pd.array([10, 30], dtype="int64")})
    with pytest.raises(AssertionError, match="hash mismatch"):
        _compare_frames("planted_hugeint", spark_like, opdf)


def test_gate_dies_on_array_column(con):
    """A list-valued column must raise in canonicalization (the driver's
    sort_values dies on unhashable cells) — queries must never return
    array columns to the harness."""
    opdf = con.sql("SELECT 1 AS cell, [1.0, 2.0] AS centroid").fetchdf()
    with pytest.raises(TypeError):
        _canon_hash(pd.concat([opdf, opdf], ignore_index=True))
