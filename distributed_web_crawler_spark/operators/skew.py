"""Explicit key salting for skewed aggregation (SURVEY.md §4; the fixture
corpus deterministically remaps every 10th page to host 0 to create a
mega-host).

Two-phase salted aggregation: partial-aggregate on (key, salt) so a hot
key's rows spread over `n_salts` reducers, then final-aggregate on key.
Result is identical to the direct groupBy (the oracle SQL is the plain
GROUP BY); the benefit is the shuffle histogram — no single reducer owns
the mega-key. Catalyst's hash aggregate already does map-side partials,
so this matters when a key's PARTIAL results are themselves too hot (e.g.
high-cardinality aggregation state or AQE-resistant sinks); it is the
hand-rolled analog of AQE skew-join splitting, applied to aggregations."""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    aggs: List[Column],
    finals: List[Column],
    salt_cols: List[str] | None = None,
) -> DataFrame:
    """aggs: partial aggregate columns (aliased); finals: matching final
    re-aggregations over the partial names (aliased to output names).
    The salt defaults to monotonically_increasing_id alone: it is free
    (no per-row hashing), spreads EXACT-DUPLICATE rows of a hot key (which
    carry no distinguishing data for a hash to chew on), and the final
    aggregate is salt-invariant by construction, so results are
    deterministic even though the id is position-dependent. Callers that
    want content-affine salting (e.g. to co-locate identical rows for a
    downstream distinct) opt in via `salt_cols`; hashing every column by
    default measurably dominated the aggregation cost on wide tables."""
    mid = F.monotonically_increasing_id()
    # XOR, not +: xxhash64 spans the full int64 range and ANSI mode would
    # throw on additive overflow
    mix = F.xxhash64(*[F.col(c) for c in salt_cols]).bitwiseXOR(mid) if salt_cols else mid
    salted = df.withColumn("_salt", F.pmod(mix, F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    return partial.groupBy(key).agg(*finals)


def salted_host_counts(lineitem: DataFrame, n_salts: int = 8) -> DataFrame:
    """Demo on the TPC-H-ish tables: per-supplier row counts + revenue with
    salting, byte-identical to the direct GROUP BY."""
    return salted_agg(
        lineitem,
        "l_suppkey",
        n_salts,
        aggs=[
            F.count("*").alias("_n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        ],
        finals=[
            F.sum("_n").alias("n_rows"),
            F.round(F.sum("_rev"), 2).alias("revenue"),
        ],
    )
