"""The pagerank 100-TB layout claim, demonstrated (r5 VERDICT Next #4):
with the contribution edges written BUCKETED+SORTED by src, the
per-iteration join scans them with `Bucketed: true` and no edge-side
Exchange or Sort — only the rank side moves — and the result is
numerically identical to the unbucketed pagerank()."""

import re

from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators.pagerank import (
    contrib_edges_of,
    iteration_contribs,
    pagerank,
    pagerank_on_table,
    write_edges_bucketed,
)

N_BUCKETS = 8


def _edges(spark):
    rows = [(f"n{i}", f"n{(i * 7 + j) % 40}") for i in range(40) for j in range(1 + i % 3)]
    return spark.createDataFrame(rows, "src string, dst string")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_iteration_has_no_edge_side_exchange(spark, tmp_path):
    edges = _edges(spark)
    write_edges_bucketed(edges, "pr_edges_plan", n_buckets=N_BUCKETS, path=str(tmp_path / "t"))
    # r9c: the iteration join consumes the per-src score frame
    # (src, rankw = rank·w) built by iteration_scores — the edge side is
    # raw (src, dst) pairs with no w column
    scores = spark.createDataFrame(
        [(f"n{i}", 1.0 / 40) for i in range(40)], "src string, rankw double"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_ord = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    try:
        # force the at-scale join strategy (both sides big -> sort-merge);
        # a broadcast would make the no-shuffle claim trivially vacuous.
        # The legacy flag lets the planner trust the one-file-per-bucket
        # sortBy metadata (off by default since 3.0 — costs a listing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        bucketed = _plan(iteration_contribs(spark.table("pr_edges_plan"), scores))
        flat = _plan(iteration_contribs(contrib_edges_of(edges), scores))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", old_ord)
        spark.sql("DROP TABLE IF EXISTS pr_edges_plan")

    # the scan itself advertises the bucketing
    assert "Bucketed: true" in bucketed
    # EXACTLY two exchanges remain: the inflow side into the join, and the
    # dst aggregate — the edge side never moves. The flat layout also pays
    # the edge-side exchange (plus the out-degree aggregate it rebuilds).
    n_ex_bucketed = len(re.findall(r"Exchange hashpartitioning", bucketed))
    n_ex_flat = len(re.findall(r"Exchange hashpartitioning", flat))
    assert n_ex_bucketed == 2, bucketed
    assert n_ex_flat > n_ex_bucketed, (n_ex_bucketed, n_ex_flat)
    # r9: the iteration joins shuffled-hash on the inflow side (guide §3.1)
    # — NO Sort anywhere: the edge side streams unsorted and the O(nodes)
    # inflow side is the build side (stronger than the old SMJ shape, which
    # needed a score-side Sort even over the sorted buckets)
    assert "ShuffledHashJoin" in bucketed, bucketed
    assert bucketed.count("Sort [src") == 0, bucketed


def test_pagerank_on_table_matches_flat(spark, tmp_path):
    edges = _edges(spark)
    write_edges_bucketed(edges, "pr_edges_par", n_buckets=N_BUCKETS, path=str(tmp_path / "t2"))
    try:
        flat = {
            r["url"]: r["rank"]
            for r in pagerank(edges, n_iters=3).select("url", F.round("rank", 6).alias("rank")).collect()
        }
        buck = {
            r["url"]: r["rank"]
            for r in pagerank_on_table(spark, "pr_edges_par", n_iters=3)
            .select("url", F.round("rank", 6).alias("rank"))
            .collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_par")
    assert flat == buck
