"""PageRank power iteration over an edge DataFrame — the crawl-frontier
PRIORITIZATION signal (generalizes the reference's FIFO drain order,
master.go job queue: a production crawler drains high-rank hosts/pages
first — politeness.schedule(priority=...) consumes exactly such a rank
column as its per-host order key, budgets and sub-round slicing
unchanged; tests/test_politeness_schedule.py exercises the pairing).

Semantics: the classic simple power iteration,
    rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u) / outdeg(u)
over N = |distinct nodes|; dangling mass is dropped (the Spark-examples
variant), so ranks need not sum to 1 — callers ranking a frontier only
need the ORDER. Deterministic across engines at 6 dp (the DuckDB oracle
renders the identical iteration as chained CTEs; float association noise
is ~1e-15 relative, far below the rounding).

Scale shape (100 TB): `edges` is joined BY src every iteration — a real
deployment pre-partitions/buckets the edge table on src once so every
iteration's join is co-located (same discipline as plans/frontier's
bucketed seen set); the per-iteration shuffle is then only the
contribution aggregate keyed by dst. The out-degree table rides inside
the same persisted edge projection (degree join, broadcastable when the
host graph is small). Iteration state is one (node, rank) frame,
persisted per step and released when superseded — lineage is truncated
with the same tracked localCheckpoint used by operators/bfs.py, so deep
iteration counts neither grow plans nor pin O(iters) caches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bfs import IterationState


def pagerank(
    edges: DataFrame,
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """edges: (src string, dst string), duplicates allowed (parallel edges
    contribute multiplicity, matching the SQL oracle). Returns
    (url string, rank double) for every node, rank UNROUNDED — callers
    compare/rank on a rounded projection."""
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("url"))
        .unionByName(edges.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # materializes both persisted frames
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame([], "url string, rank double")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
    # contribution edges with the degree folded in: built once, reused by
    # every iteration (at scale: bucketed by src, degree join co-located)
    contrib_edges = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).persist()
    contrib_edges.count()
    edges.unpersist()
    deg.unpersist()

    base = (1.0 - damping) / n
    st = IterationState(checkpoint_every)
    ranks = st.step(nodes.select("url", F.lit(1.0 / n).alias("rank")), 1)
    for it in range(1, n_iters + 1):
        contribs = (
            contrib_edges.join(ranks.withColumnRenamed("url", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
        )
        ranks = st.step(
            nodes.join(contribs.withColumnRenamed("dst", "url"), "url", "left").select(
                "url",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                    "rank"
                ),
            ),
            it,
        )
    out = st.finish(ranks)
    nodes.unpersist()
    contrib_edges.unpersist()
    return out
