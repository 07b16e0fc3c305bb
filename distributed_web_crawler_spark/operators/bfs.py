"""Generic BFS over an edge DataFrame — the frontier engine's core loop
(anti-join first-discovery dedup, per-depth barrier) applied to any graph,
used by the driver-harness flagship query and cross-checked against a
DuckDB recursive CTE.

Same shape as plans/frontier.py rounds (SURVEY.md §3.1): per depth, expand
the frontier through an equi-join on src, dedup within the round
(dropDuplicates ≡ U3 map-overwrite), anti-join the cumulative seen set
(U2), stop when the frontier empties or max_depth is reached (F3). The
min-depth/first-discovery equivalence is what makes a from-scratch rerun
and a mid-point resume agree (SURVEY.md §3.3).

Scale: the per-round join shuffles edges by src once; for repeated rounds a
real deployment pre-partitions (buckets) the edge table by src so every
round's join is co-located, and the seen anti-join uses the Bloom path
(functions/bloom.py). localCheckpoint truncates the growing union lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bfs(edges: DataFrame, seed: DataFrame, max_depth: int, checkpoint_every: int = 4) -> DataFrame:
    """edges: (src string, dst string); seed: (url string) single row.
    Returns (url string, depth int) — first-discovery depth per reached node,
    depths 0..max_depth.

    Plan shape: edges are persisted once and probed with a BROADCAST of the
    (small) frontier each round — the big side never shuffles; the only
    exchanges are the frontier dedup and the anti-join against the (also
    small) seen set, both broadcast-sized. A frontier too large to broadcast
    flips to the frontier-engine path (bucketed edges + shuffled hash join
    + Bloom seen filters, plans/frontier.py)."""
    edges = edges.persist()
    seen = seed.select(F.col("url"), F.lit(0).alias("depth")).persist()
    frontier = seen
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(F.broadcast(frontier.select(F.col("url").alias("src"))), "src")
            .select(F.col("dst").alias("url"))
            .dropDuplicates(["url"])
            .join(F.broadcast(seen.select("url")), "url", "left_anti")
            .withColumn("depth", F.lit(d))
            .persist()
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt)
        if d % checkpoint_every == 0:
            seen = seen.localCheckpoint()
        seen = seen.persist()
        frontier = nxt
    edges.unpersist()
    return seen
