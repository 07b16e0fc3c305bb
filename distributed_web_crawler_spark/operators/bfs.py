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


def _local_checkpoint(df: DataFrame, tracked: list) -> DataFrame:
    """Eager localCheckpoint that CAPTURES the checkpoint's block-holding
    RDD handle into `tracked`. DataFrame.unpersist releases only the
    CacheManager entry — a localCheckpoint's materialized blocks are an
    RDD-level cache that survives it — so superseded generations must be
    dropped through this handle or a deep crawl accumulates O(depth)
    checkpoint block sets. The handle is read off the checkpointed frame's
    own LogicalRDD (never by diffing the context-global persistent-RDD
    map, which would capture — and later unpersist — frames a CONCURRENT
    thread persisted; for another localCheckpoint holder those blocks are
    its only data source). Releasing a handle makes ITS frame
    unrecoverable, so callers release only strictly-superseded
    generations."""
    out = df.localCheckpoint()
    tracked.append(out._jdf.queryExecution().logical().rdd())
    return out


def _release(handles: list) -> None:
    for h in handles:
        h.unpersist(False)
    handles.clear()


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
    handles = [seen]  # persisted generations, released at each checkpoint
    cp_blocks: list = []  # superseded localCheckpoint block RDD handles
    for d in range(1, max_depth + 1):
        nxt = (
            edges.join(F.broadcast(frontier.select(F.col("url").alias("src"))), "src")
            .select(F.col("dst").alias("url"))
            .dropDuplicates(["url"])
            .join(F.broadcast(seen.select("url")), "url", "left_anti")
            .withColumn("depth", F.lit(d))
            .persist()
        )
        handles.append(nxt)
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt)
        frontier = nxt
        if d % checkpoint_every == 0:
            # the eager localCheckpoint materializes `seen` independent of
            # every earlier cached generation — release them all (plus the
            # PREVIOUS checkpoint's blocks, now folded into this one); a
            # deep crawl through this helper would otherwise pin O(depth)
            # frames + checkpoints for its whole life. The next frontier is
            # re-derived from the checkpointed seen so nothing re-computes.
            prior_blocks = list(cp_blocks)
            cp_blocks.clear()
            seen = _local_checkpoint(seen, cp_blocks)
            frontier = seen.filter(F.col("depth") == d)
            for h in handles:
                h.unpersist()
            handles = []
            _release(prior_blocks)
        seen = seen.persist()
        handles.append(seen)
    edges.unpersist()
    # hand back a self-contained materialized frame and drop every interim
    # handle: callers get a result that neither recomputes nor pins caches
    final_blocks: list = []
    out = _local_checkpoint(seen, final_blocks)
    for h in handles:
        h.unpersist()
    _release(cp_blocks)
    return out
