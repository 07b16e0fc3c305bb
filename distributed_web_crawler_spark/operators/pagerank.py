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
bucketed seen set); the per-iteration shuffle is then only the rank side
plus the contribution aggregate keyed by dst. That claim is DEMONSTRATED
here, not just stated: ``write_edges_bucketed`` lays the contribution
edges out as a parquet table bucketed AND sorted by src, and
``pagerank_on_table`` iterates against that layout — the per-iteration
join plan scans it with ``Bucketed: true`` and NO edge-side Exchange or
Sort (machine-asserted in tests/test_pagerank_bucketed.py and
scripts/explain_audit.py, the same treatment ann_topk_partitioned got
for its partition-pruning claim). The out-degree table rides inside
the same persisted edge projection (degree join, broadcastable when the
host graph is small). Iteration state is one (dst, inflow)
SUPPORT-SET frame (r9b: rank = base + d·inflow is a pure per-row
function of it, so no full (node, rank) frame is ever assembled inside
the loop — nodes join once, in the final projection), persisted per
step and released when superseded — lineage is truncated with the same
tracked localCheckpoint used by operators/bfs.py, so deep iteration
counts neither grow plans nor pin O(iters) caches.
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
    # r9 (guide §1.2 "fewer passes"): contribution edges are built FIRST —
    # one src exchange with the degree folded in as a window count (see
    # contrib_edges_of) — and the node set derives from the cached contrib
    # frame, so the old three full passes (edges cache materialization,
    # deg-join contrib build, node distinct over the edges cache) collapse
    # to one contrib pass + one cache-read distinct. Same rows, same w.
    contrib_edges = contrib_edges_of(edges).persist()
    nodes = (
        contrib_edges.select(F.col("src").alias("url"))
        .unionByName(contrib_edges.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # materializes both persisted frames
    if n == 0:
        nodes.unpersist()
        contrib_edges.unpersist()
        return edges.sparkSession.createDataFrame([], "url string, rank double")

    out = _power_iterate(nodes, contrib_edges, n, n_iters, damping, checkpoint_every)
    nodes.unpersist()
    contrib_edges.unpersist()
    return out


def iteration_contribs(
    contrib_edges: DataFrame, inflow: DataFrame, base: float, damping: float
) -> DataFrame:
    """ONE power-iteration inflow from the PREVIOUS step's inflow
    support set: contribution edges ⟕ inflow (by src), aggregated by dst.
    Split out so plan audits can assert the join shape against a bucketed
    edge layout without running a full pagerank.

    r9 (guide §3.1 "pick the strategy deliberately"): the inflow side is
    hinted SHUFFLE_HASH — the planner's default sort-merge join re-SORTS
    the O(edges) side every iteration (the bucketed layout only removes
    its Exchange, not the sort, since bucketedTableScan.outputOrdering is
    off), while a shuffled-hash join builds on the O(nodes) inflow side
    (bounded per partition) and streams edges with no sort at all.

    r9b (guide §2.1 "remove shuffles outright"): the iteration carries
    only the inflow SUPPORT SET (dst, inflow) — never a full (node, rank)
    frame. rank_t(u) = base + damping·inflow_t(u) is a pure per-row
    function of the inflow (inflow absent ⇔ no in-edges ⇔ exactly 0), so
    it is computed INLINE on the join output with the identical double
    expression the former rank-assembly join used (base + d·coalesce(x,0),
    then ·w) — same terms, bit-for-bit, in whatever per-dst order the
    shuffle delivers (the same accepted association class as before; the
    oracle rounds at 6 dp over ~1e-15 relative noise). The former
    per-iteration `nodes ⟕ contribs` shuffled-hash join — one O(nodes)
    join + two exchanges + a persisted O(nodes) generation PER STEP — is
    gone; nodes enter once, in the final projection (the same support-set
    discipline hits() has used since r8)."""
    rank = F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
    return (
        contrib_edges.join(
            inflow.withColumnRenamed("dst", "src").hint("shuffle_hash"), "src", "left"
        )
        .groupBy("dst")
        .agg(F.sum(rank * F.col("w")).alias("inflow"))
    )


def _power_iterate(nodes, contrib_edges, n, n_iters, damping, checkpoint_every):
    if n_iters < 1:
        # inflow would stay None and crash the final projection with a
        # bare AttributeError; fail with the actual contract (same guard
        # hits._iterate carries)
        raise ValueError(f"pagerank requires n_iters >= 1, got {n_iters}")
    base = (1.0 - damping) / n
    st = IterationState(checkpoint_every)
    inflow = None
    for it in range(1, n_iters + 1):
        if it == 1:
            # rank_0 ≡ 1/n: the first inflow needs no join at all — it is
            # a plain aggregate over the cached contribution edges, with
            # the same per-edge term (1/n)·w the former rank_0-join summed
            inflow = contrib_edges.groupBy("dst").agg(
                F.sum(F.lit(1.0 / n) * F.col("w")).alias("inflow")
            )
        else:
            inflow = iteration_contribs(contrib_edges, inflow, base, damping)
        inflow = st.step(inflow, it)
    # final projection: the ONE place the full node set is needed —
    # rank = base + d·coalesce(inflow, 0), identical to the expression the
    # per-step rank assembly used to evaluate
    return st.finish(
        nodes.join(
            inflow.withColumnRenamed("dst", "url").hint("shuffle_hash"), "url", "left"
        ).select(
            "url",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias(
                "rank"
            ),
        )
    )


def contrib_edges_of(edges: DataFrame) -> DataFrame:
    """(src, dst, w=1/outdeg(src)) — the projection every iteration joins.
    Built once per graph; at scale this is what gets written bucketed.

    r9 (guide §2.4 "share one exchange"): the degree folds in as a window
    count over ONE src exchange — the former groupBy+join shape moved the
    edge set through an exchange AND a join against the degree aggregate
    (two passes); the window needs the same src clustering the downstream
    bucketed layout wants anyway, and 1.0/count(*) is the identical
    double for any evaluation order (integer count)."""
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    return edges.select(
        "src", "dst", (F.lit(1.0) / F.count("*").over(w)).alias("w")
    )


def write_edges_bucketed(edges: DataFrame, name: str, n_buckets: int = 32, path: str | None = None) -> None:
    """One-time layout for iterative rank jobs: the contribution edges as a
    parquet table BUCKETED and SORTED by src (`name` in the session
    catalog; `path` makes it external). Every subsequent
    ``pagerank_on_table`` iteration joins this table by src with no
    edge-side Exchange — only the rank side moves; with
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
    default since Spark 3.0 because it costs a file listing at planning)
    the per-bucket sortBy also eliminates the edge-side Sort. On a cluster
    this is the Iceberg `bucket(N, src)` partition transform; the
    reference has no analog (its graph lives in per-job Go maps,
    Server/Master/master.go) — this is the 100-TB shape of the same
    frontier-prioritization computation."""
    # ONE file per bucket: Spark only trusts a bucketed table's sortBy
    # metadata (and so can drop the join-side Sort) when each bucket holds
    # a single file; repartition on the bucket key aligns writer tasks
    # with buckets (same Murmur3 hash on both sides)
    writer = (
        contrib_edges_of(edges)
        .repartition(n_buckets, F.col("src"))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "src")
        .sortBy("src")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def pagerank_on_table(
    spark,
    name: str,
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a pre-bucketed contribution-edge table (see
    write_edges_bucketed). Numerically identical to pagerank() on the
    same graph: same iteration, same float association order per row
    group (sum order over a dst's inflow is shuffle-determined in both)."""
    contrib_edges = spark.table(name)
    nodes = (
        contrib_edges.select(F.col("src").alias("url"))
        .unionByName(contrib_edges.select(F.col("dst").alias("url")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return spark.createDataFrame([], "url string, rank double")
    out = _power_iterate(nodes, contrib_edges, n, n_iters, damping, checkpoint_every)
    nodes.unpersist()
    return out
