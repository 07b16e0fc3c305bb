"""Structured-Streaming ingress (SURVEY.md §2.9).

The reference's queue-driven control flow — WebSocket reader → RabbitMQ
jobsAssigned queue → master consumer with prefetch-1 + manual ack
(ClientFacingServer/server.go:251-312, MessageQueue/main.go:51-139) —
maps to a file-source readStream of job JSON and an exactly-once
foreachBatch sink into the job ledger:

* durable queue           → the source directory (files persist)
* manual ack              → checkpointed batch offsets (a batch re-runs
                            until its ledger commit succeeds)
* duplicate re-delivery   → JobLedger.submit is idempotent per job_id
                            (admission exactly-once, lockServer.go:131-147)

Tests drive it with trigger(availableNow=True) so the stream drains the
backlog and stops — deterministic in CI while the same code runs unbounded
on a cluster.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F, types as T

JOB_SCHEMA = T.StructType(
    [
        T.StructField("jobId", T.StringType()),  # wire names per transferObjects.go:11-14
        T.StructField("clientId", T.StringType()),
        T.StructField("urlToCrawl", T.StringType()),
        T.StructField("depthToCrawl", T.IntegerType()),
    ]
)


def read_job_stream(spark: SparkSession, ingress_dir: str):
    """readStream of newline-JSON job files (the jobsAssigned queue)."""
    return (
        spark.readStream.schema(JOB_SCHEMA)
        .json(ingress_dir)
        .select(
            F.col("jobId").alias("job_id"),
            F.col("clientId").alias("client_id"),
            F.col("urlToCrawl").alias("seed_url"),
            F.col("depthToCrawl").alias("depth"),
        )
    )


def run_job_intake(spark: SparkSession, ingress_dir: str, ledger, checkpoint_dir: str, available_now: bool = True):
    """Drain the job stream into the ledger exactly-once. Returns the query
    (already awaited when available_now)."""

    def sink(batch_df, batch_id: int):
        # tiny control-plane batch → driver-side idempotent admission
        for row in batch_df.collect():
            if row["job_id"] and row["seed_url"] and row["depth"] and row["depth"] >= 1:
                ledger.submit(row["job_id"], row["client_id"] or "", row["seed_url"], int(row["depth"]))

    writer = (
        read_job_stream(spark, ingress_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
