"""Streaming windowed aggregation with watermark — the engine's live
fetch-metrics feed (generalizes the reference's 1 Hz late-task scan and
debug histogram, master.go:223-249, 575-596, to event-time windows).

Batch and stream share the same transformation (unifiable logical plan):
`windowed_counts` works on either a static or a streaming DataFrame; the
watermark bounds state for late data on the streaming side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time counts per event_type. On a stream, late rows
    beyond the watermark are dropped and window state is evicted."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_from_dir(spark, dir_: str, schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"):
    # one file per micro-batch so the watermark advances across the backlog
    # (a single availableNow batch would close no window in append mode)
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir_)


def run_windowed_metrics(spark, events_dir: str, out_dir: str, checkpoint_dir: str):
    """File-stream → windowed agg → parquet sink, drained with availableNow.
    Exactly-once via the checkpoint + file-sink transaction log."""
    q = (
        windowed_counts(stream_events_from_dir(spark, events_dir))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
