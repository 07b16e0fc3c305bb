"""applyInPandasWithState: per-host running totals accumulate correctly
across micro-batches (state survives batch boundaries)."""

import datetime
import os

from pyspark.sql import functions as F

from distributed_web_crawler_spark.streaming.sessions import (
    drain_to_memory,
    host_fetch_totals,
)


def test_host_totals_accumulate_across_batches(spark, tmp_path):
    base = datetime.datetime(2026, 1, 1)
    rows1 = [("h1", base, "u1"), ("h1", base + datetime.timedelta(seconds=10), "u2"), ("h2", base, "u3")]
    rows2 = [("h1", base + datetime.timedelta(seconds=20), "u4"), ("h3", base, "u5")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "host string, ts timestamp, url string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")
    import glob
    import shutil

    os.makedirs(src + "/all")
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        shutil.copy(f, src + f"/all/{i:02d}.parquet")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/all")
    )
    out = drain_to_memory(
        spark,
        host_fetch_totals(stream, idle_timeout_ms=1500),
        "totals",
        done=lambda rows: {r["host"] for r in rows if r["closed"]} == {"h1", "h2", "h3"},
    )
    # last emission per host reflects the CUMULATIVE count across batches
    latest = {}
    for r in out:
        latest[r["host"]] = max(latest.get(r["host"], 0), r["n_fetches"])
    assert latest == {"h1": 3, "h2": 1, "h3": 1}
    # h1 was updated in two different batches → two emissions
    assert sum(1 for r in out if r["host"] == "h1") >= 2
    # state carried first_ts across batches
    h1 = max((r for r in out if r["host"] == "h1"), key=lambda r: r["n_fetches"])
    assert h1["first_ts"] == base and h1["last_ts"] == base + datetime.timedelta(seconds=20)
    # the reaper path: every host eventually timed out, emitted closed=True,
    # and released its state (that is also what lets availableNow terminate)
    closed = {r["host"] for r in out if r["closed"]}
    assert closed == {"h1", "h2", "h3"}
