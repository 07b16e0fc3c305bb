"""transformWithStateInPandas (Spark 4 stateful API): same per-host totals
semantics as the applyInPandasWithState operator — state survives
micro-batch boundaries, idle timers reap state with a closed=True summary."""

import datetime
import glob
import os
import shutil

import pytest

from distributed_web_crawler_spark.streaming.sessions import drain_to_memory
from distributed_web_crawler_spark.streaming.state_v2 import host_fetch_totals_v2


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# transformWithStateInPandas speaks a protobuf protocol to the JVM state
# server; this container's google.protobuf is not importable (and installs
# are off-limits), so the runtime path is exercised only where protobuf
# exists. The operator module itself imports and builds plans regardless.
needs_protobuf = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas requires google.protobuf, unavailable in this container",
)


def test_v2_plan_construction_and_schema(spark):
    """Driver-side plan building + schema resolution work without protobuf;
    only worker execution needs it."""
    stream = (
        spark.readStream.format("rate")
        .load()
        .selectExpr("CAST(value AS STRING) host", "timestamp ts", "'u' url")
    )
    df = host_fetch_totals_v2(stream)
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<host:string,n_fetches:bigint,first_ts:timestamp,last_ts:timestamp,closed:boolean>"
    )


@needs_protobuf
def test_v2_totals_accumulate_and_reap(spark, tmp_path):
    base = datetime.datetime(2026, 1, 1)
    rows1 = [("h1", base, "u1"), ("h1", base + datetime.timedelta(seconds=10), "u2"), ("h2", base, "u3")]
    rows2 = [("h1", base + datetime.timedelta(seconds=20), "u4"), ("h3", base, "u5")]
    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "host string, ts timestamp, url string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2")
    os.makedirs(src + "/all")
    for i, f in enumerate(sorted(glob.glob(src + "/f*/part-*.parquet"))):
        shutil.copy(f, src + f"/all/{i:02d}.parquet")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/all")
    )
    out = drain_to_memory(
        spark,
        host_fetch_totals_v2(stream, idle_timeout_ms=1500),
        "totals_v2",
        done=lambda rows: {r["host"] for r in rows if r["closed"]} == {"h1", "h2", "h3"},
    )
    latest = {}
    for r in out:
        latest[r["host"]] = max(latest.get(r["host"], 0), r["n_fetches"])
    assert latest == {"h1": 3, "h2": 1, "h3": 1}
    assert sum(1 for r in out if r["host"] == "h1") >= 2  # two batches → two emissions
    h1 = max((r for r in out if r["host"] == "h1"), key=lambda r: r["n_fetches"])
    assert h1["first_ts"] == base and h1["last_ts"] == base + datetime.timedelta(seconds=20)
    closed = {r["host"] for r in out if r["closed"]}
    assert closed == {"h1", "h2", "h3"}  # every idle timer fired + freed state
