"""Result egress + client-connection registry (SURVEY.md §2.1 S6, §2.4 J2,
§2.7 W3) — the reference's ClientFacingServer subsystem re-expressed.

Reference behavior: the server keeps a mutex-guarded map of live WebSocket
connections keyed by client id (ClientFacingServer/server.go:134-162),
reaps idle connections on a timer (server.go:139-162, W3), and when a
DoneJob arrives pushes it to the matching live connection — results for a
vanished client are dropped, because a re-request is served from the Redis
cache (server.go:199-248). Client wire format: Client/client.go:13-20.

Spark-idiomatic analog:

* live-conn map → ``ClientRegistry``: a CAS-versioned control table
  (register / heartbeat / reap-idle), safe across competing server
  processes like everything else on catalog.AtomicTable.
* DoneJob push  → ``run_result_egress``: a Structured-Streaming foreachBatch
  over the finished-jobs outbox; each batch joins results to the live
  registry (J2) and writes one DoneJob JSON per (client, job) into the
  client's egress directory — the deliverable a WS push would carry. A
  batch re-runs until its writes land (checkpointed), and the per-job file
  name makes redelivery idempotent.
* drop-if-disconnected → results whose client is not live are counted and
  skipped, exactly the reference's path (cache serves the re-request).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import pandas as pd

from ..plans.ledger import Delta, _PandasTable

CONN_IDLE_TIMEOUT_S = 600.0  # server.go idle reaper period

_REGISTRY_COLS = {
    "client_id": "object",
    "connected_at": "float64",
    "last_seen": "float64",
}


class ClientRegistry:
    """Live-connection registry (J2 lookup side, W3 reaper)."""

    def __init__(self, warehouse: str, idle_timeout_s: float = CONN_IDLE_TIMEOUT_S):
        self._t = _PandasTable(warehouse, "client_registry", _REGISTRY_COLS)
        self.idle_timeout_s = idle_timeout_s

    def register(self, client_id: str, now: Optional[float] = None) -> None:
        now = time.time() if now is None else now

        def fn(df):
            row = {"client_id": client_id, "connected_at": now, "last_seen": now}
            return Delta(ups=pd.DataFrame([row])), None

        self._t.mutate(fn)

    def heartbeat(self, client_id: str, now: Optional[float] = None) -> bool:
        """Re-stamp last_seen; False if the client is not registered."""
        now = time.time() if now is None else now

        def fn(df):
            m = df["client_id"] == client_id
            if not m.any():
                return None, False
            u = df.loc[m].copy()
            u["last_seen"] = now
            return Delta(ups=u), True

        return self._t.mutate(fn)

    def reap_idle(self, now: Optional[float] = None) -> List[str]:
        """Drop connections silent past the idle timeout (W3); returns the
        reaped client ids."""
        now = time.time() if now is None else now

        def fn(df):
            dead = df[now - df["last_seen"] > self.idle_timeout_s]
            if dead.empty:
                return None, []
            return Delta(dels=list(dead["client_id"])), list(dead["client_id"])

        return self._t.mutate(fn)

    def live_clients(self, now: Optional[float] = None) -> List[str]:
        now = time.time() if now is None else now
        df = self._t.read()
        return sorted(df[now - df["last_seen"] <= self.idle_timeout_s]["client_id"])


def publish_done(outbox_dir: str, job_id: str, client_id: str, results: List[List[str]]) -> str:
    """Append a finished job to the egress outbox (the DoneJob the reference
    master publishes, transferObjects.go:17-23). Written atomically so the
    streaming reader never sees a torn file."""
    os.makedirs(outbox_dir, exist_ok=True)
    payload = {"jobId": job_id, "clientId": client_id, "results": results}
    path = os.path.join(outbox_dir, f"{job_id}.json")
    tmp = os.path.join(outbox_dir, f".{job_id}.json.tmp")  # dot-prefix: hidden from the stream source
    with open(tmp, "w") as f:
        f.write(json.dumps(payload))
    os.replace(tmp, path)
    return path


def read_done_stream(spark, outbox_dir: str):
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("jobId", T.StringType()),
            T.StructField("clientId", T.StringType()),
            T.StructField("results", T.ArrayType(T.ArrayType(T.StringType()))),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .json(outbox_dir)
        .select(
            F.col("jobId").alias("job_id"),
            F.col("clientId").alias("client_id"),
            F.col("results").alias("results"),
        )
    )


def run_result_egress(
    spark,
    outbox_dir: str,
    egress_dir: str,
    registry: ClientRegistry,
    checkpoint_dir: str,
    available_now: bool = True,
    now: Optional[float] = None,
):
    """Drain finished jobs to per-client egress files, dropping results for
    clients no longer live — the WS-push semantics. Returns the query."""

    def sink(batch_df, batch_id: int):
        live = set(registry.live_clients(now=now))
        for row in batch_df.collect():  # control-plane cardinality: one row per job
            if row["client_id"] not in live:
                continue  # reference drops it; cache serves a re-request
            client_dir = os.path.join(egress_dir, row["client_id"])
            os.makedirs(client_dir, exist_ok=True)
            payload = {
                "jobId": row["job_id"],
                "clientId": row["client_id"],
                "results": [list(level) for level in (row["results"] or [])],
            }
            path = os.path.join(client_dir, f"{row['job_id']}.json")
            # dot-prefix: a crash mid-write must not leave a torn file a
            # directory-listing consumer would pick up (and replays under a
            # new batch_id would never clean a visible leftover)
            tmp = os.path.join(client_dir, f".{row['job_id']}.tmp{batch_id}")
            with open(tmp, "w") as f:
                f.write(json.dumps(payload))
            os.replace(tmp, path)  # idempotent on batch replay

    writer = (
        read_done_stream(spark, outbox_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
