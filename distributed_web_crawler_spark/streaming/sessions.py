"""Custom stateful streaming operator via applyInPandasWithState —
per-host fetch accounting over a stream of fetch events.

The reference keeps per-connection/per-host liveness state in mutex-guarded
maps swept by timer threads (idle-connection reaper server.go:139-162,
worker backoff worker.go:87-116). The Structured-Streaming analog keeps the
state in the engine's state store, keyed by host, updated per micro-batch:

* ``host_fetch_totals``   — running (n_fetches, last_seen) per host, emitted
  on every update (update output mode) — the live politeness/budget signal.
* state eviction via GroupStateTimeout mirrors the reaper: a host silent for
  the timeout has its state dropped (and a final summary emitted).

State is per-key and partitioned by the streaming state store — at 10^10
scale hosts shard across executors exactly like the Bloom buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, n_fetches long, first_ts timestamp, last_ts timestamp, closed boolean"
STATE_SCHEMA = "n_fetches long, first_ts double, last_ts double"


def _make_update(idle_timeout_ms: int):
    def _update(key, pdfs, state: GroupState):
        import datetime

        import pandas as pd

        def _dt(epoch):
            return datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc).replace(tzinfo=None)

        host = key[0]
        if state.hasTimedOut:
            n, first, last = state.get
            state.remove()
            yield pd.DataFrame(
                {"host": [host], "n_fetches": [n], "first_ts": [_dt(first)], "last_ts": [_dt(last)], "closed": [True]}
            )
            return
        n, first, last = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            ts = pdf["ts"]
            n += len(pdf)
            lo = ts.min().timestamp()
            hi = ts.max().timestamp()
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        state.update((n, first, last))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"host": [host], "n_fetches": [n], "first_ts": [_dt(first)], "last_ts": [_dt(last)], "closed": [False]}
        )

    return _update


def host_fetch_totals(fetch_events: DataFrame, idle_timeout_ms: int = 60_000) -> DataFrame:
    """fetch_events: streaming (host string, ts timestamp, url string).
    Emits the running per-host totals after each micro-batch (update mode);
    idle hosts time out, emit a closed=True summary, and free their state.
    NB: with trigger(availableNow) the query stays up until outstanding
    state times out — pick idle_timeout_ms accordingly in drain-style runs."""
    return fetch_events.groupBy("host").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def drain_to_memory(spark, df: DataFrame, name: str, done, max_wait_s: float = 120.0):
    """Start `df` (update mode) into a memory sink and stop once `done(rows)`
    says the state machine has drained. Needed because availableNow +
    ProcessingTimeTimeout keeps the query alive in 'cleaning up state'
    indefinitely even after all per-key state is removed (observed on
    Spark 4.1) — awaitTermination would hang."""
    import time

    q = (
        df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    deadline = time.monotonic() + max_wait_s
    try:
        while time.monotonic() < deadline:
            rows = spark.sql(f"SELECT * FROM {name}").collect()
            if done(rows) or not q.isActive:
                break
            time.sleep(1.0)
    finally:
        if q.isActive:
            q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def session_stats(events: DataFrame, gap_ms: int = 600_000) -> DataFrame:
    """BATCH gap-based sessionization over an event log — the relational
    twin of the stateful-streaming accounting above (same lifecycle the
    reference's idle-connection reaper implements with timer sweeps,
    server.go:139-162: a silence longer than the gap closes the session).
    Classic crawl/session analytics: a new session starts when a user's
    inter-event gap exceeds `gap_ms`.

    All arithmetic is exact-integer epoch MILLISECONDS (Spark unix_millis
    and DuckDB epoch_ms truncate microseconds identically), so the oracle
    matches bit-for-bit except the 3-dp-rounded value sum (same precedent
    as windowed_metrics). Order within a user is pinned by (ts, event_id).

    Scale shape: ONE shuffle keyed by user_id; lag + running-sum windows
    and the session aggregate all share that partitioning (one Exchange in
    the plan). Session state never leaves the executor — this is the
    standard log-sessionization shape at any corpus size. A pathological
    mega-user is bounded by per-user event counts; a stream with unbounded
    keys belongs to the applyInPandasWithState sibling above, whose state
    store evicts by timeout instead of windowing.

    Returns (user_id, sess_id, n_events, start_ms, end_ms, duration_ms,
    sum_value)."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps arrive NTZ; the session timezone is pinned UTC
    # (session.py), so this cast is the identity naive→epoch mapping and
    # unix_millis equals DuckDB's epoch_ms (both truncate microseconds)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    brk = F.when(
        F.lag(ms).over(w).isNull() | ((ms - F.lag(ms).over(w)) > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.select(
        "user_id",
        "event_id",
        "value",
        ms.alias("ms"),
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sess_id"),
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
        (F.max("ms") - F.min("ms")).alias("duration_ms"),
        F.round(F.sum("value"), 3).alias("sum_value"),
    )
