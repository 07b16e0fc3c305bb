"""Per-host fetch accounting on the Spark 4 transformWithStateInPandas API —
the successor to applyInPandasWithState (streaming/sessions.py implements
the same operator on the older API; both are kept because the old API is
what most deployed clusters run, while this one is where stateful Spark is
heading: typed state handles, explicit timers, RocksDB-backed state).

Same semantics as sessions.host_fetch_totals: running (n_fetches, first_ts,
last_ts) per host emitted on every update, and an idle-timeout timer that
emits a closed=True summary and frees the key's state — the reference's
idle-connection reaper (ClientFacingServer/server.go:139-162) as an
engine-managed timer instead of a mutex-guarded map swept by a goroutine.

Container caveat: the transformWithState worker protocol runs over
google.protobuf, which is not importable in this sandbox (no installs), so
tests/test_state_v2.py skips at runtime here and runs where protobuf
exists; plan construction and the processor class are exercised either
way. The applyInPandasWithState implementation (sessions.py) remains the
fully-tested operator in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "host string, n_fetches long, first_ts timestamp, last_ts timestamp, closed boolean"


def _dt(epoch: float):
    import datetime

    return datetime.datetime.fromtimestamp(epoch, datetime.timezone.utc).replace(tzinfo=None)


class HostTotalsProcessor(StatefulProcessor):
    """ValueState("totals") + one processing-time timer per host."""

    def __init__(self, idle_timeout_ms: int):
        self.idle_timeout_ms = idle_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.state = handle.getValueState(
            "totals", "n_fetches long, first_ts double, last_ts double"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        host = key[0]
        n, first, last = self.state.get() if self.state.exists() else (0, None, None)
        for pdf in rows:
            ts = pdf["ts"]
            n += len(pdf)
            lo = ts.min().timestamp()
            hi = ts.max().timestamp()
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        self.state.update((n, first, last))
        # slide the idle timer: drop any pending one, arm a fresh deadline
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + self.idle_timeout_ms)
        yield pd.DataFrame(
            {"host": [host], "n_fetches": [n], "first_ts": [_dt(first)], "last_ts": [_dt(last)], "closed": [False]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        import pandas as pd

        if not self.state.exists():
            return
        n, first, last = self.state.get()
        self.state.clear()  # the reaper: idle key's state is freed
        yield pd.DataFrame(
            {"host": [key[0]], "n_fetches": [n], "first_ts": [_dt(first)], "last_ts": [_dt(last)], "closed": [True]}
        )

    def close(self) -> None:
        pass


def host_fetch_totals_v2(fetch_events: DataFrame, idle_timeout_ms: int = 60_000) -> DataFrame:
    """fetch_events: streaming (host string, ts timestamp, url string).
    transformWithStateInPandas requires the RocksDB state store provider —
    set on the session here (the older HDFS-backed provider keeps working
    for applyInPandasWithState queries either way)."""
    fetch_events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return fetch_events.groupBy("host").transformWithStateInPandas(
        statefulProcessor=HostTotalsProcessor(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
