"""Job ledger (D7) + depth-monotone job cache (D6) + crawl service.

The reference's control plane — the Postgres lock server
(Server/LockServer/Database/main.go:20-28, lockServer.go:105-197) and the
Redis result cache (RedisCache/cache.go:19-103, ClientFacingServer/
server.go:279-295) — is driver-side metadata, like an Iceberg catalog. It
is realized here as tiny versioned parquet tables (catalog.AtomicTable,
atomic CURRENT-pointer flips; on a cluster: Iceberg MERGE INTO). Cardinality
is one row per job / seed URL, so pandas+pyarrow on the driver is the honest
tool; all bulk data stays in Spark.

Semantics reproduced exactly:

* admission exactly-once: a job_id already in the ledger is not re-admitted
  (lockServer.go:131-147 → J4)
* late-job recovery scan: oldest running job idle > timeout, ORDER BY
  assigned_at ASC LIMIT 1 (Database/library.go:23-28, lockServer.go:174-197
  → O1); our resume continues from the last committed round instead of
  restarting at depth 0 (strictly better, same final state — SURVEY.md §3.3)
* cache: serve only if cached depth >= requested (cache.go:65-68 → F5),
  truncated to the requested depth (server.go:288 → O2), depth-monotone
  upsert AddIfNoLargerResultPresent (cache.go:78-103), TTL with
  refresh-on-read (server.go:37, cache.go:72 → W4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..catalog.tables import AtomicTable

JOB_TIMEOUT_S = 60.0  # lockServer.go:115
CACHE_TTL_S = 3600.0  # server.go:37 (60 min)

_LEDGER_COLS = {
    "job_id": "object",
    "client_id": "object",
    "seed_url": "object",
    "depth": "int64",
    "priority": "int64",  # north-rule priority queue: lower = served first
    "state": "object",  # pending | running | done
    "owner": "object",
    "assigned_at": "float64",
    "last_round": "int64",
}


class _PandasTable:
    def __init__(self, warehouse: str, name: str, cols: dict):
        self.table = AtomicTable(warehouse, name)
        self.cols = cols

    def read(self) -> pd.DataFrame:
        path = self.table.current_path()
        if path is None:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in self.cols.items()})
        return pq.read_table(path + "/data.parquet").to_pandas()

    def write(self, df: pd.DataFrame) -> None:
        import os

        path = self.table.new_version_path()
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path + "/data.parquet")
        self.table.publish(path)


class JobLedger:
    def __init__(self, warehouse: str):
        self._t = _PandasTable(warehouse, "job_ledger", _LEDGER_COLS)

    def submit(
        self,
        job_id: str,
        client_id: str,
        seed_url: str,
        depth: int,
        now: Optional[float] = None,
        priority: int = 0,
    ) -> bool:
        """Admit a job exactly once; returns False if job_id already held
        (the reference lock server's Accepted=false path, rpc.go:37).
        `priority` generalizes the reference's FIFO queue (north rule):
        lower values are served first, ties FIFO by submit time."""
        now = time.time() if now is None else now
        df = self._t.read()
        if (df["job_id"] == job_id).any():
            return False
        row = {
            "job_id": job_id,
            "client_id": client_id,
            "seed_url": seed_url,
            "depth": depth,
            "priority": priority,
            "state": "pending",
            "owner": "",
            "assigned_at": now,
            "last_round": -1,
        }
        self._t.write(pd.concat([df, pd.DataFrame([row])], ignore_index=True))
        return True

    def acquire(self, owner: str, now: Optional[float] = None, timeout_s: float = JOB_TIMEOUT_S) -> Optional[dict]:
        """Next job for a master: pending jobs by (priority, submit time);
        else the oldest running job silent > timeout (O1 recovery scan —
        recovery ignores priority, matching library.go:23-28's pure
        ORDER BY time_assigned)."""
        now = time.time() if now is None else now
        df = self._t.read()
        cand = df[df["state"] == "pending"].sort_values(["priority", "assigned_at"])
        if cand.empty:
            cand = df[(df["state"] == "running") & (now - df["assigned_at"] > timeout_s)].sort_values(
                "assigned_at"
            )
        if cand.empty:
            return None
        idx = cand.index[0]
        df.loc[idx, ["state", "owner", "assigned_at"]] = ["running", owner, now]
        self._t.write(df)
        return df.loc[idx].to_dict()

    def progress(self, job_id: str, last_round: int, now: Optional[float] = None) -> None:
        now = time.time() if now is None else now
        df = self._t.read()
        m = df["job_id"] == job_id
        df.loc[m, ["last_round", "assigned_at"]] = [last_round, now]
        self._t.write(df)

    def complete(self, job_id: str) -> None:
        df = self._t.read()
        df.loc[df["job_id"] == job_id, "state"] = "done"
        self._t.write(df)

    def get(self, job_id: str) -> Optional[dict]:
        df = self._t.read()
        m = df[df["job_id"] == job_id]
        return None if m.empty else m.iloc[0].to_dict()

    def to_spark(self, spark):
        pdf = self._t.read()
        return spark.createDataFrame(
            pdf,
            "job_id string, client_id string, seed_url string, depth long, priority long, "
            "state string, owner string, assigned_at double, last_round long",
        )


_CACHE_COLS = {
    "seed_url": "object",
    "depth": "int64",
    "results": "object",  # list<list<str>> — the DoneJob [][]string payload
    "expires_at": "float64",
}


class JobCache:
    def __init__(self, warehouse: str, ttl_s: float = CACHE_TTL_S):
        self._t = _PandasTable(warehouse, "job_cache", _CACHE_COLS)
        self.ttl_s = ttl_s

    def put_if_deeper(self, seed_url: str, depth: int, results: List[List[str]], now: Optional[float] = None) -> bool:
        """AddIfNoLargerResultPresent (cache.go:78-103): keep the deepest
        result per seed URL. Expired rows are treated as absent — in the
        reference, Redis has already evicted the key (cache.go:78-86), so a
        repeat job after TTL expiry must always be able to re-cache."""
        now = time.time() if now is None else now
        df = self._t.read()
        m = (df["seed_url"] == seed_url) & (df["expires_at"] > now)
        if m.any() and int(df.loc[m, "depth"].iloc[0]) >= depth:
            return False
        df = df[df["seed_url"] != seed_url]  # purge stale/shallower rows
        row = {"seed_url": seed_url, "depth": depth, "results": results, "expires_at": now + self.ttl_s}
        self._t.write(pd.concat([df, pd.DataFrame([row])], ignore_index=True))
        return True

    def get(self, seed_url: str, requested_depth: int, now: Optional[float] = None) -> Optional[List[List[str]]]:
        """F5 + O2 + W4: serve iff cached depth >= requested and unexpired;
        truncate to requested depth; refresh TTL on hit."""
        now = time.time() if now is None else now
        df = self._t.read()
        m = df[(df["seed_url"] == seed_url) & (df["expires_at"] > now)]
        if m.empty or int(m["depth"].iloc[0]) < requested_depth:
            return None
        idx = m.index[0]
        df.loc[idx, "expires_at"] = now + self.ttl_s  # refresh-on-read
        self._t.write(df)
        results = m["results"].iloc[0]
        return [list(level) for level in results[:requested_depth]]


@dataclass
class CrawlService:
    """End-to-end job flow: submit → cache probe → engine (resume-aware) →
    cache upsert → complete. The Spark analog of SURVEY.md §3.1 stages."""

    engine: "object"  # plans.frontier.FrontierEngine
    ledger: JobLedger
    cache: JobCache

    def submit(self, job_id: str, client_id: str, seed_url: str, depth: int, now=None) -> bool:
        return self.ledger.submit(job_id, client_id, seed_url, depth, now=now)

    def run_next(self, owner: str = "m1", now=None, max_rounds=None) -> Optional[dict]:
        job = self.ledger.acquire(owner, now=now)
        if job is None:
            return None
        job_id, seed_url, depth = job["job_id"], job["seed_url"], int(job["depth"])
        cached = self.cache.get(seed_url, depth, now=now)
        if cached is not None:
            self.ledger.complete(job_id)
            return {"job_id": job_id, "done": True, "from_cache": True, "results": cached}
        summary = self.engine.run_job(job_id, seed_url, depth, max_rounds=max_rounds)
        self.ledger.progress(job_id, summary["last_round"], now=now)
        if not summary["done"]:
            return {**summary, "from_cache": False}
        payload = self.engine.client_payload(job_id, depth)
        self.cache.put_if_deeper(seed_url, depth, payload, now=now)
        self.ledger.complete(job_id)
        return {**summary, "from_cache": False, "results": payload}
