"""Scaling-efficiency evidence (BASELINE.json north rule: ≥0.8 from N to
4N executors). A real multi-node cluster is unavailable in this sandbox;
per the driver instruction the rule is evidenced by the SAME job on the
SAME input at two parallelism levels — local[8] (N) and local[32] (4N) —
comparing frontier-drain throughput. Runs bench.py's crawl benchmark in two
fresh JVM processes and writes BENCH/BASELINE.md.

Determinism guarantee that makes the comparison apples-to-apples: the
engine's admission/dedup decisions are pure functions of data + seed, never
of partition count (SURVEY.md §7 risk (d)) — verified by comparing the two
runs' fetched counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, crawl_n: str, seeds: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY="crawl",
        BENCH_CRAWL_N=crawl_n,
        BENCH_CRAWL_SEEDS=seeds,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    # big enough that per-core compute (decode+hash+dedup) dominates fixed
    # scheduling costs — the regime the 10^10 target actually runs in
    crawl_n = os.environ.get("BENCH_CRAWL_N", "2000000")
    seeds = os.environ.get("BENCH_CRAWL_SEEDS", "800000")
    r8 = run(8, crawl_n, seeds)["crawl"]
    r32 = run(32, crawl_n, seeds)["crawl"]
    assert r8["urls_fetched"] == r32["urls_fetched"], (
        "partition-count dependence detected: fetched sets differ", r8, r32)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — scaling evidence ({date.today().isoformat()})

North rule: ≥0.8 throughput scaling efficiency from N to 4N executors.
Sandbox substitute (per driver instruction): same frontier-drain job, same
input, at local[8] (N) vs local[32] (4N cores).

Job: drain a {seeds}-seed frontier to depth 2 over a {crawl_n}-page
image+caption corpus — fetch join (bucket-pruned corpus scan), vectorized
extraction, Bloom+anti-join dedup, payload decode+verify. Identical output
at both levels (fetched={r8['urls_fetched']} URLs in both runs — admission
and dedup are partition-count independent).

| parallelism | urls fetched+deduped | wall sec | urls/sec |
|---|---|---|---|
| local[8]  (N)  | {r8['urls_fetched']} | {r8['wall_sec']} | {r8['urls_per_sec']} |
| local[32] (4N) | {r32['urls_fetched']} | {r32['wall_sec']} | {r32['urls_per_sec']} |

**Scaling efficiency = (T32/T8)/4 = {eff:.3f}** (target ≥ 0.8).

Caveats: single-JVM local mode shares one driver; shuffle is local-disk.
On a real 4N-executor cluster the fetch join and Bloom probe scale with
executors because every stage is partitioned by data keys (corpus bucket,
seen bucket, host) with no driver-side loops over rows.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
