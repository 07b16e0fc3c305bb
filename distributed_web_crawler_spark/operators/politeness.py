"""Per-host politeness admission (north-rule W5 — no reference analog; the
nearest reference mechanisms are worker idle backoff worker.go:87-116 and
single-job masters master.go:393-399).

A depth's pending frontier drains in sub-rounds; each sub-round admits at
most ``max_per_round(host)`` URLs per host, chosen by ``row_number()`` over
``Window.partitionBy(host).orderBy(url_hash)``. Both the budget and the
order are pure functions of the data — never of partition count — so runs
at local[8] and local[32] admit identical sets (SURVEY.md §7 risk (d)) and
the scaling-efficiency comparison is apples-to-apples.

Scale note: the window shuffles a depth's pending rows by host; budgets are
tiny (≤8 here), so a mega-host's partition exists only to pick its first k
rows. If a single host's pending set outgrows one task at 10^10-URL scale,
pre-filter with an approximate per-host hash threshold (top-k sketch) before
the window; AQE skew-join splitting does not apply to windows.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window, functions as F

from ..oracle.crawler import PolitenessPolicy


def budget_col(host_col, policy: PolitenessPolicy):
    """max_per_round as a Catalyst expression over the synthetic h%04d.test
    host scheme: crawl_delay = 500*(1 + h%4) ms (FIXTURES.md §3)."""
    # try_cast: a host outside the synthetic scheme (malformed client seed)
    # yields NULL; greatest() skips NULLs, so unknown hosts get the
    # conservative budget of 1 instead of an ANSI cast error
    h = F.regexp_extract(host_col, r"h(\d+)\.test", 1).try_cast("int")
    delay = 500 * (1 + F.pmod(h, F.lit(4)))
    return F.greatest(F.lit(1), F.floor(F.lit(policy.round_duration_ms) / delay)).cast("int")


def max_budget(policy: PolitenessPolicy) -> int:
    """Data-independent upper bound of budget_col (delay ≥ 500 ms)."""
    return max(1, policy.round_duration_ms // 500)


def admit(pending: DataFrame, policy: PolitenessPolicy | None) -> Tuple[DataFrame, DataFrame]:
    """Split a depth's pending frontier into (admitted, deferred) for one
    sub-round. pending needs (url, host, url_hash).

    The admitted filter carries a LITERAL rank bound (`_rn <= max_budget`)
    alongside the per-host column bound: Catalyst only plans a
    WindowGroupLimit (per-partition top-k BELOW the shuffle) for literal
    limits, and that pushdown is the mega-host mitigation — a host with
    millions of pending URLs contributes at most max_budget rows per map
    partition to the window's exchange instead of all of them."""
    if policy is None:
        return pending, pending.limit(0)
    w = Window.partitionBy("host").orderBy(F.col("url_hash").asc(), F.col("url").asc())
    ranked = pending.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_budget", budget_col(F.col("host"), policy)
    )
    lim = F.lit(max_budget(policy))
    admitted = ranked.filter((F.col("_rn") <= lim) & (F.col("_rn") <= F.col("_budget"))).drop(
        "_rn", "_budget"
    )
    deferred = ranked.filter(F.col("_rn") > F.col("_budget")).drop("_rn", "_budget")
    return admitted, deferred
