"""Robots TTL cache: fetch-once within TTL, refetch after expiry, blocking
agrees with the policy predicate (north-rule robots caching)."""

from distributed_web_crawler_spark.fixtures import corpus as C
from distributed_web_crawler_spark.operators.robots import RobotsCache
from distributed_web_crawler_spark.oracle.crawler import RobotsPolicy

SPEC = C.CorpusSpec(n=1000)


def test_fetch_once_within_ttl():
    rc = RobotsCache(ttl_s=100.0)
    blocked_host = C.host_name(7)  # h % 16 == 7 disallows /p/3
    assert rc.prefixes(blocked_host, now=0.0) == ["/p/3"]
    for t in (1.0, 50.0, 99.0):
        rc.prefixes(blocked_host, now=t)
    assert rc.n_fetches == 1
    rc.prefixes(blocked_host, now=101.0)  # expired → refetch
    assert rc.n_fetches == 2


def test_blocking_matches_policy():
    rc = RobotsCache()
    pol = RobotsPolicy()
    for i in range(SPEC.n):
        url = C.url_of(i, SPEC)
        assert rc.blocked_url(url, now=0.0) == pol.blocked(i, SPEC), url


def test_table_shape(spark):
    rc = RobotsCache()
    rc.prefixes(C.host_name(7), now=0.0)
    rc.prefixes(C.host_name(1), now=0.0)
    rows = {r["host"]: list(r["disallow_prefixes"]) for r in rc.to_table(spark).collect()}
    assert rows == {"h0007.test": ["/p/3"], "h0001.test": []}
