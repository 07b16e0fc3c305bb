"""Job ledger (D7) + job cache (D6) semantics: exactly-once admission,
FIFO + late-job recovery acquisition, depth-monotone cache with truncation
and TTL refresh (reference lockServer.go:105-197, cache.go:55-103,
server.go:279-295)."""

from distributed_web_crawler_spark.plans.ledger import JobCache, JobLedger


def test_ledger_admission_exactly_once(tmp_path):
    led = JobLedger(str(tmp_path))
    assert led.submit("J1", "c0", "u1", 2, now=100.0)
    assert not led.submit("J1", "c9", "u9", 5, now=101.0)  # duplicate refused
    assert led.get("J1")["client_id"] == "c0"


def test_ledger_fifo_and_recovery(tmp_path):
    led = JobLedger(str(tmp_path))
    led.submit("J1", "c0", "u1", 2, now=100.0)
    led.submit("J2", "c1", "u2", 2, now=101.0)
    a = led.acquire("m1", now=102.0)
    assert a["job_id"] == "J1"  # FIFO by submit time
    b = led.acquire("m2", now=103.0)
    assert b["job_id"] == "J2"
    # nothing pending; nothing stale yet
    assert led.acquire("m3", now=104.0) is None
    # after 60 s the oldest running job is reassigned (O1)
    c = led.acquire("m3", now=163.0)
    assert c["job_id"] == "J1" and c["owner"] == "m3"
    # progress heartbeat re-stamps assigned_at → J2 protected from stealing
    led.progress("J2", last_round=3, now=170.0)
    assert led.acquire("m4", now=200.0) is None  # J1@163, J2@170: neither stale
    nxt = led.acquire("m4", now=225.0)  # J1 stale again (163+60<225), J2 not
    assert nxt["job_id"] == "J1"


def test_ledger_priority_queue(tmp_path):
    """North-rule priority queue: lower priority value first, FIFO ties;
    recovery stealing stays pure-FIFO (library.go:23-28)."""
    led = JobLedger(str(tmp_path))
    led.submit("J1", "c0", "u1", 2, now=100.0)  # default priority 0
    led.submit("J2", "c1", "u2", 2, now=101.0, priority=-5)  # urgent
    led.submit("J3", "c2", "u3", 2, now=102.0, priority=0)
    assert led.acquire("m", now=103.0)["job_id"] == "J2"
    assert led.acquire("m", now=104.0)["job_id"] == "J1"  # FIFO within prio 0
    assert led.acquire("m", now=105.0)["job_id"] == "J3"


def test_ledger_complete(tmp_path):
    led = JobLedger(str(tmp_path))
    led.submit("J1", "c0", "u1", 2, now=100.0)
    led.acquire("m1", now=101.0)
    led.complete("J1")
    assert led.get("J1")["state"] == "done"
    assert led.acquire("m2", now=500.0) is None  # done jobs never reassigned


def test_cache_depth_monotone_and_truncation(tmp_path):
    cache = JobCache(str(tmp_path))
    assert cache.put_if_deeper("u1", 3, [["a"], ["b", "c"], ["d"]], now=0.0)
    # shallower result refused (AddIfNoLargerResultPresent)
    assert not cache.put_if_deeper("u1", 2, [["a"], ["x"]], now=1.0)
    # insufficient depth → miss (F5)
    assert cache.get("u1", 4, now=2.0) is None
    # sufficient → truncated to requested depth (O2)
    assert cache.get("u1", 2, now=3.0) == [["a"], ["b", "c"]]
    # deeper replaces
    assert cache.put_if_deeper("u1", 4, [["a"], ["b", "c"], ["d"], ["e"]], now=4.0)
    assert cache.get("u1", 4, now=5.0)[3] == ["e"]


def test_cache_reaccepts_after_expiry(tmp_path):
    """Regression (ADVICE r1): an EXPIRED row must not block put_if_deeper —
    in the reference Redis has evicted the key (cache.go:78-86), so a repeat
    job at any depth re-caches after TTL expiry."""
    cache = JobCache(str(tmp_path), ttl_s=10.0)
    assert cache.put_if_deeper("u1", 3, [["a"], ["b"], ["c"]], now=0.0)
    # unexpired deeper row still blocks a shallower result
    assert not cache.put_if_deeper("u1", 2, [["a"], ["x"]], now=5.0)
    # expired row is absent: the shallower upsert must now succeed
    assert cache.put_if_deeper("u1", 2, [["a"], ["x"]], now=20.0)
    assert cache.get("u1", 2, now=21.0) == [["a"], ["x"]]
    # and the stale deep row is gone, not resurrectable
    assert cache.get("u1", 3, now=22.0) is None


def test_cache_ttl_refresh_on_read(tmp_path):
    cache = JobCache(str(tmp_path), ttl_s=100.0)
    cache.put_if_deeper("u1", 1, [["a"]], now=0.0)
    assert cache.get("u1", 1, now=99.0) == [["a"]]  # hit refreshes TTL (W4)
    assert cache.get("u1", 1, now=198.0) == [["a"]]  # still alive thanks to refresh
    assert cache.get("u1", 1, now=299.1) is None  # expired
