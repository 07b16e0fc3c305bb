"""Multi-master safety (r1 verdict item 3): the reference's lock server
serializes job admission/acquisition across competing masters with a
Postgres row lock (Server/LockServer/lockServer.go:131-147,
Database/library.go:19-44). Our AtomicTable re-expresses that as
compare-and-swap version commits — these tests race two real PROCESSES
(not threads) and assert exactly-once semantics and a cache that never
exceeds its LFU size bound."""

import multiprocessing as mp

from distributed_web_crawler_spark.catalog.tables import AtomicTable
from distributed_web_crawler_spark.plans.ledger import JobCache, JobLedger

N_JOBS = 12


def _acquire_worker(wh, owner, out_q):
    led = JobLedger(wh)
    got = []
    while True:
        job = led.acquire(owner, now=1000.0)  # fixed now: no staleness steals
        if job is None:
            break
        got.append(job["job_id"])
        led.complete(job["job_id"])
    out_q.put((owner, got))


def _submit_worker(wh, job_ids, out_q):
    led = JobLedger(wh)
    out_q.put([jid for jid in job_ids if led.submit(jid, "c", f"u{jid}", 1, now=500.0)])


def test_two_process_acquire_exactly_once(tmp_path):
    wh = str(tmp_path)
    led = JobLedger(wh)
    for i in range(N_JOBS):
        assert led.submit(f"J{i}", "c", f"u{i}", 1, now=100.0 + i)
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=_acquire_worker, args=(wh, f"m{k}", q)) for k in range(2)]
    for p in ps:
        p.start()
    results = [q.get(timeout=120) for _ in ps]
    for p in ps:
        p.join(timeout=120)
    all_got = [j for _, got in results for j in got]
    assert sorted(all_got) == sorted(f"J{i}" for i in range(N_JOBS))  # no dup, no loss
    assert len(set(all_got)) == N_JOBS


def test_two_process_submit_exactly_once(tmp_path):
    """Both masters submit the SAME job ids; each id is admitted exactly once
    (the reference lock server's Accepted=false path, rpc.go:37)."""
    wh = str(tmp_path)
    ids = [f"J{i}" for i in range(N_JOBS)]
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=_submit_worker, args=(wh, ids, q)) for _ in range(2)]
    for p in ps:
        p.start()
    accepted = [q.get(timeout=120) for _ in ps]
    for p in ps:
        p.join(timeout=120)
    merged = [j for acc in accepted for j in acc]
    assert sorted(merged) == sorted(ids)  # every id admitted exactly once, by one master
    led = JobLedger(wh)
    assert all(led.get(jid) is not None for jid in ids)


def test_atomic_table_cas_single_winner(tmp_path):
    """Two writers race the same expected version: exactly one publish wins;
    the loser's staging dir is cleaned up."""
    import os

    t1, t2 = AtomicTable(str(tmp_path), "t"), AtomicTable(str(tmp_path), "t")
    v0 = t1.current_version()
    p1, p2 = t1.new_version_path(), t2.new_version_path()
    os.makedirs(p1), os.makedirs(p2)
    r1 = t1.publish(p1, expected_version=v0)
    r2 = t2.publish(p2, expected_version=v0)
    assert [r1, r2].count(True) == 1
    assert t1.current_path() == (p1 if r1 else p2)
    assert not os.path.exists(p2 if r1 else p1)  # loser staging removed


def test_cache_lfu_eviction_bound(tmp_path):
    cache = JobCache(str(tmp_path), ttl_s=1000.0, max_entries=3)
    for i in range(3):
        assert cache.put_if_deeper(f"u{i}", 1, [[f"a{i}"]], now=float(i))
    # u1 and u2 gain hits; u0 stays cold
    cache.get("u1", 1, now=5.0)
    cache.get("u2", 1, now=6.0)
    assert cache.put_if_deeper("u3", 1, [["a3"]], now=7.0)  # over cap → evict u0
    assert len(cache) == 3
    assert cache.get("u0", 1, now=8.0) is None  # LFU victim
    assert cache.get("u1", 1, now=8.0) == [["a1"]]
    assert cache.get("u3", 1, now=8.0) == [["a3"]]  # fresh row exempt from eviction


def test_cache_eviction_prefers_expired(tmp_path):
    cache = JobCache(str(tmp_path), ttl_s=10.0, max_entries=2)
    cache.put_if_deeper("u0", 1, [["a"]], now=0.0)
    cache.get("u0", 1, now=6.0)  # hot + TTL-refreshed → expires at 17
    cache.get("u0", 1, now=7.0)
    cache.put_if_deeper("u1", 1, [["b"]], now=5.0)  # cold, expires at 15
    cache.put_if_deeper("u2", 1, [["c"]], now=16.0)  # u1 expired by now
    assert len(cache) == 2
    assert cache.get("u1", 1, now=16.5) is None  # expired row went first (free)
    assert cache.get("u0", 1, now=16.5) == [["a"]]
    assert cache.get("u2", 1, now=16.5) == [["c"]]
