"""Model-based property test for the keyed-delta AtomicTable scheme: any
interleaving of ledger/cache ops + compact() must leave the folded state
equal to a plain in-memory model, across fresh-memo readers and version
reconstruction. This is the same scalar-vs-batch discipline the hash
kernels get (test_batch_kernel_properties), applied to the round-6
control-plane rewrite."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_web_crawler_spark.catalog.changes import snapshots
from distributed_web_crawler_spark.catalog.tables import AtomicTable, read_table_version
from distributed_web_crawler_spark.plans.ledger import JobCache, JobLedger

# ops: (kind, key_idx, arg) — key space kept small so updates/deletes hit
LEDGER_OPS = st.lists(
    st.tuples(
        st.sampled_from(["submit", "acquire", "progress", "complete", "compact"]),
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=LEDGER_OPS)
def test_ledger_matches_inmemory_model(tmp_path_factory, ops):
    wh = str(tmp_path_factory.mktemp("dl"))
    led = JobLedger(wh)
    model: dict = {}  # job_id -> row dict (insertion-ordered, like the table)
    now = [1000.0]

    for kind, ki, arg in ops:
        now[0] += 1.0
        jid = f"J{ki}"
        if kind == "submit":
            ok = led.submit(jid, "c", f"u{ki}", depth=1 + arg % 3, now=now[0], priority=arg)
            assert ok == (jid not in model)
            if ok:
                model[jid] = {
                    "job_id": jid, "state": "pending", "priority": arg,
                    "assigned_at": now[0], "last_round": -1,
                }
        elif kind == "acquire":
            got = led.acquire("m1", now=now[0], timeout_s=60.0)
            pend = sorted(
                (r for r in model.values() if r["state"] == "pending"),
                key=lambda r: (r["priority"], r["assigned_at"]),
            )
            if not pend:
                pend = sorted(
                    (r for r in model.values()
                     if r["state"] == "running" and now[0] - r["assigned_at"] > 60.0),
                    key=lambda r: r["assigned_at"],
                )
            if not pend:
                assert got is None
            else:
                assert got is not None and got["job_id"] == pend[0]["job_id"]
                m = model[got["job_id"]]
                m["state"], m["assigned_at"] = "running", now[0]
        elif kind == "progress":
            led.progress(jid, last_round=arg, now=now[0])
            if jid in model:
                model[jid]["last_round"] = arg
                model[jid]["assigned_at"] = now[0]
        elif kind == "complete":
            led.complete(jid)
            if jid in model:
                model[jid]["state"] = "done"
        else:  # compact
            AtomicTable(wh, "job_ledger").compact(keep_last=3)

    # 1) live read matches the model, including row ORDER (submit order)
    got = led._t.read()
    assert list(got["job_id"]) == list(model)
    for _, row in got.iterrows():
        m = model[row["job_id"]]
        for k in ("state", "priority", "last_round", "assigned_at"):
            assert row[k] == m[k], (row["job_id"], k)

    # 2) a FRESH reader (new process analog: no memo) folds to the same state
    got2 = JobLedger(wh)._t.read()
    pd.testing.assert_frame_equal(got, got2)

    # 3) every surviving version reconstructs without error, and the newest
    # equals the live state
    t = AtomicTable(wh, "job_ledger")
    vs = snapshots(t)
    if vs:
        for v in vs:
            read_table_version(t, v)
        newest = read_table_version(t, vs[-1]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            newest[got.columns], got.reset_index(drop=True)
        )


CACHE_OPS = st.lists(
    st.tuples(
        st.sampled_from(["put", "get", "compact"]),
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=1, max_value=4),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ops=CACHE_OPS)
def test_cache_matches_inmemory_model(tmp_path_factory, ops):
    """Depth-monotone upsert + TTL + LFU eviction over the delta scheme vs a
    plain dict model (max_entries=3 so eviction fires constantly)."""
    wh = str(tmp_path_factory.mktemp("dc"))
    cache = JobCache(wh, ttl_s=50.0, max_entries=3)
    model: dict = {}  # seed -> {depth, expires_at, hits, results}
    now = [0.0]

    def evict(keep):
        if len(model) <= 3:
            return
        # expired first (free), then lowest (hits, expires_at); keep_url exempt
        for k in [k for k, v in model.items() if v["expires_at"] <= now[0] and k != keep]:
            del model[k]
        overflow = len(model) - 3
        if overflow > 0:
            victims = sorted(
                (k for k in model if k != keep),
                key=lambda k: (model[k]["hits"], model[k]["expires_at"]),
            )[:overflow]
            for k in victims:
                del model[k]

    for kind, ki, depth in ops:
        now[0] += 3.0
        seed = f"u{ki}"
        if kind == "put":
            res = [[f"r{ki}-{d}"] for d in range(depth)]
            ok = cache.put_if_deeper(seed, depth, res, now=now[0])
            live = seed in model and model[seed]["expires_at"] > now[0]
            want = not (live and model[seed]["depth"] >= depth)
            assert ok == want
            if want:
                model[seed] = {
                    "depth": depth, "expires_at": now[0] + 50.0, "hits": 0, "results": res,
                }
                evict(seed)
        elif kind == "get":
            got = cache.get(seed, depth, now=now[0])
            live = seed in model and model[seed]["expires_at"] > now[0]
            if live and model[seed]["depth"] >= depth:
                assert got == model[seed]["results"][:depth]
                model[seed]["expires_at"] = now[0] + 50.0
                model[seed]["hits"] += 1
            else:
                assert got is None
        else:
            AtomicTable(wh, "job_cache").compact(keep_last=3)

    got = cache._t.read()
    assert set(got["seed_url"]) == set(model)
    for _, row in got.iterrows():
        m = model[row["seed_url"]]
        assert (row["depth"], row["expires_at"], row["hits"]) == (
            m["depth"], m["expires_at"], m["hits"],
        )
