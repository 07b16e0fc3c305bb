"""Cuckoo seen-filter tests (functions/cuckoo.py — the north rule's
"bloom/cuckoo" second arm): no false negatives ever, exact deletion (the
capability Bloom lacks), deterministic builds, chunk-blob merge, capacity
failure, and engine-level equality — a crawl with seen_filter="cuckoo"
must produce exactly the oracle's (and the Bloom path's) result, because
both filters sit behind the same exact re-check."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_crawler_spark.functions import cuckoo as CK

P = CK.CuckooParams(n_buckets_log2=12)


def _keys(seed, n):
    return np.random.default_rng(seed).integers(-(2**63), 2**63 - 1, n, dtype=np.int64)


def test_no_false_negatives_at_high_load():
    f = CK.empty_filter(P)
    keys = _keys(42, 14000)  # ~85% of 16384 slots
    CK.add_hashes(f, keys, P)
    assert CK.contains(f, keys, P).all()


def test_false_positive_rate_bounded():
    f = CK.empty_filter(P)
    keys = _keys(7, 12000)
    CK.add_hashes(f, keys, P)
    other = np.setdiff1d(_keys(8, 50000), keys)
    # 4-slot buckets, 16-bit fp → FP ≈ 2*4/2^16 ≈ 1.2e-4
    assert CK.contains(f, other, P).mean() < 2e-3


def test_delete_is_exact_and_membership_survives_for_others():
    f = CK.empty_filter(P)
    keys = _keys(3, 14000)
    CK.add_hashes(f, keys, P)
    gone, kept = keys[:7000], np.setdiff1d(np.unique(keys[7000:]), keys[:7000])
    dmask = CK.delete_hashes(f, gone, P)
    assert dmask.all()  # every inserted key deletable
    # NO false negatives on survivors — deletion must never remove a
    # different key's fingerprint
    assert CK.contains(f, kept, P).all()
    # deleted keys may still FP through unrelated fingerprints (that is
    # what the exact re-check is for) but only at the FP rate
    resid = CK.contains(f, np.setdiff1d(gone, kept), P).sum()
    assert resid <= 8, resid


def test_set_semantics_insert_twice_delete_once():
    f = CK.empty_filter(P)
    keys = _keys(5, 1000)
    CK.add_hashes(f, keys, P)
    CK.add_hashes(f, keys, P)  # re-insert is a no-op, not a second copy
    occupied = (f != 0).sum()
    assert occupied <= len(np.unique(keys))
    assert CK.delete_hashes(f, keys, P).all()
    assert (f != 0).sum() == 0  # single delete empties the table


def test_deterministic_build():
    keys = _keys(1, 12000)
    f1, f2 = CK.empty_filter(P), CK.empty_filter(P)
    CK.add_hashes(f1, keys, P)
    CK.add_hashes(f2, keys, P)
    assert (f1 == f2).all()


def test_blob_roundtrip_and_chunk_merge(tmp_path):
    keys = _keys(2, 9000)
    base = CK.empty_filter(P)
    CK.add_hashes(base, keys[:3000], P)
    # chunked-round layout: each chunk blob = previous filter + its items
    b1, b2 = base.copy(), base.copy()
    CK.add_hashes(b1, keys[3000:6000], P)
    CK.add_hashes(b2, keys[6000:], P)
    p1, p2 = str(tmp_path / "c1.bin"), str(tmp_path / "c2.bin")
    CK.write_blob(p1, b1)
    CK.write_blob(p2, b2)
    merged = CK.load_blobs([p1, p2], P)
    assert CK.contains(merged, keys, P).all()
    solo = CK.load_blobs(p1, P)
    assert (solo == b1).all()
    assert (CK.load_blobs(None, P) == 0).all()


def test_capacity_error_is_actionable():
    tiny = CK.CuckooParams(n_buckets_log2=6)
    f = CK.empty_filter(tiny)
    with pytest.raises(CK.CuckooFullError, match="n_buckets_log2"):
        CK.add_hashes(f, _keys(9, 1000), tiny)


@settings(max_examples=30, deadline=None)
@given(
    ins=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=300),
    del_idx=st.lists(st.integers(0, 10**6), max_size=300),
)
def test_property_model_parity(ins, del_idx):
    """Model check against a plain Python set: membership has no false
    negatives after any insert/delete interleaving, and every delete of
    an inserted key succeeds. Deletions are drawn FROM the inserted set —
    the filter's documented contract (deleting a never-inserted key whose
    (bucket, fp) collides with a stored one is undefined, per the paper
    §3.3; the engine gates unsee candidates on the exact seen table)."""
    p = CK.CuckooParams(n_buckets_log2=10)
    f = CK.empty_filter(p)
    model = set()
    a = np.array(ins, dtype=np.int64)
    CK.add_hashes(f, a, p)
    model.update(a.tolist())
    dels = [ins[i % len(ins)] for i in del_idx] if ins else []
    d = np.array(dels, dtype=np.int64)
    got = CK.delete_hashes(f, d, p)
    for k, ok in zip(d.tolist(), got.tolist()):
        if k in model:
            assert ok, k
            model.discard(k)
    live = np.array(sorted(model), dtype=np.int64)
    if len(live):
        assert CK.contains(f, live, p).all()


def test_engine_cuckoo_matches_oracle_and_bloom(spark, corpus_1k, tmp_path):
    from distributed_web_crawler_spark.fixtures import corpus as C
    from distributed_web_crawler_spark.oracle.crawler import crawl
    from distributed_web_crawler_spark.plans.frontier import EngineConfig, FrontierEngine
    from tests.test_crawl_engine import pick_seed

    spec, path = corpus_1k
    seed_i = pick_seed(spec)
    res = crawl(seed_i, 3, spec)
    payloads, seens = {}, {}
    for name in ("bloom", "cuckoo"):
        cfg = EngineConfig(
            use_bloom=True, seen_buckets=8, seen_filter=name,
            cuckoo=CK.CuckooParams(n_buckets_log2=10),
        )
        eng = FrontierEngine(spark, str(tmp_path / f"wh_{name}"), path, spec, cfg)
        s = eng.run_job("job", C.url_of(seed_i, spec), 3)
        assert s["done"]
        payloads[name] = eng.client_payload("job", 3)
        seens[name] = {r["url"] for r in eng.seen_df("job").collect()}
    assert payloads["cuckoo"] == res.levels_sorted()
    assert payloads["cuckoo"] == payloads["bloom"]
    assert seens["cuckoo"] == res.seen == seens["bloom"]


def test_engine_rejects_unknown_filter(spark, corpus_1k, tmp_path):
    from distributed_web_crawler_spark.plans.frontier import EngineConfig, FrontierEngine

    spec, path = corpus_1k
    eng = FrontierEngine(
        spark, str(tmp_path / "wh"), path, spec, EngineConfig(seen_filter="xor")
    )
    with pytest.raises(ValueError, match="xor"):
        eng._seen_filter()


def test_shared_fingerprint_delete_hazard_and_rebuild_fix():
    """Two DISTINCT keys that collide on (bucket, fingerprint) share ONE
    stored copy (set-semantic insert — required by the chunked-blob entry
    merge), so an in-place delete of either key false-negatives the other.
    This pins WHY the engine's unsee path rebuilds touched blobs from the
    live seen rows instead of calling delete_hashes (ADVICE r7;
    plans/frontier.py _rebuild_filter_blobs)."""
    # same low 12 bits (i1) and same top 16 bits (fp) → same (bucket, fp)
    # pair; the middle bits differ, so the keys are distinct
    a = np.int64(0x1234_5000_0000_0ABC)
    b = np.int64(0x1234_5000_0100_0ABC)
    assert a != b
    f = CK.empty_filter(P)
    # sequential rounds (the engine's per-round blob folds): the second
    # insert sees contains()==True through the shared (bucket, fp) pair
    # and stores nothing — one copy owned by two keys
    CK.add_hashes(f, np.array([a]), P)
    CK.add_hashes(f, np.array([b]), P)
    assert (f != 0).sum() == 1  # one shared copy
    assert CK.contains(f, np.array([a, b]), P).all()

    # the hazard: deleting a strands b (false negative = lost-URL class)
    CK.delete_hashes(f, np.array([a]), P)
    assert not CK.contains(f, np.array([b]), P).any()

    # the engine's fix: rebuild from the exact surviving rows — contains
    # every live key by construction
    f2 = CK.empty_filter(P)
    CK.add_hashes(f2, np.array([b]), P)  # live set after deleting a
    assert CK.contains(f2, np.array([b]), P).all()
