"""Hand-computable cases for the round-6 additions: HITS hub/authority
ranking, Lloyd k-means, and batch gap-sessionization. The parametrized
oracle-equivalence suite (test_queries_vs_duckdb) covers the full-table
parity; these pin the SEMANTICS against values small enough to verify by
hand."""

import datetime

import pytest

from distributed_web_crawler_spark.operators.hits import hits
from distributed_web_crawler_spark.operators.similarity import (
    ivf_centroids,
    kmeans_fit,
)
from distributed_web_crawler_spark.streaming.sessions import session_stats

DIM = 8
K = 4


def test_hits_hand_graph(spark):
    # a -> x, a -> y, b -> y  (a, b pure hubs; x, y pure authorities)
    # hub0 = 1 everywhere
    # auth1: x=1 (from a), y=2 (a+b);  hub1: a=1+2=3, b=2
    # auth2: x=3, y=3+2=5;             hub2: a=3+5=8, b=5
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "y")], "src string, dst string"
    )
    out = {r["url"]: (r["hub"], r["auth"]) for r in hits(edges, n_iters=2).collect()}
    assert out["a"] == (1.0, 0.0)  # hub 8/8
    assert out["b"] == (5.0 / 8.0, 0.0)
    assert out["x"] == (0.0, 3.0 / 5.0)
    assert out["y"] == (0.0, 1.0)  # auth 5/5


def test_hits_parallel_edge_multiplicity(spark):
    # duplicated edge doubles the contribution (matches the oracle's
    # plain-join arithmetic)
    edges = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x")], "src string, dst string"
    )
    out = {r["url"]: (r["hub"], r["auth"]) for r in hits(edges, n_iters=1).collect()}
    # auth1: x = 2 (a twice) + 1 (b) = 3;  hub1: a = 2*3 = 6, b = 3
    assert out["a"][0] == 1.0 and out["b"][0] == 0.5
    assert out["x"][1] == 1.0


def test_hits_empty_graph(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert hits(edges).collect() == []


def test_kmeans_planted_clusters(spark):
    # plant tight clusters on 3 of the K init centroids: after 2 Lloyd
    # rounds every point sits in its planted cell, the empty cells carry
    # the init codebook unchanged, and each learned centroid equals the
    # planted cluster mean to micro-unit quantization
    cents = ivf_centroids(DIM, K)
    rows, expected = [], {}
    vid = 0
    for c in (0, 2, 3):
        pts = []
        for j in range(5):
            # deterministic offsets, small vs inter-centroid distances
            vec = [cents[c][d] + 0.001 * ((j + d) % 3 - 1) for d in range(DIM)]
            rows.append((vid, vec))
            pts.append(vec)
            vid += 1
        expected[c] = [sum(p[d] for p in pts) / len(pts) for d in range(DIM)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["cell"]: r for r in kmeans_fit(emb, DIM, n_centroids=K, n_iters=2).collect()}
    assert set(out) == set(range(K))
    assert sum(r["n"] for r in out.values()) == vid
    assert out[1]["n"] == 0 and out[1]["centroid"] == pytest.approx(cents[1], abs=0)
    for c in (0, 2, 3):
        assert out[c]["n"] == 5
        assert out[c]["centroid"] == pytest.approx(expected[c], abs=1e-6)


def test_kmeans_total_mass_on_sf(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    total = emb.count()
    out = kmeans_fit(emb, 64, n_centroids=16, n_iters=2).collect()
    assert len(out) == 16
    assert sum(r["n"] for r in out) == total
    assert all(len(r["centroid"]) == 64 for r in out)


def _ts(minute):
    return datetime.datetime(2024, 1, 1, 0, 0) + datetime.timedelta(minutes=minute)


def test_session_stats_hand_events(spark):
    gap_ms = 10 * 60 * 1000  # 10 min
    rows = [
        # user 1: events at 0, 5, 9 min (one session), then 30, 33 (second)
        (1, 1, _ts(0), 1.0),
        (2, 1, _ts(5), 2.0),
        (3, 1, _ts(9), 3.0),
        (4, 1, _ts(30), 4.0),
        (5, 1, _ts(33), 5.0),
        # user 2: single event
        (6, 2, _ts(7), 10.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        (r["user_id"], r["sess_id"]): r
        for r in session_stats(events, gap_ms=gap_ms).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 3 and s11["duration_ms"] == 9 * 60 * 1000
    assert s11["sum_value"] == 6.0
    s12 = out[(1, 2)]
    assert s12["n_events"] == 2 and s12["duration_ms"] == 3 * 60 * 1000
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["duration_ms"] == 0


def test_session_boundary_is_strict_gap(spark):
    # a gap of EXACTLY gap_ms does not break the session (predicate is >)
    gap_ms = 60_000
    events = spark.createDataFrame(
        [(1, 1, _ts(0), 0.0), (2, 1, _ts(1), 0.0), (3, 1, _ts(3), 0.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = session_stats(events, gap_ms=gap_ms).collect()
    # 0→1 min gap == 60000 stays; 1→3 min gap 120000 breaks
    assert sorted((r["sess_id"], r["n_events"]) for r in out) == [(1, 2), (2, 1)]


def test_length_quantiles_hand(spark):
    from distributed_web_crawler_spark.operators.textstats import length_quantiles

    # 10 docs, lengths 1..10: rank(p50) = (9*1)//2+1 = 5 → value 5;
    # rank(p90) = (9*9)//10+1 = 9 → 9; rank(p99) = (9*99)//100+1 = 9 → 9
    rows = [(i, "x", "en", "s", i) for i in range(1, 11)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = length_quantiles(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lang"], r["n_docs"], r["p50"], r["p90"], r["p99"]) == ("en", 10, 5, 9, 9)


def test_length_quantiles_single_doc(spark):
    from distributed_web_crawler_spark.operators.textstats import length_quantiles

    docs = spark.createDataFrame(
        [(1, "x", "fr", "s", 42)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = length_quantiles(docs).collect()[0]
    assert (r["p50"], r["p90"], r["p99"]) == (42, 42, 42)


def test_top_bigrams_hand(spark):
    from distributed_web_crawler_spark.operators.textstats import top_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    out = [(r["bigram"], r["n"]) for r in top_bigrams(docs, k=3).collect()]
    # counts: 'a b' ×3 (twice in doc1, once in doc2), 'b a' ×1, 'b c' ×1,
    # 'b x' ×1 — ties break alphabetically
    assert out == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_top_bigrams_short_docs(spark):
    from distributed_web_crawler_spark.operators.textstats import top_bigrams

    docs = spark.createDataFrame([(1, "solo"), (2, "")], "doc_id long, text string")
    assert top_bigrams(docs, k=5).collect() == []


def test_hits_deep_iteration_checkpoint_boundary(spark):
    # n_iters == checkpoint_every exercises the step-checkpoint firing on
    # the LAST iteration — the manually-persisted final inflow must
    # survive it (a tracked handle would be released before the final
    # projection reads it). Exact integer reference computed locally.
    import numpy as np

    edges = [("a", "x"), ("a", "y"), ("b", "y"), ("c", "x"), ("c", "z")]
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] += 1
    hub = np.ones(len(nodes))
    for _ in range(5):
        auth = A.T @ hub
        hub = A @ auth
    exp_hub, exp_auth = hub / hub.max(), auth / auth.max()

    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["url"]: r for r in hits(df, n_iters=5, checkpoint_every=5).collect()}
    for u in nodes:
        assert out[u]["hub"] == exp_hub[idx[u]], u
        assert out[u]["auth"] == exp_auth[idx[u]], u


def test_session_stats_random_model(spark):
    # seeded random event log vs a pure-Python sessionizer: same sessions,
    # same counts, same epoch-ms arithmetic
    import random

    rng = random.Random(1234)
    gap_ms = 5 * 60 * 1000
    rows = []
    eid = 0
    for uid in range(1, 9):
        t = datetime.datetime(2024, 3, 1) + datetime.timedelta(seconds=rng.randrange(3600))
        for _ in range(rng.randrange(1, 40)):
            rows.append((eid, uid, t, float(rng.randrange(100))))
            eid += 1
            t += datetime.timedelta(milliseconds=rng.choice([10, 500, 30_000, 299_999, 300_000, 300_001, 3_600_000]))
    # python reference (events generated in time order per user)
    expected = {}
    for uid in range(1, 9):
        evs = [(r[2], r[0], r[3]) for r in rows if r[1] == uid]
        evs.sort()
        sess, prev = 0, None
        for ts, _eid, val in evs:
            # exact integer epoch-ms (naive UTC, like the session tz pin)
            ms = (ts - datetime.datetime(1970, 1, 1)) // datetime.timedelta(milliseconds=1)
            if prev is None or ms - prev > gap_ms:
                sess += 1
            prev = ms
            key = (uid, sess)
            n, lo, hi, sv = expected.get(key, (0, ms, ms, 0.0))
            expected[key] = (n + 1, min(lo, ms), max(hi, ms), sv + val)
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        (r["user_id"], r["sess_id"]): (r["n_events"], r["start_ms"], r["end_ms"], r["sum_value"])
        for r in session_stats(events, gap_ms=gap_ms).collect()
    }
    assert set(got) == set(expected)
    for k, (n, lo, hi, sv) in expected.items():
        gn, glo, ghi, gsv = got[k]
        assert (gn, glo, ghi) == (n, lo, hi), k
        assert gsv == round(sv, 3), k
