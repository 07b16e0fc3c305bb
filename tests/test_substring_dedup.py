"""Exact substring dedup (operators/dedup.py substring_dedup_pairs —
Lee et al. 2022's ExactSubstr criterion at pair level): planted-overlap
recall, run-length recovery, threshold behavior, multiplicity, and
DuckDB oracle parity on the planted corpus (the sf-table parity runs in
test_queries_vs_duckdb via the text_dedup_pairs union row)."""

import duckdb
import pandas as pd
import pytest

from distributed_web_crawler_spark.operators.dedup import substring_dedup_pairs
from distributed_web_crawler_spark.queries import ORACLE_SQL

L = 15


def _w(prefix, n):
    return [f"{prefix}{k}" for k in range(n)]


@pytest.fixture(scope="module")
def planted(spark):
    span40 = _w("shared40_", 40)
    span15 = _w("shared15_", L)
    span14 = _w("shared14_", L - 1)
    docs = [
        # d0 carries all three planted spans, embedded at distinct offsets
        (0, " ".join(_w("a", 7) + span40 + _w("b", 5) + span15 + _w("c", 4) + span14 + _w("d", 3))),
        # d1 shares the 40-token span (different position) -> pair, run 40
        (1, " ".join(_w("e", 11) + span40 + _w("f", 6))),
        # d2 shares exactly the 15-token span -> pair, run 15
        (2, " ".join(_w("g", 3) + span15 + _w("h", 9))),
        # d3 shares only 14 consecutive tokens -> BELOW threshold, no pair
        (3, " ".join(_w("i", 8) + span14 + _w("j", 2))),
        # d4 unrelated
        (4, " ".join(_w("k", 30))),
        # d5 contains the 15-token span TWICE (multiplicity -> two islands
        # on two diagonals against d0/d2)
        (5, " ".join(span15 + _w("m", 4) + span15)),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    return spark.createDataFrame(pdf), pdf


def test_planted_recall_and_run_lengths(planted):
    df, _ = planted
    rows = {
        (r["a_id"], r["b_id"]): (r["n_matches"], r["max_run_tokens"])
        for r in substring_dedup_pairs(df, gram_len=L).collect()
    }
    # exactly the planted >= L overlaps; the 14-token overlap must NOT pair
    assert set(rows) == {(0, 1), (0, 2), (0, 5), (2, 5)}
    # a shared run of R tokens yields R-L+1 overlapping grams on one
    # diagonal -> max_run recovered exactly
    assert rows[(0, 1)] == (40 - L + 1, 40)
    assert rows[(0, 2)] == (1, L)
    # d5 carries the span twice: 2 matches against each single-copy doc
    assert rows[(0, 5)] == (2, L)
    # d2 vs d5: span15 once vs twice -> 2 position matches, run still L
    assert rows[(2, 5)] == (2, L)


def test_oracle_parity_on_planted_corpus(planted):
    df, pdf = planted
    got = (
        substring_dedup_pairs(df, gram_len=L)
        .toPandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.sql(ORACLE_SQL["substring_dedup"])
        .df()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_longer_gram_len_raises_threshold(planted):
    df, _ = planted
    # at L=41 nothing overlaps long enough
    assert substring_dedup_pairs(df, gram_len=41).count() == 0
    # at L=40 only the 40-token span survives
    rows = substring_dedup_pairs(df, gram_len=40).collect()
    assert [(r["a_id"], r["b_id"], r["max_run_tokens"]) for r in rows] == [(0, 1, 40)]


def test_adjacent_islands_merge_into_one_run(spark):
    """Two docs sharing one 2L-token run must report max_run = 2L (one
    island of L+1 overlapping grams), not two separate L runs."""
    span = _w("s", 2 * L)
    pdf = pd.DataFrame(
        [(0, " ".join(_w("x", 3) + span)), (1, " ".join(span + _w("y", 2)))],
        columns=["doc_id", "text"],
    )
    rows = substring_dedup_pairs(spark.createDataFrame(pdf), gram_len=L).collect()
    assert [(r["a_id"], r["b_id"], r["n_matches"], r["max_run_tokens"]) for r in rows] == [
        (0, 1, L + 1, 2 * L)
    ]


def test_strided_anchors_keep_guarantee_and_exact_values(planted):
    """stride=s: every pair sharing a run >= L+s-1 is still found, with
    (n_matches, max_run_tokens) IDENTICAL to stride=1 (extend-verify runs
    the full-gram logic on candidate docs); shorter runs may drop, and
    nothing outside the exact result may appear."""
    df, _ = planted
    s = 3
    exact = {
        (r["a_id"], r["b_id"]): (r["n_matches"], r["max_run_tokens"])
        for r in substring_dedup_pairs(df, gram_len=L).collect()
    }
    strided = {
        (r["a_id"], r["b_id"]): (r["n_matches"], r["max_run_tokens"])
        for r in substring_dedup_pairs(df, gram_len=L, stride=s).collect()
    }
    assert set(strided) <= set(exact)
    for pair, vals in strided.items():
        assert vals == exact[pair], pair
    # the guarantee: every exact pair with max_run >= L+s-1 survives
    for pair, (_n, run) in exact.items():
        if run >= L + s - 1:
            assert pair in strided, (pair, run)
    # concretely: the 40-token planted overlap is found with exact values
    assert strided[(0, 1)] == (40 - L + 1, 40)


def test_duplicate_spans_and_clean(spark):
    """Lee et al.'s actual pipeline OUTPUT: duplicated token spans (the
    lowest-doc copy survives) and the cleaned corpus. Planted layout with
    known exact spans, overlap merging, and a pass-through doc."""
    from distributed_web_crawler_spark.operators.dedup import (
        duplicate_spans,
        substring_dedup_clean,
    )

    span_a = _w("sa", 20)   # shared d0 -> d1 (one copy in each)
    span_b = _w("sb", 16)   # shared d0 -> d2, appears TWICE in d2
    docs = [
        (0, " ".join(_w("p", 2) + span_a + _w("q", 3) + span_b)),
        # d1: span_a at tokens 4..23
        (1, " ".join(_w("r", 3) + span_a + _w("s", 2))),
        # d2: span_b at 1..16 and again at 20..35 (both must be marked)
        (2, " ".join(span_b + _w("t", 3) + span_b)),
        # d3: untouched -> byte-identical pass-through
        (3, " ".join(_w("u", 25))),
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_spans(df, gram_len=L).collect()
    }
    assert spans == {(1, 4, 23), (2, 1, 16), (2, 20, 35)}, spans

    cleaned = {r["doc_id"]: (r["text"], r["n_removed_tokens"])
               for r in substring_dedup_clean(df, gram_len=L).collect()}
    # d0 keeps everything (first copy wins)
    assert cleaned[0] == (docs[0][1], 0)
    assert cleaned[3] == (docs[3][1], 0)  # untouched doc byte-identical
    assert cleaned[1] == (" ".join(_w("r", 3) + _w("s", 2)), 20)
    assert cleaned[2] == (" ".join(_w("t", 3)), 32)


def test_adjacent_spans_merge(spark):
    """Two duplicated runs that ABUT in the later doc merge into one span
    (the interval-merge pass), and the cleaned text drops both."""
    from distributed_web_crawler_spark.operators.dedup import (
        duplicate_spans,
        substring_dedup_clean,
    )

    s1, s2 = _w("m", L), _w("n", L)
    docs = [
        (0, " ".join(s1 + _w("x", 4))),
        (1, " ".join(_w("y", 4) + s2)),
        (2, " ".join(s1 + s2)),  # both spans, adjacent: 1..15 and 16..30
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_spans(df, gram_len=L).collect()
    }
    assert spans == {(2, 1, 2 * L)}, spans
    cleaned = {r["doc_id"]: r["text"] for r in substring_dedup_clean(df, gram_len=L).collect()}
    assert cleaned[2] == ""
