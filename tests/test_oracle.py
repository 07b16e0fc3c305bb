"""Oracle crawler semantics (SURVEY.md §5.1) — property checks derived from
the reference behavior, plus politeness/robots extension invariants."""

from distributed_web_crawler_spark.fixtures import corpus as C
from distributed_web_crawler_spark.oracle.crawler import (
    PolitenessPolicy,
    RobotsPolicy,
    crawl,
)

SPEC = C.CorpusSpec(n=1000)


def pick_seed(min_degree=3):
    for i in range(SPEC.n):
        if len(C.out_links(i, SPEC)) >= min_degree and not C.is_oversized(i, SPEC):
            return i
    raise AssertionError


def test_depth1_is_seed_only():
    # F4: links extracted at the final depth are discarded (master.go:676-683)
    s = pick_seed()
    r = crawl(s, 1, SPEC)
    assert r.levels_sorted() == [[C.url_of(s, SPEC)]]
    assert r.seen == {C.url_of(s, SPEC)}


def test_depth2_equals_seed_plus_links():
    s = pick_seed()
    r = crawl(s, 2, SPEC)
    expect = {C.url_of(t, SPEC) for t in C.out_links(s, SPEC)} - {C.url_of(s, SPEC)}
    assert r.levels[1] == expect


def test_levels_disjoint_and_union_is_seen():
    r = crawl(pick_seed(), 3, SPEC)
    all_urls = set()
    for lvl in r.levels:
        assert not (lvl & all_urls)  # U2 first-discovery: no URL twice
        all_urls |= lvl
    assert all_urls == r.seen


def test_bfs_prefix_property():
    # levels of a depth-d crawl == first d levels of a depth-(d+1) crawl
    s = pick_seed()
    r2, r3 = crawl(s, 2, SPEC), crawl(s, 3, SPEC)
    assert r2.levels_sorted() == r3.levels_sorted()[:2]


def test_oversized_and_error_pages_yield_nothing():
    for i in range(SPEC.n):
        if C.is_oversized(i, SPEC) or C.is_fetch_error(i, SPEC):
            r = crawl(i, 2, SPEC)
            assert r.levels[1] == set()
            break
    else:
        raise AssertionError("no quirk page found")


def test_politeness_budgets_respected_and_sets_unchanged():
    pol = PolitenessPolicy(round_duration_ms=4000)
    s = pick_seed()
    base = crawl(s, 3, SPEC)
    r = crawl(s, 3, SPEC, politeness=pol)
    # politeness changes the schedule, never the final sets
    assert r.levels_sorted() == base.levels_sorted()
    assert r.seen == base.seen
    for _, _, admitted in r.schedule:
        per_host = {}
        for u in admitted:
            h = int(C.host_of_url(u)[1:5])
            per_host[h] = per_host.get(h, 0) + 1
        for h, n in per_host.items():
            assert n <= pol.max_per_round(h)
    # every URL of depth d is admitted in exactly one sub-round of depth d
    for d in range(3):
        got = set()
        for dd, _, admitted in r.schedule:
            if dd == d:
                assert not (admitted & got)
                got |= admitted
        assert got == r.levels[d]


def test_robots_blocks_prefix():
    rob = RobotsPolicy()
    # find a page on a robots host with a blocked index (path /p/3...)
    blocked = [i for i in range(SPEC.n) if rob.blocked(i, SPEC)]
    assert blocked, "fixture should produce some blocked pages"
    for i in blocked:
        assert C.host_of(i, SPEC) % 16 == 7 and str(i).startswith("3")
    s = pick_seed()
    r = crawl(s, 3, SPEC, robots=rob)
    assert not any(rob.blocked(C.index_of_url(u), SPEC) for u in r.seen)
