"""Pure-Python oracle crawler — the reference stand-in (SURVEY.md §5.1).

Implements, single-process and obviously-correct, the exact crawl semantics
of the Go reference (file:line cites into /root/reference):

* per-depth BFS barrier — a depth fully drains before the next starts
  (Server/Cluster/Master/master.go:270-299, A1)
* first-discovery dedup across all prior depths
  (master.go:254-262, 679-681, U2) and within a round (master.go:680, U3)
* last-depth discard — links extracted at the final depth are dropped
  (master.go:676-683, F4)
* 1000-token parse cap → empty list, fetch-error → empty list, dead-link
  validity filter (Crawling.go:11,26,38,47; worker.go:153; utils.go:8-11) —
  all baked into fixtures.corpus.out_links
* results = every URL present in each depth's task map, regardless of
  status (Utils/utils.go:13-34, U4) — i.e. URL first-discovery depth

plus the north-rule extensions the reference lacks (BASELINE.json), modeled
deterministically so engine and oracle agree at sub-round granularity:

* per-host politeness budgets: within a depth, pending URLs drain in
  sub-rounds; each sub-round admits at most max_per_round(host) URLs per
  host, ordered by (host, xxh64(url)) — a pure function of the data, never
  of partition count (SURVEY.md §7 risk (d))
* robots.txt path-prefix blocking: blocked candidates are filtered after
  dedup and never enter the frontier (re-discovered blocked URLs are
  re-filtered, matching the reference's task-map-only seen semantics)

The Spark engine (plans/frontier.py) must reproduce: per-depth URL sets
(order-insensitive within a depth), the seen set, and the per-(depth,
sub-round) admitted sets when politeness is on.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from ..fixtures import corpus as C
from ..functions.xxh64 import xxh64_signed


@dataclass(frozen=True)
class PolitenessPolicy:
    """FIXTURES.md §3: crawl_delay_ms = 500*(1 + h%4);
    max_per_round = max(1, round_duration_ms // crawl_delay_ms)."""

    round_duration_ms: int = 4000

    def crawl_delay_ms(self, h: int) -> int:
        return 500 * (1 + h % 4)

    def max_per_round(self, h: int) -> int:
        return max(1, self.round_duration_ms // self.crawl_delay_ms(h))


@dataclass(frozen=True)
class RobotsPolicy:
    """FIXTURES.md §4: hosts with h % 16 == 7 disallow path prefix /p/3."""

    def disallow_prefixes(self, h: int) -> List[str]:
        return ["/p/3"] if h % 16 == 7 else []

    def blocked(self, i: int, spec: C.CorpusSpec) -> bool:
        h = C.host_of(i, spec)
        path = f"/p/{i}"
        return any(path.startswith(p) for p in self.disallow_prefixes(h))


@dataclass
class OracleResult:
    levels: List[Set[str]]  # URL set per depth 0..depth-1 (U4 view)
    seen: Set[str]  # == union of levels (reference urlInTasks scope)
    # (depth, sub_round) -> admitted URL set; politeness=None ⇒ one
    # sub-round per depth containing the whole level
    schedule: List[Tuple[int, int, Set[str]]] = field(default_factory=list)
    n_fetched: int = 0
    n_blocked: int = 0  # robots drops (re-discoveries re-counted — see module doc)

    def levels_sorted(self) -> List[List[str]]:
        return [sorted(s) for s in self.levels]


def _order_key(i: int, spec: C.CorpusSpec) -> Tuple[int, int, str]:
    # (host, SIGNED xxh64, url) — identical to the engine's window order
    # (operators/politeness.py), which sorts by the signed JVM xxhash64
    u = C.url_of(i, spec)
    return (C.host_of(i, spec), xxh64_signed(u), u)


def crawl(
    seed_index: int,
    depth: int,
    spec: C.CorpusSpec,
    politeness: Optional[PolitenessPolicy] = None,
    robots: Optional[RobotsPolicy] = None,
) -> OracleResult:
    """BFS crawl of `depth` levels from page `seed_index` over the synthetic
    corpus. Returns per-depth URL sets, the seen set, and the deterministic
    politeness schedule."""
    assert depth >= 1
    res = OracleResult(levels=[set() for _ in range(depth)], seen=set())

    if robots is not None and robots.blocked(seed_index, spec):
        res.n_blocked += 1
        return res

    seed_url = C.url_of(seed_index, spec)
    res.levels[0].add(seed_url)
    res.seen.add(seed_url)
    level: List[int] = [seed_index]

    for d in range(depth):
        if not level:
            break
        # ---- politeness: drain this depth in deterministic sub-rounds
        pending = sorted(level, key=lambda i: _order_key(i, spec))
        sub = 0
        next_level: List[int] = []
        while pending:
            if politeness is None:
                admitted, pending = pending, []
            else:
                admitted, rest, taken = [], [], {}
                for i in pending:
                    h = C.host_of(i, spec)
                    if taken.get(h, 0) < politeness.max_per_round(h):
                        taken[h] = taken.get(h, 0) + 1
                        admitted.append(i)
                    else:
                        rest.append(i)
                pending = rest
            res.schedule.append((d, sub, {C.url_of(i, spec) for i in admitted}))
            res.n_fetched += len(admitted)

            if d + 1 < depth:  # F4: last-depth links are discarded
                # extraction order within a sub-round is irrelevant:
                # first-discovery collapses to set-insert (U2/U3)
                for i in admitted:
                    for t in C.out_links(i, spec):
                        u = C.url_of(t, spec)
                        if u in res.seen:
                            continue  # U2 cross-depth / U3 within-round dedup
                        if robots is not None and robots.blocked(t, spec):
                            res.n_blocked += 1
                            continue  # blocked: never enters maps nor seen
                        res.seen.add(u)
                        res.levels[d + 1].add(u)
                        next_level.append(t)
            sub += 1
        level = next_level

    return res
