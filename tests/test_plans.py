"""Plan-regression smoke for the load-bearing physical-plan properties
(the full audit lives in scripts/explain_audit.py → PLANS.md; this keeps
the cheapest, highest-value assertions in the per-commit suite at
sf0.001)."""

import io
from contextlib import redirect_stdout

from distributed_web_crawler_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"

MUST_CONTAIN = {
    "frontier_anti_join": ["BroadcastHashJoin", "LeftAnti"],
    "recovery_scan": ["TakeOrderedAndProject"],
    "status_histogram": ["ReadSchema: struct<o_orderstatus:string,o_orderpriority:string>"],
    "embedding_topk": ["TakeOrderedAndProject"],
    "ann_topk_partitioned": ["PartitionFilters: [bucket"],
    # the packing prefix-sum must be chunk-partitioned, never one window
    "sequence_pack": ["hashpartitioning(_chunk"],
    # scan pruned to the four consumed columns (props/event_type dropped)
    "session_stats": [
        "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,value:double>"
    ],
    # r9 shape: the per-part token list broadcasts AFTER the aggregate;
    # the linking-page count is a two-level distinct agg over raw fact
    # rows — the fact side never explodes (Generate is FORBIDDEN below)
    "anchor_text_index": ["BroadcastHashJoin", "partial_count(distinct"],
}
# r9b: n_users folds into size(collect_set) — ONE aggregate pair over ONE
# exchange; a reintroduced countDistinct would bring back the 4-aggregate
# / 2-exchange distinct chain
DEPTH_COLLECT_MAX_EXCHANGES = 1

FORBIDDEN = {
    # tokens are a pure function of the target part: no fact-side explode
    "anchor_text_index": ["Generate", "CartesianProduct"],
    "minhash_signature": ["CartesianProduct"],
    # gram pairs come from the hashed anchor equi-join, never all-pairs
    "substring_dedup": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "image_neardup": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "pagerank": ["CartesianProduct", "BroadcastNestedLoopJoin"],
    "sequence_pack": ["CartesianProduct"],
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_headline_plan_properties(spark):
    qs = Q.bench_queries()
    for name in sorted(set(MUST_CONTAIN) | set(FORBIDDEN)):
        plan = _plan(qs[name](spark, SF_DIR))
        for frag in MUST_CONTAIN.get(name, []):
            assert frag in plan, (name, frag, plan)
        for frag in FORBIDDEN.get(name, []):
            assert frag not in plan, (name, frag)


def test_depth_collect_single_aggregate_pass(spark):
    # r9b: both output columns derive from the one collect_set aggregate.
    # "Exchange (" counts tree nodes once (the details section renders
    # them as "(n) Exchange", which this fragment does not match)
    plan = _plan(Q.bench_queries()["depth_collect"](spark, SF_DIR))
    assert plan.count("Exchange (") <= DEPTH_COLLECT_MAX_EXCHANGES, plan
    assert "(distinct" not in plan, plan


def test_session_stats_single_exchange(spark):
    # both windows + the session aggregate must share ONE user_id shuffle
    import re

    plan = _plan(Q.q_session_stats(spark, SF_DIR))
    assert len(re.findall(r"\+- Exchange \(\d+\)", plan)) == 1, plan
