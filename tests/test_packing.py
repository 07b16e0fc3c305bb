"""Training-sequence packing + domain-mix reweighting
(operators/packing.py): the distributed prefix-sum must reproduce the
single-window cumsum exactly while genuinely decomposing over doc_id
range-chunks, and mix weights must rebalance to the target shares."""

from pyspark.sql import Window, functions as F

from distributed_web_crawler_spark.operators.packing import (
    PACK_CHUNK_BITS,
    domain_mix_weights,
    sequence_pack,
)

SEQ = 32


def _docs(spark, n=500):
    rows = [(i, " ".join(f"w{j}" for j in range((i * 13) % 37 + 1))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_sum_matches_single_window_and_decomposes(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r.asDict() for r in sequence_pack(docs, seq_len=SEQ).collect()}

    # reference: the naive single-task window
    toks = docs.select("doc_id", F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["start"]
        for r in toks.withColumn("start", F.coalesce(F.sum("n").over(w), F.lit(0))).collect()
    }
    assert {k: v["tok_start"] for k, v in got.items()} == want

    # decomposition evidence: the big cumsum window partitions by _chunk
    plan = sequence_pack(docs, seq_len=SEQ)._jdf.queryExecution().optimizedPlan().toString()
    assert "_chunk" in plan
    # and the docs genuinely span many chunks
    n_chunks = len({k * (1 << PACK_CHUNK_BITS) // 500 for k in got})
    assert n_chunks >= 16

    # sequence coordinates are internally consistent
    for k, v in got.items():
        assert v["seq_first"] == v["tok_start"] // SEQ
        assert v["offset_in_first"] == v["tok_start"] % SEQ
        last = max(v["tok_start"] + v["n_tokens"] - 1, v["tok_start"])
        assert v["seq_last"] == last // SEQ
    # concatenation is gapless: next doc starts where the previous ended
    ordered = [got[k] for k in sorted(got)]
    for a, b in zip(ordered, ordered[1:]):
        assert b["tok_start"] == a["tok_start"] + a["n_tokens"]


def test_domain_mix_weights_rebalance_to_targets(spark):
    rows = []
    # 60 en / 30 de / 10 fr docs via marker words
    for i in range(60):
        rows.append((i, "the quick fox and the dog"))
    for i in range(60, 90):
        rows.append((i, "der hund und die katze"))
    for i in range(90, 100):
        rows.append((i, "le chat et le chien"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    targets = {"en": 0.5, "de": 0.25, "fr": 0.25}
    out = domain_mix_weights(docs, targets).collect()
    assert len(out) == 100
    # weighted mass per language == target_share × corpus size
    mass = {}
    for r in out:
        mass[r["language"]] = mass.get(r["language"], 0.0) + r["weight"]
    assert abs(mass["en"] - 0.5 * 100) < 1e-3
    assert abs(mass["de"] - 0.25 * 100) < 1e-3
    assert abs(mass["fr"] - 0.25 * 100) < 1e-3

    # an untargeted stratum gets weight 0 (dropped from the mix)
    out2 = domain_mix_weights(docs, {"en": 1.0}).collect()
    assert all(r["weight"] == 0.0 for r in out2 if r["language"] != "en")
