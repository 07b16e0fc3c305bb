"""Training-sequence packing — the "concat documents, chunk into
fixed-token sequences" step every LLM pre-training pipeline runs between
the cleaned corpus and the data loader (GPT-style packing: documents are
concatenated in a deterministic global order and sliced into SEQ_LEN-token
windows; a document therefore maps to a [start_seq, end_seq] range and a
byte/token offset inside its first sequence).

Spark shape: the global token prefix-sum over doc order is the only
cross-row dependency, and a naive `sum() over (order by doc_id rows
unbounded preceding)` window moves EVERY row through ONE task (Spark
warns "No Partition Defined for Window"). Same fix as the politeness
mega-host ranking (operators/politeness.py): range-chunk the order key —
doc_id ranges are monotone in the order — compute per-chunk local
cumsums, and recover the global prefix by adding the broadcast prefix
count of earlier chunks. The offset table is one row per chunk
(control-plane sized); no single task ever holds more than ~1/2^bits of
the corpus. Output is a PACKING MANIFEST (doc -> sequence coordinates),
not materialized sequences — at 100 TB the manifest is what the loader
shards on, and token payload stays in place.

Determinism: pure function of (doc_id order, token counts, seq_len) —
identical at any parallelism, so the DuckDB oracle is an exact SQL window
cumsum over the same token-count expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import token_count_col

PACK_CHUNK_BITS = 6  # 64 doc_id range-chunks for the distributed prefix-sum


def sequence_pack(docs: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Packing manifest: one row per doc —
    (doc_id, n_tokens, tok_start, seq_first, seq_last, offset_in_first)
    where tok_start is the global token prefix (exclusive) in doc_id
    order, seq_first/last the fixed-length sequence ids the doc spans,
    and offset_in_first its token offset inside seq_first."""
    toks = docs.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    # distributed prefix-sum: chunk on doc_id RANGES (monotone in the
    # doc_id order — doc ids are dense from 0, so fixed-width ranges, not
    # high bits), local cumsum per chunk, broadcast prefix offsets. The
    # max() pre-pass is one tiny aggregate job.
    max_id = toks.agg(F.max("doc_id")).collect()[0][0]
    if max_id is None:
        return toks.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("tok_start"),
            F.lit(0).cast("long").alias("seq_first"),
            F.lit(0).cast("long").alias("seq_last"),
            F.lit(0).cast("long").alias("offset_in_first"),
        )
    width = max(1, (int(max_id) + 1) // (1 << PACK_CHUNK_BITS))
    chunked = toks.withColumn(
        "_chunk", F.floor(F.col("doc_id") / width).cast("long")
    )
    ow = (
        Window.orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        chunked.groupBy("_chunk")
        .agg(F.sum("n_tokens").alias("_c"))
        .withColumn("_off", F.coalesce(F.sum("_c").over(ow), F.lit(0)))
        .select("_chunk", "_off")
    )
    w = (
        Window.partitionBy("_chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        chunked.withColumn("_local", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .join(F.broadcast(offsets), "_chunk")
        .withColumn("tok_start", F.col("_local") + F.col("_off"))
        .drop("_chunk", "_local", "_off")
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / seq_len).cast("long").alias("seq_first"),
        # empty docs (0 tokens) span no sequence: pin seq_last = seq_first
        F.greatest(
            F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / seq_len),
            F.floor(F.col("tok_start") / seq_len),
        ).cast("long").alias("seq_last"),
        F.pmod(F.col("tok_start"), F.lit(seq_len)).cast("long").alias("offset_in_first"),
    )


def domain_mix_weights(
    docs: DataFrame, targets: dict[str, float], persisted: list | None = None
) -> DataFrame:
    """Per-document sampling weight that rebalances the corpus toward a
    target language mix (the data-mixture step of a training pipeline:
    weight = target_share / actual_share of the doc's stratum, so
    weighted sampling reproduces the target distribution). Strata the
    target dict does not name get weight 0 (dropped from the mix).

    Scale shape: one tiny groupBy(language) aggregate (≤ languages rows,
    broadcast back) + a narrow map — no wide shuffle of the corpus.

    r9 (guide §1.2 "don't compute things twice"): the lang-guess
    projection — the expensive part, a tokenize + 4 marker-set filters
    per doc — used to be evaluated THREE times (a separate count() for
    the total, the shares aggregate, and the final join's left side;
    Catalyst does not share subplans across actions/branches). Now it is
    persisted once and the total comes from summing the tiny per-language
    counts (identical integer, so actual_share's double division is
    bit-identical). Pass `persisted` (a list) to receive the cache handle
    for cleanup after the consuming action (same contract as
    dedup.jaccard_verified_pairs). The guess itself uses the staged
    projection (textstats.with_lang_guess) — split once, one filter per
    marker set."""
    from .textstats import with_lang_guess

    lang = with_lang_guess(docs.select("doc_id", "text"), "language").select(
        "doc_id", "language"
    ).persist()
    if persisted is not None:
        persisted.append(lang)
    counts = lang.groupBy("language").agg(F.count("*").alias("_n"))
    shares = counts.withColumn(
        "actual_share",
        F.col("_n") / F.sum("_n").over(Window.partitionBy()),
    ).select("language", "actual_share")
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        "language string, target_share double",
    )
    return (
        lang.join(F.broadcast(shares), "language")
        .join(F.broadcast(tgt), "language", "left")
        .select(
            "doc_id",
            "language",
            F.round(
                F.coalesce(F.col("target_share") / F.col("actual_share"), F.lit(0.0)), 6
            ).alias("weight"),
        )
    )
