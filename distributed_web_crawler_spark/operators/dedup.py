"""Deduplication operators for the training-data pipeline: exact,
MinHash(+LSH bands), SimHash, and shingle-Jaccard near-dup pairs.

All are compositions of built-in DataFrame ops (explode / groupBy / join)
over the portable md5-60-bit hash so every one of them has a bit-exact
DuckDB oracle (queries.py). At 100 TB the shapes hold: shingling is a
narrow map, signatures are one hash-aggregate (shuffle by doc_id), LSH
banding turns the quadratic pair search into an equi-join on band keys,
and the final verify join only touches candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.portable_hash import hash60

N_MINHASHES = 4
SHINGLE = 3  # words per shingle


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the keeper
    (min doc_id) and the duplicate count."""
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingles(docs: DataFrame) -> DataFrame:
    """Distinct 3-word shingles per doc: (doc_id, s)."""
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # NB: Spark sequence(1, 0) would count DOWN — guard short docs explicitly
    sh = F.when(
        F.size(words) >= SHINGLE,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (SHINGLE - 1)),
            lambda k: F.concat_ws(" ", F.slice(words, k, SHINGLE)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(sh).alias("s")).dropDuplicates(["doc_id", "s"])
    )


def minhash_signatures(docs: DataFrame, k: int = N_MINHASHES) -> DataFrame:
    """k MinHash values per doc over 3-word shingles: h_i = min over shingles
    of hash60(concat(i, ':', shingle))."""
    sh = shingles(docs)
    aggs = [
        F.min(hash60(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(f"h{i}") for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, k: int = N_MINHASHES, rows_per_band: int = 2) -> DataFrame:
    """LSH banding: docs agreeing on all hashes of any band become candidate
    near-dup pairs — the scale path that avoids the quadratic compare."""
    sig = minhash_signatures(docs, k)
    bands = []
    for b in range(k // rows_per_band):
        cols = [F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id", F.lit(b).alias("band"), F.concat_ws("_", *[c.cast("string") for c in cols]).alias("key")
            )
        )
    bkeys = bands[0]
    for x in bands[1:]:
        bkeys = bkeys.unionByName(x)
    a = bkeys.alias("a")
    b_ = bkeys.alias("b")
    return (
        a.join(b_, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.25) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs that share ≥1 shingle.
    (n-gram Jaccard near-dup; the verify stage behind LSH at scale.)"""
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return j


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over distinct words: bit b is the sign of the vote
    sum over tokens of ±1 by the token hash's bit b."""
    words = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    toks = docs.select("doc_id", F.explode(words).alias("w")).dropDuplicates(["doc_id", "w"])
    toks = toks.withColumn("h", hash60(F.col("w")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bits = None
    for b in range(16):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return agg.select("doc_id", bits.cast("long").alias("simhash"))
