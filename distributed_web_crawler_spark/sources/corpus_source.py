"""Corpus table builder/reader (the engine's S4 "web" — SURVEY.md §2.1).

The corpus is written partitioned by ``bucket = i % N_BUCKETS`` so each
crawl round's fetch join prunes its parquet scan to only the buckets the
round touches — the sandbox analog of Iceberg ``bucket(image_id)``
partition pruning (SURVEY.md §4). The round's admitted frontier is tiny
relative to the corpus, so the join is `broadcast(admitted) ⋈ corpus-scan`
with partition filters pushed down; the 100 TB plan never full-scans the
corpus per round.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fixtures import corpus as C

CORPUS_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "bucket int, bytes binary, phash bigint"
)


def build_corpus(spark: SparkSession, spec: C.CorpusSpec, path: str, slices: int | None = None) -> str:
    """Distributed deterministic generation: spark.range(n) → mapInPandas
    over the shared fixture rules → parquet partitioned by bucket.
    Idempotent: returns immediately if `path` already holds a corpus of
    matching size."""
    marker = os.path.join(path, "_SPEC")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == f"{spec.n}:{spec.seed}:{spec.n_hosts}":
                return path

    slices = slices or max(8, spec.n // 20_000)

    def gen(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield from C.generate_batches(np.asarray(ids), spec)

    df = spark.range(0, spec.n, numPartitions=slices).mapInPandas(gen, schema=CORPUS_SCHEMA)
    df.write.mode("overwrite").partitionBy("bucket").parquet(path)
    with open(marker, "w") as f:
        f.write(f"{spec.n}:{spec.seed}:{spec.n_hosts}")
    return path


def read_corpus(spark: SparkSession, path: str, buckets: Iterable[int] | None = None) -> DataFrame:
    """Read the corpus, pruned to the given storage buckets when known.
    `.explain` shows the bucket values as PartitionFilters — no data files
    outside those buckets are opened."""
    df = spark.read.parquet(path)
    if buckets is not None:
        df = df.filter(F.col("bucket").isin(list(buckets)))
    return df
