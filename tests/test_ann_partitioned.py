"""The ANN 100-TB layout claim, demonstrated: with the sign-LSH bucket as
the vector table's PARTITION KEY, the multi-probe restriction becomes a
partition filter — the scan touches ONLY the probe buckets' directories
and the result is identical to the map-side-filter ann_topk."""

import os

from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
N_PLANES = 8
N_FLIP = 1


def _emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _query_vec(spark):
    row = _emb(spark).filter(F.col("vec_id") == 0).select("embedding").collect()[0]
    return list(row["embedding"])


def test_partitioned_ann_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "bucketed")
    emb = _emb(spark)
    S.write_bucket_partitioned(emb, path, DIM, N_PLANES)
    qv = _query_vec(spark)

    part = S.ann_topk_partitioned(spark, path, qv, DIM, k=10, n_planes=N_PLANES, n_flip=N_FLIP)
    base = S.ann_topk(emb, qv, DIM, k=10, n_planes=N_PLANES, n_flip=N_FLIP)
    assert [tuple(r) for r in part.collect()] == [tuple(r) for r in base.collect()]

    # physical evidence 1: the filter reaches the scan as a PartitionFilter
    qb = S.query_bucket(qv, DIM, N_PLANES)
    probe = sorted({qb ^ m for m in S.probe_masks(N_PLANES, N_FLIP)})
    survivors = spark.read.parquet(path).filter(F.col("bucket").isin(probe))
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # physical evidence 2: only probe-bucket files are ever opened
    files = {
        r["f"]
        for r in survivors.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files, "probe set unexpectedly empty"
    for f in files:
        b = int(f.split("bucket=")[1].split("/")[0])
        assert b in probe
    # and the probe set is a strict subset of the written buckets
    written = {int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("bucket=")}
    assert len(probe) < len(written)
