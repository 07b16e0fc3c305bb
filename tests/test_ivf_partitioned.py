"""The IVF 100-TB layout claim, demonstrated (completing the triad with
ann_topk_partitioned and pagerank's bucketed edges): with the inverted-
list cell as the vector table's PARTITION KEY, the n_probe restriction
becomes a partition filter — the scan touches ONLY the probe cells'
directories and the result is identical to the map-side-filter ivf_topk."""

import os

from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
N_CENTROIDS = 16
N_PROBE = 4


def test_partitioned_ivf_prunes_and_matches(spark, tmp_path):
    path = str(tmp_path / "cells")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    S.write_cell_partitioned(emb, path, DIM, N_CENTROIDS)
    qv = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0]["embedding"]
    )

    part = S.ivf_topk_partitioned(
        spark, path, qv, k=10, dim=DIM, n_centroids=N_CENTROIDS, n_probe=N_PROBE
    )
    base = S.ivf_topk(emb, qv, DIM, k=10, n_centroids=N_CENTROIDS, n_probe=N_PROBE)
    assert [tuple(r) for r in part.collect()] == [tuple(r) for r in base.collect()]

    # physical evidence 1: the probe set reaches the scan as a PartitionFilter
    probe = S.ivf_probe_cells(qv, DIM, N_CENTROIDS, N_PROBE)
    survivors = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # physical evidence 2: only probe-cell files are ever opened
    files = {
        r["f"]
        for r in survivors.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files, "probe set unexpectedly empty"
    for f in files:
        c = int(f.split("cell=")[1].split("/")[0])
        assert c in probe
    # and the probe set is a strict subset of the written cells
    written = {int(d.split("=")[1]) for d in os.listdir(path) if d.startswith("cell=")}
    assert len(probe) < len(written)
