"""Connected-components keeper election: min-label propagation fixpoint on
crafted graphs (chains exercise multi-round convergence), singleton
handling, and determinism at different shuffle parallelism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators.components import (
    connected_components,
    neardup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["a_id", "b_id"]))


def test_chain_collapses_to_one_component(spark):
    # path 1-2-3-4-5-6-7: diameter 6 forces several propagation rounds;
    # plus a separate 2-cycle component and reversed-order edges
    pairs = [(2, 1), (2, 3), (4, 3), (4, 5), (6, 5), (6, 7), (20, 10)]
    got = {r["node"]: r["component"] for r in connected_components(_edges(spark, pairs)).collect()}
    assert got == {n: 1 for n in range(1, 8)} | {10: 10, 20: 10}


def test_neardup_clusters_with_singletons(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 9, 10]}))
    pairs = [(1, 2), (2, 3)]
    got = {r["doc_id"]: r["cluster_id"] for r in neardup_clusters(docs, _edges(spark, pairs)).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9, 10: 10}


def test_component_id_is_partition_invariant(spark):
    pairs = [(i, i + 1) for i in range(1, 30)] + [(100, 200), (200, 300)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, connected_components(e.repartition(1)).collect()))
    b = sorted(map(tuple, connected_components(e.repartition(16)).collect()))
    assert a == b


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(1, 12)]), max_iters=2)
