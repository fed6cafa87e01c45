"""LSH-routed HNSW: recall stays high while each query visits only
O(n_planes) partitions instead of all P."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.index.build import HnswParams
from vectorsearch_with_hnsw_spark.index.routed import (
    hnsw_build_routed,
    knn_hnsw_routed,
    route_partitions,
)
from vectorsearch_with_hnsw_spark.operators.knn import knn_exact
from vectorsearch_with_hnsw_spark.sources import load_table

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_routing_is_bounded(spark, emb):
    routes = emb.limit(20).select(
        route_partitions(F.col("embedding").cast("array<double>"), DIM, 1000).alias("parts")
    )
    for r in routes.collect():
        # own bucket + 8 single flips + 28 double flips, mod 1000
        assert 1 <= len(r["parts"]) <= 37


def test_routed_recall(spark, emb, queries):
    idx = hnsw_build_routed(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        HnswParams(dim=DIM, metric="cosine"),
        num_partitions=8,
    )
    ann = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_hnsw_routed(idx, queries, k=10).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_exact(emb, queries, k=10, metric="cosine").collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.8, f"routed recall {recall}"


def test_routed_self_match(spark, emb, queries):
    """An indexed vector queried against the routed index must find
    itself: its own bucket is always probed."""
    idx = hnsw_build_routed(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
        HnswParams(dim=DIM, metric="cosine"),
        num_partitions=8,
    )
    rows = knn_hnsw_routed(idx, queries, k=1).filter(F.col("rnk") == 1).collect()
    assert rows
    for r in rows:
        assert r["neighbor_id"] == r["query_id"]
