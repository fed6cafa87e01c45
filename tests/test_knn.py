from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.operators.knn import knn_exact, knn_exact_fast
from vectorsearch_with_hnsw_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_fast_matches_window(emb, queries, metric):
    slow = knn_exact(emb, queries, k=10, metric=metric)
    fast = knn_exact_fast(emb, queries, k=10, metric=metric)
    s = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in slow.collect()}
    f = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in fast.collect()}
    assert s == f


def test_self_match_rank1(emb, queries):
    rows = knn_exact(emb, queries, k=3, metric="l2").filter(F.col("rnk") == 1).collect()
    for r in rows:
        assert r["neighbor_id"] == r["query_id"]
        assert abs(r["dist"]) < 1e-12


def test_k_respected_and_sorted(emb, queries):
    rows = knn_exact(emb, queries, k=4, metric="l2").collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["dist"]))
    for q, rs in by_q.items():
        rs.sort()
        assert len(rs) == 4
        ds = [d for _, d in rs]
        assert ds == sorted(ds)


def test_unknown_metric_raises(emb, queries):
    with pytest.raises(ValueError):
        knn_exact(emb, queries, k=3, metric="hamming")
    with pytest.raises(ValueError):
        knn_exact_fast(emb, queries, k=3, metric="hamming")
