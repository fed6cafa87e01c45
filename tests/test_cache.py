"""Cache-hygiene contract: operators must not accumulate cached
relations in a long-lived session.

Three tiers:
- one-shot operators that train (kmeans/IVF-PQ) release their build
  caches before returning — a consumer action leaves the CacheManager
  exactly as it found it;
- index handles that keep build caches for repeated searches expose
  ``unpersist()``;
- everything else the package pins goes through ``cache.persist_tracked``
  so ``release_caches()`` is a single cleanup hook (the bench harness
  and any library caller can restore a clean slate without hunting
  intermediates).
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from vectorsearch_with_hnsw_spark import cache
from vectorsearch_with_hnsw_spark.sources import load_table


def _n_persistent(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def _scrub(spark) -> None:
    """Start each test from a clean CacheManager (the session fixture is
    shared across test files)."""
    cache.release_caches()
    spark.catalog.clearCache()
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(True)


@pytest.fixture()
def emb(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings")


@pytest.fixture()
def queries(emb):
    return emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_one_shot_ivf_pq_leaves_no_cached_relations(spark, emb, queries):
    from vectorsearch_with_hnsw_spark.operators.pq import ivf_pq_knn

    _scrub(spark)
    out = ivf_pq_knn(emb, queries, dim=64, m=16, k=3)
    assert _n_persistent(spark) == 0  # released before returning
    assert out.count() > 0
    assert _n_persistent(spark) == 0  # consuming didn't re-pin anything


def test_one_shot_kmeans_leaves_no_cached_relations(spark, emb):
    from vectorsearch_with_hnsw_spark.operators.ivf import kmeans_fit, kmeans_train

    _scrub(spark)
    assert kmeans_train(emb, dim=64, k=4, iters=2).count() == 4
    assert kmeans_fit(emb, dim=64, k=4, iters=1).count() == emb.count()
    assert _n_persistent(spark) == 0


def test_ivf_pq_index_unpersist_releases_build_cache(spark, emb, queries):
    from vectorsearch_with_hnsw_spark.operators.pq import IvfPqIndex

    _scrub(spark)
    idx = IvfPqIndex.build(emb, dim=64, m=16)
    before = idx.search(queries, k=3).collect()
    # codes relation kept (pinned) for repeated searches — materialized
    # by the first search action above
    assert _n_persistent(spark) >= 1
    idx.unpersist()
    assert _n_persistent(spark) == 0
    # the handle stays usable: searches recompute from lineage, same rows
    after = idx.search(queries, k=3).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    idx.unpersist()  # idempotent


def test_release_caches_is_the_package_wide_hook(spark, sf_smoke):
    from vectorsearch_with_hnsw_spark.operators.dedup import minhash_lsh_pairs

    _scrub(spark)
    docs = load_table(spark, sf_smoke, "documents")
    minhash_lsh_pairs(docs).count()  # persists its banded relation
    assert cache.tracked_count() >= 1
    assert _n_persistent(spark) >= 1
    released = cache.release_caches()
    assert released >= 1
    assert cache.tracked_count() == 0
    assert _n_persistent(spark) == 0


def test_kmeans_rejects_non_finite_training_input(spark):
    from vectorsearch_with_hnsw_spark.operators.ivf import kmeans_train

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [float("nan"), 0.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="non-finite"):
        kmeans_train(bad, dim=2, k=2, iters=1).count()
    cache.release_caches()
