"""FIXTURES.md edge-case rows: duplicate vectors (ties), k > alive
count, empty index, plus streaming ingest via foreachBatch append."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.index.local_hnsw import HnswParams, LocalHNSW
from vectorsearch_with_hnsw_spark.operators.knn import knn_exact


def test_duplicate_vectors_still_return_exactly_k(spark):
    """Ties (identical vectors) must not break k-truncation."""
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(5)] + [
        (i, [float(i), 0.0, 0.0]) for i in range(5, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = knn_exact(emb, q, k=4).collect()
    assert len(got) == 4
    # deterministic tie-break by neighbor id: the 4 smallest duplicate ids
    assert sorted(r["neighbor_id"] for r in got) == [0, 1, 2, 3]


def test_k_larger_than_alive_count(spark):
    rows = [(i, [float(i), 1.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = knn_exact(emb, q, k=10).collect()
    assert len(got) == 3  # result length = alive count


def test_kernel_k_larger_than_index():
    idx = LocalHNSW(HnswParams(dim=4))
    data = np.random.default_rng(0).standard_normal((3, 4)).astype(np.float32)
    idx.add_batch(np.arange(3), data)
    assert len(idx.search(data[0], k=10)) == 3


def test_streaming_ingest_foreachbatch(spark, sf_smoke, tmp_path):
    """Micro-batch index ingest: stream embeddings, append each batch to
    a persisted HNSW index via foreachBatch, then probe — the engine's
    answer to the reference's 'real-time insert' claim."""
    from vectorsearch_with_hnsw_spark.index.build import HnswIndex, HnswParams, hnsw_build
    from vectorsearch_with_hnsw_spark.index.query import knn_hnsw
    from vectorsearch_with_hnsw_spark.sources import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    seed_df = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    state = {"idx": hnsw_build(seed_df, HnswParams(dim=64, metric="cosine"), num_partitions=1)}

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .format("parquet")
        .load(f"{sf_smoke}/embeddings.parqu*")
    )

    def ingest(batch_df, batch_id):
        fresh = batch_df.filter(F.col("vec_id") >= 100).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        if fresh.count():
            state["idx"] = state["idx"].append(fresh, num_partitions=1)

    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination(120)

    idx = state["idx"]
    assert idx.nodes.count() == emb.count()
    probe = emb.filter(F.col("vec_id") == 400).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rows = knn_hnsw(idx, probe, k=3).filter(F.col("rnk") == 1).collect()
    assert rows and rows[0]["neighbor_id"] == 400  # streamed-in vector is probe-able
