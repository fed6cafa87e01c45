"""Count-min sketch (textpipe.cms_*): the one-sided error guarantee
(estimates never undercount), the additive error bound, and sketch
mergeability (sum of shard sketches == whole-corpus sketch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.functions.text import tokens
from vectorsearch_with_hnsw_spark.operators.textpipe import (
    cms_token_estimates,
    cms_token_sketch,
)
from vectorsearch_with_hnsw_spark.sources import load_table


def test_cms_never_undercounts_and_error_bounded(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    est = cms_token_estimates(docs, query_docs=20)
    exact = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    joined = est.join(exact, "token").collect()
    assert joined, "expected probe tokens"
    total_tokens = docs.select(
        F.sum(F.size(tokens(F.lower(F.col("text")))))
    ).first()[0]
    # CMS guarantee: never undercount; overshoot ~ total/width per row,
    # and the min over rows keeps it well under a few multiples of that
    bound = 8 * total_tokens // 1024 + 1
    for r in joined:
        assert r["est_count"] >= r["true_count"], r
        assert r["est_count"] - r["true_count"] <= bound, (r, bound)


def test_cms_sketches_merge_by_addition(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        cms_token_sketch(half_a)
        .unionByName(cms_token_sketch(half_b))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_token_sketch(docs)
    diff = (
        merged.join(whole, ["row", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0)) != F.coalesce(whole["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_cms_stream_matches_batch(spark, sf_smoke):
    from vectorsearch_with_hnsw_spark.streaming.documents import (
        cms_sketch_stream,
        read_documents_stream,
    )
    from vectorsearch_with_hnsw_spark.streaming.events import run_stream_to_memory

    got = run_stream_to_memory(
        cms_sketch_stream(read_documents_stream(spark, sf_smoke)),
        "cms_stream_test",
        mode="complete",
    )
    want = cms_token_sketch(load_table(spark, sf_smoke, "documents"))
    cols = ["row", "bucket", "cnt"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )
