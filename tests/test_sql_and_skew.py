from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_with_hnsw_spark.operators.knn import knn_exact
from vectorsearch_with_hnsw_spark.plans.skew import salted_join
from vectorsearch_with_hnsw_spark.plans.sql import register_views, sql_knn_l2
from vectorsearch_with_hnsw_spark.sources import load_table


def test_sql_knn_matches_dataframe_knn(spark, sf_smoke):
    sql_res = sql_knn_l2(spark, sf_smoke, k=5, n_queries=3)
    emb = load_table(spark, sf_smoke, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df_res = knn_exact(emb, q, k=5, metric="l2")
    s = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in sql_res.collect()}
    d = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in df_res.collect()}
    assert s == d


def test_register_views_sql_query(spark, sf_smoke):
    register_views(spark, sf_smoke)
    n = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).first()["n"]
    assert n > 0


def test_salted_join_equals_plain_join(spark, sf_smoke):
    # skewed large side: every lineitem of one hot order duplicated 50x
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    hot = li.limit(1).crossJoin(spark.range(50)).select("l_orderkey", "l_quantity")
    large = li.unionByName(hot).withColumnRenamed("l_orderkey", "k")
    small = (
        load_table(spark, sf_smoke, "orders")
        .select(F.col("o_orderkey").alias("k"), "o_totalprice")
    )
    plain = large.join(small, "k").groupBy("k").count()
    salted = salted_join(large, small, "k", salt=8).groupBy("k").count()
    p = {(r["k"], r["count"]) for r in plain.collect()}
    s = {(r["k"], r["count"]) for r in salted.collect()}
    assert p == s
