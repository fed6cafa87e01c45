"""SQL-first surface: register the corpus as temp views and let users
run plain ``spark.sql`` — every capability of the DataFrame operators is
reachable declaratively (the distance expressions are plain Catalyst
HOFs, so they work inside SQL strings too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import TABLES, load_table

L2_SQL = (
    "sqrt(aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>),"
    " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v))"
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace one temp view per corpus table."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_knn_l2(spark: SparkSession, sf_dir: str, k: int = 10, n_queries: int = 5) -> DataFrame:
    """Exact kNN written entirely in SQL — same plan Catalyst produces
    for the DataFrame version."""
    register_views(spark, sf_dir)
    dist = L2_SQL.format(a="b.embedding", b="q.embedding")
    return spark.sql(f"""
        WITH ranked AS (
          SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {dist} AS dist,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY {dist}, b.vec_id) AS rnk
          FROM embeddings b CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {n_queries}) q
        )
        SELECT query_id, neighbor_id, dist, rnk FROM ranked WHERE rnk <= {k}
    """)
