"""Bucketed-table layout for shuffle-free fact-fact joins.

At 100 TB the orders ⋈ lineitem join is the dominant shuffle. Writing
both tables bucketed (and sorted) by the join key lets every future join
run exchange-free: Spark reads co-located buckets and sort-merge joins
in place. This is the at-rest twin of `repartition` — pay the shuffle
once at ingest, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table

BUCKET_SPECS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}


def write_bucketed(
    spark: SparkSession, sf_dir: str, buckets: int = 8, prefix: str = "bkt"
) -> dict[str, str]:
    """Persist bucketed managed tables; returns {logical: table_name}."""
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    out = {}
    for name, key in BUCKET_SPECS.items():
        tbl = f"{prefix}_{name}"
        # idempotent across sessions: a fresh metastore doesn't know the
        # table, but its managed location may survive on disk
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
        out[name] = tbl
    return out


def bucketed_orders_lineitem_join(spark: SparkSession, tables: dict[str, str]) -> DataFrame:
    """orders ⋈ lineitem over the bucketed layout — plans with zero
    Exchange nodes (asserted in tests/test_plans.py)."""
    li = spark.table(tables["lineitem"])
    orders = spark.table(tables["orders"])
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderkey", "o_custkey", "l_quantity", "l_extendedprice"
    )
