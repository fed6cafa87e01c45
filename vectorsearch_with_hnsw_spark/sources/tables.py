"""Parquet table sources for the driver-generated testdata layout.

``spark.read.parquet`` is the primary source (columnar at rest, predicate
pushdown + column pruning for free). The reference's sources were keras /
torchvision dataset downloads and ``.npy`` loads
(FashionMNIST_Vector_Search_HSNW.ipynb cell 4, hsnw_trial.py:359-361);
here everything is a table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Engine session contract, applied defensively at every table load:
    the driver calls queries() with its OWN SparkSession, which won't
    have our builder confs. Both are runtime-settable (verified).

    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), unreadable
      by Spark otherwise.
    - UTC session timezone: TIMESTAMP_LTZ values (timestamp_micros)
      convert to pandas/strings through the session zone; a non-UTC
      driver session would shift event buckets/session bounds relative
      to DuckDB's naive reading.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # TIMESTAMP(NANOS) parquet arrives as long nanos under
        # spark.sql.legacy.parquet.nanosAsLong; convert to a microsecond
        # timestamp (lossless here — verified no sub-micro components,
        # and DuckDB coerces the same column to micro TIMESTAMP too).
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
