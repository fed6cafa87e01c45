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

    - nanosAsLong: tolerated for events.parquet generations that carried
      TIMESTAMP(NANOS) (unreadable by Spark otherwise).
    - UTC session timezone: TIMESTAMP_LTZ values convert to
      pandas/strings through the session zone; a non-UTC driver session
      would shift event buckets/session bounds relative to DuckDB's
      naive reading. It also makes the NTZ->LTZ normalization below a
      pure reinterpretation (no wall-clock shift).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize `ts` to TIMESTAMP_LTZ (micros) regardless of how the
        # generator encoded it: long nanos (via nanosAsLong), micros
        # TIMESTAMP_NTZ (Spark 4 infers NTZ for isAdjustedToUTC=false),
        # or already-LTZ micros. Under the forced-UTC session the
        # NTZ->LTZ cast is a bit-for-bit reinterpretation, and DuckDB
        # reads the same column as the identical naive value — so every
        # downstream plan (unix_micros arithmetic, window(), date_trunc)
        # sees one canonical type.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
