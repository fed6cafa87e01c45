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


def spread(df: DataFrame) -> DataFrame:
    """Round-robin rebalance to the session's default parallelism when
    the upstream scan has fewer partitions than cores.

    A small parquet file with one row group scans as ONE partition, so
    any CPU-heavy narrow stage chained on it (tokenize + explode +
    hash) runs on one core — measured 6.4s single-task for a 3s-of-CPU
    explode at sf0.1 while 31 cores idled. One tiny shuffle of the raw
    rows unlocks full-width execution. At 100 TB the scan already has
    thousands of splits, the guard is false, and NO shuffle is added —
    this must never become an unconditional repartition (reshuffling a
    100 TB fact table to "spread" it would dwarf the work it saves).

    Used by the shingle/token-explode operators (dedup, textpipe), NOT
    by map-only projections (text_stats, sampling), which keep their
    exchange-free plans.
    """
    if df.isStreaming:
        # no static partition count to inspect; micro-batch sizing is
        # the stream scheduler's job (and .rdd is illegal here)
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
