"""Interchange formats beyond Parquet: CSV and JSON-lines sources/sinks.

The reference persists its artifacts as .npy + JSON files
(hsnw_trial.py:310-376); the engine's index does that natively in
Parquet (index/build.py). This module covers the other direction a real
pipeline needs: landing zones arrive as CSV/JSONL, curated data leaves
as partitioned Parquet.

Scale rules baked in:
- schemas are ALWAYS explicit — ``inferSchema`` is a full extra pass
  over 100 TB and can silently flip types between runs;
- CSV is written quoted+escaped so free-text columns (embedded
  newlines, commas) round-trip losslessly, and read with ``multiLine``
  off unless needed (multiLine kills input-split parallelism);
- JSONL keeps one object per line — the splittable framing;
- the Parquet sink partitions by a low-cardinality column so downstream
  reads partition-prune, and caps file count via repartition on the
  partition key (without it: one file per task × partition, the classic
  small-files explosion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")  # documents carry embedded newlines
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_col: str, files_per_partition: int = 1
) -> None:
    """Partition-pruned curated sink with bounded file count."""
    (
        df.repartition(files_per_partition, partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (zlib default): the other columnar at-rest format a
    lakehouse ingests; same pushdown/pruning properties as Parquet in
    Spark's native reader."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """ORC source. Schema optional — ORC embeds it — but passing one
    pins the contract exactly like the CSV/JSONL readers."""
    r = spark.read.schema(schema) if schema else spark.read
    return r.orc(path)
