"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB deployment target: AQE on (runtime coalescing +
skew-join handling), Arrow transport for the pandas-kernel boundary, UTC
session timezone so timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vectorsearch_with_hnsw_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(8, int(cpus) if cpus.isdigit() else 8))))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # some testdata generations encode events.ts as TIMESTAMP(NANOS),
        # which Spark cannot read natively; tolerate by reading as long —
        # the loader normalizes every encoding to TIMESTAMP_LTZ micros
        # (lossless: the data has no sub-microsecond components)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local-mode driver == executor: size the heap for 32 concurrent
        # tasks of shuffle-heavy joins (8g gave ~150 MB execution memory
        # per task slot -> silent spill/GC churn on the shingle joins)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
