"""Structured Streaming surface over the events table.

The reference has no stream abstraction — its "real-time insert" is a
lock-guarded in-memory append (hsnw_trial.py:109,203; SURVEY.md §2 row
18) — so this module is north-star capability: the same event analytics
the batch operators expose (operators/relational.py), expressed as
incremental plans with watermarks for late data.

Batch/stream parity is the test contract: ``events_tumbling_stream``
over a bounded file stream (availableNow trigger) must equal the batch
``events_tumbling`` plan. Incremental HNSW ingest follows the same
pattern at deploy time: micro-batch append via foreachBatch + periodic
``rebuild`` compaction (the reference's rebuild, hsnw_trial.py:381-389).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from ..cache import persist_tracked
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = bounded
    backfill; on a cluster this is a kafka/kinesis source with the same
    downstream plan). The generator's timestamp encoding has varied
    (long nanos / micros NTZ / micros LTZ), so sniff the batch-read
    schema for this directory and normalize `ts` to TIMESTAMP_LTZ the
    same way sources/tables.py does."""
    from ..sources.tables import _ensure_session_confs

    _ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    raw_type = spark.read.parquet(path).schema["ts"].dataType.simpleString()
    schema = EVENTS_SCHEMA.replace("ts timestamp", f"ts {raw_type}")
    # glob (not a literal file path): FileStreamSource requires a
    # directory or pattern
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(f"{sf_dir}/events.parqu*")
    )
    if raw_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if raw_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def events_tumbling_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Hourly tumbling aggregation with a late-data watermark — the
    incremental twin of relational.events_tumbling (identical output
    schema)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").getField("start").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def events_sliding_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding-window aggregation (1 h window, 30 min slide) with a
    late-data watermark — the incremental twin of
    relational.events_sliding. Spark expands each event into its two
    window memberships map-side; state per open window is evicted once
    the watermark passes the window end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").getField("start").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


SESSION_STATE_SCHEMA = "last_ts double, session_seq long"
SESSION_OUT_SCHEMA = "user_id long, session_seq long, n_events long"


def sessionize_stream(events: DataFrame, gap_sec: int = 1800, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator: per-user gap sessionization via
    applyInPandasWithState — the streaming twin of
    relational.events_sessionize. State = (last event time, running
    session counter) per user; emits (user_id, session_seq, n_events)
    increments per micro-batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_ts, session_seq = state.get
        else:
            # -1 so the first event's gap-trigger yields session 0,
            # matching the batch sessionizer's numbering
            last_ts, session_seq = float("-inf"), -1
        counts: dict[int, int] = {}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                ep = ts.timestamp()
                if ep - last_ts > gap_sec:
                    session_seq += 1
                last_ts = ep
                counts[session_seq] = counts.get(session_seq, 0) + 1
        state.update((last_ts, session_seq))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(counts),
                "session_seq": list(counts.keys()),
                "n_events": list(counts.values()),
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def events_dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop repeated event_ids within the
    watermark horizon — the incremental twin of the batch dedup surface
    (operators/dedup.py). State is bounded by the watermark: ids older
    than the horizon are evicted, which is what makes this run forever at
    100 TB/day ingest."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_stream_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Drain a bounded stream into an in-memory sink (availableNow) and
    return the materialized result — the test harness for parity checks."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.table(name)


def events_enriched_stream(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment join: each purchase event picks up its
    customer's nation via a broadcast of the static dimension — the
    standard streaming star-join. The static side re-resolves per
    micro-batch (a dimension update is visible to the next batch);
    aggregation state is keyed on the enriched (nation) key, so its
    cardinality is bounded by the dimension, not the stream."""
    enriched = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == "purchase")
        .join(F.broadcast(customers), F.col("user_id") == F.col("c_custkey"))
    )
    return enriched.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("purchase_value"),
    )


def view_purchase_attribution_stream(
    events: DataFrame, lookback_sec: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the same
    user's views in the preceding hour. Both sides carry watermarks and
    the join condition bounds event time on BOTH ends — that pair of
    constraints is what lets Spark evict buffered state (an unbounded
    stream-stream join would buffer forever). Equi-key on user_id, time
    range as the join residual: the same shape as the batch
    ``interval_join`` (operators/relational.py), incrementalized."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("value").alias("view_value"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr(f"INTERVAL {lookback_sec} SECONDS"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "p_user", "p_ts", "v_ts", "view_value")


def anomaly_score_stream(
    events_stream: DataFrame,
    history_events: DataFrame,
    out_path: str,
    checkpoint: str,
    watermark: str = "1 hour",
):
    """Streaming twin of the per-user rate-anomaly query: a watermarked
    stateful aggregation counts each (user, day) window and — only once
    the watermark passes the day's end, i.e. the count is COMPLETE —
    z-scores it against per-user moments trained ONCE on the static
    history (the moments table is the persisted model artifact; the
    stream pays one broadcast join per finalized row).

    Correctness under micro-batch boundaries: the day-window state
    accumulates across however many micro-batches a day's events span,
    and append mode emits one finalized row per (user, day) — so the
    emitted score equals the batch backfill's bit-for-bit (same integer
    moments, same float expression). Events later than ``watermark``
    past the day's end are dropped by the watermark, the explicit
    late-data contract. A day emits only after the GLOBAL watermark
    passes its end — on an idle stream the newest day stays pending
    until later data (or a restart with newer data) advances it.

    Sink: foreachBatch writes each batch to a ``_batch_id=<n>``
    partition with dynamic partition overwrite, so a retried batch
    REPLACES its own partition instead of appending twice —
    exactly-once output on top of the checkpointed source offsets.

    Returns the started StreamingQuery; callers await it."""
    from pyspark.sql import functions as F

    def epoch_day(ts_col):
        # UTC epoch-day as a DATE, computed from the instant itself —
        # F.window() buckets on epoch-aligned UTC days, so the history
        # side must bucket identically. to_date() would use the SESSION
        # timezone and silently shift labels/counts in any non-UTC
        # driver session (the engine pins UTC, user sessions may not).
        return F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.floor(F.unix_timestamp(ts_col) / F.lit(86400)).cast("int"),
        )

    daily_hist = history_events.groupBy(
        "user_id", epoch_day(F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    moments = (
        daily_hist.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("n_events").alias("s1"),
            F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
        )
        .filter(
            (F.col("nd") >= 3) & (F.col("s2") * F.col("nd") > F.col("s1") * F.col("s1"))
        )
        .transform(persist_tracked)
    )

    # complete-day counts: watermarked day windows, finalized on emit
    daily_stream = (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.window("ts", "1 day").alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", epoch_day(F.col("_w.start")).alias("day"), "n_events")
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        mean = F.col("s1").cast("double") / F.col("nd").cast("double")
        var = F.col("s2").cast("double") / F.col("nd").cast("double") - mean * mean
        z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
        out = (
            batch_df.join(F.broadcast(moments), "user_id")
            .withColumn("z", z)
            .select("user_id", "day", "n_events", "z")
            .withColumn("_batch_id", F.lit(batch_id))
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    return (
        daily_stream.writeStream.foreachBatch(apply_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
