"""Batch/stream parity for the streaming surface."""

from __future__ import annotations

import pytest

from vectorsearch_with_hnsw_spark.operators.relational import (
    events_sessionize,
    events_tumbling,
)
from vectorsearch_with_hnsw_spark.streaming.events import (
    events_tumbling_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_smoke):
    stream = events_tumbling_stream(read_events_stream(spark, sf_smoke))
    got = run_stream_to_memory(stream, "tumbling_test", mode="complete")
    want = events_tumbling(spark, sf_smoke)
    cols = ["bucket", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sessionize_stream_matches_batch(spark, sf_smoke):
    stream = sessionize_stream(read_events_stream(spark, sf_smoke))
    got = run_stream_to_memory(stream, "session_test", mode="append")
    want = events_sessionize(spark, sf_smoke)
    # single micro-batch => per-session increments equal full session sizes
    assert _rows(got, ["user_id", "session_seq", "n_events"]) == _rows(
        want, ["user_id", "session_seq", "n_events"]
    )
