from .events import (
    events_dedup_stream,
    events_tumbling_stream,
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
)
from .documents import curate_stream, read_documents_stream
from .ingest import StreamingIndexIngest, read_embeddings_stream

__all__ = [
    "StreamingIndexIngest",
    "curate_stream",
    "read_documents_stream",
    "events_dedup_stream",
    "events_tumbling_stream",
    "read_embeddings_stream",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize_stream",
]
