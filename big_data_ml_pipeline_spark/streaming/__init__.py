from .corpus import ingest_documents_stream, read_documents_stream
from .events import (
    hourly_counts_batch_replay,
    read_events_stream,
    sliding_value_stats,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "read_documents_stream",
    "ingest_documents_stream",
    "tumbling_counts",
    "sliding_value_stats",
    "stream_dedup",
    "hourly_counts_batch_replay",
]
