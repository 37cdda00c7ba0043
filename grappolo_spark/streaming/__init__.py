"""Structured Streaming extensions (beyond the strictly-batch reference)."""

from grappolo_spark.streaming.compaction import (
    compact_parquet_dir,
    needs_compaction,
    parquet_file_count,
)
from grappolo_spark.streaming.incremental import (
    incremental_degrees,
    stream_edge_batches,
    stream_to_compactable_parquet,
    stream_windowed_events_to_parquet,
    windowed_event_counts,
)
from grappolo_spark.streaming.sessions import py_sessionize, sessionize

__all__ = [
    "compact_parquet_dir",
    "incremental_degrees",
    "needs_compaction",
    "parquet_file_count",
    "py_sessionize",
    "sessionize",
    "stream_edge_batches",
    "stream_to_compactable_parquet",
    "stream_windowed_events_to_parquet",
    "windowed_event_counts",
]
