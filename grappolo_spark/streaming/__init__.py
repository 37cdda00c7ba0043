"""Structured Streaming extensions (beyond the strictly-batch reference)."""

from grappolo_spark.streaming.incremental import (
    incremental_degrees,
    stream_edge_batches,
    stream_windowed_events_to_parquet,
    windowed_event_counts,
)
from grappolo_spark.streaming.sessions import py_sessionize, sessionize

__all__ = [
    "incremental_degrees",
    "py_sessionize",
    "sessionize",
    "stream_edge_batches",
    "stream_windowed_events_to_parquet",
    "windowed_event_counts",
]
