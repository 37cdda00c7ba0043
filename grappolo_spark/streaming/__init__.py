"""Structured Streaming extensions (beyond the strictly-batch reference)."""

from grappolo_spark.streaming.incremental import (
    incremental_degrees,
    stream_edge_batches,
    windowed_event_counts,
)

__all__ = [
    "incremental_degrees",
    "stream_edge_batches",
    "windowed_event_counts",
]
