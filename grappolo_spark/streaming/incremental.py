"""Incremental graph ingest via Structured Streaming.

The reference is strictly batch (`SURVEY.md §2.3`); streaming capability
comes from the engine's north_rule (resumable, continuously-fed pipelines).
Two building blocks:

- ``stream_edge_batches`` / ``incremental_degrees`` — watch a directory of
  edge parquet files (``readStream``), maintain running weighted degrees
  per vertex with stateful aggregation; checkpointed, exactly-once per
  micro-batch. At 100 TB this is the ingestion path: new repo snapshots
  land as files, degrees/graph stats stay current without full recompute.
- ``windowed_event_counts`` — event-time windowed aggregation with a
  watermark for late data over the ``events`` table schema
  (event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_STREAM_SCHEMA = "src long, dst long, weight double"


def stream_edge_batches(spark: SparkSession, in_dir: str) -> DataFrame:
    """Streaming edge source: parquet files appearing under ``in_dir``."""
    return (
        spark.readStream.schema(EDGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )


def incremental_degrees(
    edges_stream: DataFrame, checkpoint_dir: str, out_table: str = "stream_degrees"
) -> "object":
    """Maintain running (v, deg) over the stream; returns the started query.

    Complete-mode in-memory sink for tests; swap format("memory") for a
    Delta/parquet sink in production. The aggregation state is checkpointed
    so a restarted job resumes where it left off (exactly-once per batch).
    """
    degrees = (
        edges_stream.groupBy(F.col("src").alias("v"))
        .agg(F.sum("weight").alias("deg"), F.count(F.lit(1)).alias("out_degree"))
    )
    return (
        degrees.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_events_to_parquet(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> "object":
    """Production sink for the windowed aggregation: append-mode parquet.

    Append mode emits a window only once its watermark passes (finalized,
    no in-place updates needed), which is exactly what a durable columnar
    sink requires — unlike the complete/memory pairing, this scales: each
    micro-batch appends closed windows as new parquet files, and the
    checkpoint makes the whole pipeline exactly-once and restartable.
    """
    agg = windowed_event_counts(events_stream, window, watermark)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_compactable_parquet(
    agg_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> "object":
    """Append-mode sink WITHOUT a ``_spark_metadata`` log, safe to compact.

    Each micro-batch lands in ``<out_dir>/batch=<id>`` via
    ``mode("overwrite")``: a batch replayed after a crash (committed to
    the sink but not yet to the checkpoint) overwrites its OWN directory,
    so the layout is idempotent — exactly-once at batch granularity with
    plain parquet. Readers ``spark.read.parquet(out_dir)`` and get a
    ``batch`` partition column as per-batch lineage. Pair with
    :func:`grappolo_spark.streaming.compaction.compact_parquet_dir`
    between runs to bound the file count.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        agg_stream.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed counts + value sums per event_type, tolerating
    late arrivals up to ``watermark``."""
    # watermarks require TIMESTAMP (with zone); NTZ sources are cast
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
