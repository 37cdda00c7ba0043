"""Custom stateful streaming operator (applyInPandasWithState sessionize)
vs a pure-python sessionization oracle."""

import pandas as pd
from pyspark.sql import functions as F

from grappolo_spark.streaming.sessions import py_sessionize, sessionize


def test_sessionize_closed_sessions_match_oracle(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 40)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    events.write.mode("overwrite").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(in_dir)
        q = (
            sessionize(stream, gap_minutes=120, watermark="1 minute")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # a far-future heartbeat advances the watermark so event-time timeouts
    # flush every remaining open session on the next run
    future = events.limit(1).select(
        F.lit(999_999).cast("long").alias("user_id"),
        (F.col("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    future.write.mode("append").parquet(in_dir)
    run_once()
    run_once()  # one more batchless pass lets remaining timeouts fire

    got = {
        (
            r.user_id,
            int(r.session_start.timestamp() * 1_000_000),
            int(r.session_end.timestamp() * 1_000_000),
            r.n_events,
            round(r.value_sum, 6),
        )
        for r in spark.read.parquet(out_dir).collect()
        if r.user_id != 999_999
    }
    rows = [
        (r.user_id, int(r.ts.timestamp() * 1_000_000), r.value)
        for r in events.collect()
    ]
    expect = py_sessionize(rows, gap_minutes=120)
    assert len(got) >= 1
    # every emitted session must be exactly one of the oracle's sessions
    assert got <= expect
    # and with the year-ahead watermark, every oracle session is closed
    assert got == expect
