"""SparkSession factory with scale-oriented defaults.

Tuned for iterative graph workloads: AQE on (runtime re-plan + skew-join
splitting), small-dim auto-broadcast, Arrow for all pandas UDF exchange.
`shuffle_partitions` defaults to the local core count; on a real cluster set
it to ~2-3x total cores via --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "grappolo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for iterative graph jobs.

    On a cluster this is driven by spark-submit; locally it defaults to
    ``local[$SPARK_GRAFT_CPUS]`` (env, default all cores).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            if inner not in ("*", ""):
                try:
                    n = int(inner)
                except ValueError:
                    pass
        shuffle_partitions = max(8, n)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalesce of shuffle partitions, skew-join splitting,
        # auto conversion to broadcast join when a coarsened graph shrinks.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDFs (link extraction, embeddings) — never
        # row-at-a-time Python.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Iterative algorithms re-reference small per-vertex DFs; keep the
        # driver results tight and the scans columnar.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark
