"""Small-file compaction for append-mode streaming parquet sinks.

Append-mode Structured Streaming emits files per micro-batch; over days
that is thousands of tiny files — every downstream scan pays one task +
one footer read per file, and listing itself becomes the bottleneck at
100 TB. The reference has no streaming at all (`SURVEY.md §2.3`); this is
the north-rule ops story, the same job a Delta ``OPTIMIZE`` does, built
from plain parquet + an atomic directory swap.

Why not compact Spark's built-in ``format("parquet")`` streaming sink in
place: that sink keeps a ``_spark_metadata`` transaction log inside the
output directory, and metadata-aware readers trust ONLY the log — files
an external compactor writes are invisible, files it removes break the
log. Rewriting the log is version-fragile; instead the engine pairs:

- :func:`grappolo_spark.streaming.incremental.stream_to_compactable_parquet`
  — a ``foreachBatch`` sink writing each micro-batch to
  ``<dir>/batch=<id>`` with ``mode("overwrite")``. A replayed batch (crash
  before the checkpoint commit) overwrites its own directory, so the sink
  stays idempotent/exactly-once at batch granularity WITHOUT a metadata
  log, and the ``batch`` partition column doubles as per-batch lineage.
- :func:`compact_parquet_dir` — rewrites that layout into few files and
  swaps directories atomically (rename), keeping the previous generation
  as ``<dir>.bak``. Compacted rows land under the reserved marker
  ``batch=-1``: real batch ids are always >= 0, so even a CRASH-replayed
  batch (written but not yet committed to the checkpoint) overwrites only
  its own ``batch=<id>`` directory, never the compacted generation.

Run compaction between triggers (availableNow pipelines: after the query
terminates); the streaming checkpoint is untouched because only OUTPUT
data is rewritten, never state.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_file_count(out_dir: str) -> int:
    """#data files in the sink (flat or one-level ``batch=`` layout) —
    one or two readdirs on the driver, no Spark job."""
    if not os.path.isdir(out_dir):
        return 0
    n = 0
    for name in os.listdir(out_dir):
        if name.startswith((".", "_")):
            continue
        p = os.path.join(out_dir, name)
        if os.path.isdir(p):
            n += sum(
                1
                for f in os.listdir(p)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
        elif name.endswith(".parquet"):
            n += 1
    return n


def needs_compaction(out_dir: str, max_files: int = 64) -> bool:
    return parquet_file_count(out_dir) > max_files


def compact_parquet_dir(
    spark: SparkSession,
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
    min_files: int = 2,
) -> dict:
    """Rewrite ``out_dir`` into ⌈rows / target_rows_per_file⌉ files.

    Returns ``{files_before, files_after, rows, compacted}``. No-ops when
    the directory already has ≤ ``min_files`` files. The rewrite lands in
    a scratch sibling first and replaces ``out_dir`` with two renames, so
    a concurrent READER sees either the old or the new generation, never a
    half-written one. Do not run two compactions of one directory
    concurrently, and schedule between streaming triggers — the swap must
    not race the writer's own commits.

    Refuses a ``_spark_metadata`` (FileStreamSink) directory: its
    transaction log cannot be externally rewritten safely — use the
    ``stream_to_compactable_parquet`` sink for outputs that need
    compaction.
    """
    if os.path.isdir(os.path.join(out_dir, "_spark_metadata")):
        raise ValueError(
            f"{out_dir} is a FileStreamSink directory (_spark_metadata "
            "transaction log): external compaction would desync the log. "
            "Write compactable streams with stream_to_compactable_parquet."
        )
    files_before = parquet_file_count(out_dir)
    if files_before <= min_files:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": None,
            "compacted": False,
        }

    batch_ids = [
        int(name.split("=", 1)[1])
        for name in os.listdir(out_dir)
        if name.startswith("batch=")
    ]
    df = spark.read.parquet(out_dir)
    rows = df.count()
    n_files = max(1, -(-rows // target_rows_per_file))  # ceil
    tmp = f"{out_dir}.compact-{uuid.uuid4().hex[:8]}"
    if batch_ids:
        # keep the layout, but fold everything under the reserved
        # generation marker batch=-1, which can NEVER be a replayed batch
        # id: streaming batch ids are >= 0, so a stream that crashed after
        # writing its last micro-batch but before the checkpoint commit
        # replays that id into its own batch=<id> directory — it must not
        # overwrite the compacted generation holding ALL prior batches'
        # rows (folding under max(batch_ids) had exactly that hazard).
        # Repeated compactions re-fold batch=-1 plus newer batches into a
        # fresh batch=-1, so the marker is stable across generations.
        dest = os.path.join(tmp, "batch=-1")
        data = df.drop("batch")
    else:
        dest = tmp
        data = df
    # coalesce, not repartition: narrowing to n_files needs no shuffle
    data.coalesce(n_files).write.mode("overwrite").parquet(dest)

    bak = f"{out_dir}.bak"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(out_dir, bak)
    os.rename(tmp, out_dir)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(out_dir),
        "rows": rows,
        "compacted": True,
    }
