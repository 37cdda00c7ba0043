"""Synchronous label propagation with Grappolo's min-label tie-break.

Community label of v at t+1 = the label with the largest incident edge
weight among v's neighbors at t; ties broken by the SMALLER label id —
the same deterministic rule as the reference's Louvain target selection
(`Utility/utilityClusteringFunctions.cpp:245-248`). Synchronous (Jacobi)
update, like `parallelLouvainMethod`'s all-at-once sweep. Deterministic
given (graph, max_iters), hence oracle-checkable via unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.plans.iteration import SuperstepRunner, cut_lineage


def label_propagation(
    g: Graph,
    max_iters: int = 10,
    stop_on_converge: bool = True,
    run_dir: str | None = None,
) -> DataFrame:
    """Return ``(v, label)``; isolated vertices keep their own id."""
    spark = g.edges.sparkSession
    pairs = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    pairs = pairs.repartition("dst").persist()

    runner = SuperstepRunner(spark, run_dir)
    start, resumed = runner.resume()
    labels = (
        resumed
        if resumed is not None
        else g.vertex_ids().select("v", F.col("v").alias("label"))
    )
    labels = cut_lineage(labels, tag="lpa")

    for step in range(start, max_iters):
        freq = (
            pairs.join(labels, pairs.dst == labels.v)
            .groupBy(F.col("src").alias("vv"), "label")
            .agg(F.sum("weight").alias("w"))
        )
        # argmax by weight, tie -> min label: max_by over struct(w, -label)
        best = freq.groupBy("vv").agg(
            F.max_by("label", F.struct(F.col("w"), -F.col("label"))).alias("new_label")
        )
        new = labels.join(best, labels.v == best.vv, "left").select(
            "v", F.coalesce("new_label", F.col("label")).alias("label")
        )
        # commit FIRST (single evaluation + write); the convergence count
        # then diffs two parquet-backed tables instead of re-running the
        # whole superstep plan — one pass per iteration, not two
        committed = runner.commit(step, new, {"op": "lpa"})
        if stop_on_converge:
            changed = (
                committed.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
        labels = committed
        if stop_on_converge and changed == 0:
            break

    pairs.unpersist()
    return cut_lineage(labels, tag="result", keep_last=64)
