"""Round-5 regression tests.

Pins the Louvain broadcast-gather edge layout: when the assignment is
broadcast, the kernel partitions the persisted edge table on ``src`` (the
aggregation key of both the gather's groupBy(v, cand) and the argmax's
groupBy(v)), so the whole gather->counter->argmax chain runs with ZERO
exchanges per superstep. The old ``dst`` layout (correct only for the
shuffle-join gather) paid two O(E)-width shuffles per iteration.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _gather_chain_plan(spark, key: str) -> str:
    """The kernel's gather->counter->argmax expression chain over an edge
    table partitioned on ``key``, with the assignment broadcast — mirrors
    louvain_one_phase's broadcast path (operators/louvain.py)."""
    e = spark.range(2000).select(
        (F.col("id") % 97).alias("src"),
        (F.col("id") % 89).alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    a = spark.range(100).select(
        F.col("id").alias("v"), F.col("id").alias("comm")
    )
    edges = e.repartition(key)
    a_dst = a.select(F.col("v").alias("dst"), F.col("comm").alias("comm_dst"))
    gathered = edges.join(F.broadcast(a_dst), "dst").select(
        F.col("src").alias("v"), F.col("comm_dst").alias("cand"), "weight"
    )
    counter = gathered.groupBy("v", "cand").agg(F.sum("weight").alias("wsum"))
    best = counter.groupBy("v").agg(
        F.min_by(F.struct("cand", "wsum"), F.struct(-F.col("wsum"), F.col("cand"))).alias("b")
    )
    return best._jdf.queryExecution().executedPlan().toString()


def test_src_layout_gather_chain_is_exchange_free(spark):
    plan = _gather_chain_plan(spark, "src")
    # exactly ONE hash exchange: the explicit one-time repartition itself;
    # both groupBys reuse the src layout (subset-of-grouping-keys rule)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dst_layout_pays_two_agg_shuffles(spark):
    # the contrast that motivated the fix: dst layout leaves both aggs
    # shuffling (repartition + 2 agg exchanges). If a Spark upgrade ever
    # collapses these, the layout choice should be revisited.
    plan = _gather_chain_plan(spark, "dst")
    assert plan.count("Exchange hashpartitioning") == 3, plan


def test_louvain_forced_distributed_matches_local(spark):
    """End-to-end: src-layout kernel output is identical to the driver-local
    numpy tail on a small deterministic graph (belt over the layout swap)."""
    from grappolo_spark.sources.fixtures import grid3d
    from grappolo_spark.operators.multiphase import louvain

    g = grid3d(spark, 6, 6, 4)
    dist = louvain(g, max_phases=2, smart_init=True, local_threshold=0)
    loc = louvain(g, max_phases=2, smart_init=True)
    assert abs(dist.modularity - loc.modularity) < 1e-9
    a = {r["v"]: r["comm"] for r in dist.assignment.collect()}
    b = {r["v"]: r["comm"] for r in loc.assignment.collect()}
    assert a == b
