"""Matrix-reordering operators: (relaxed) Reverse Cuthill-McKee.

Reference `Utility/reverseCuthillMcKee.cpp:34-508` builds an RCM permutation
with a min-degree heap seed and per-level child sorting; its "relaxed"
parallel variant already tolerates within-level reordering. This DataFrame
version is that relaxed form: BFS levels from the minimum-(degree, id) seed
of each component, vertices ranked by (component, level, degree, id), then
reversed — bandwidth-reducing and fully deterministic, though not
byte-identical to the serial heap order (documented divergence).

``build_old2new_map`` (community-contiguous packing) lives in
sources/writers.py next to its consumer, the reordered-MTX sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.components import connected_components
from grappolo_spark.plans.iteration import cut_lineage
from grappolo_spark.plans.ranking import dense_rank_ids


def bfs_levels(g: Graph, seeds: DataFrame, max_iters: int = 10_000) -> DataFrame:
    """(v, level): BFS distance from the seed set (level 0). Unreachable
    vertices are absent."""
    pairs = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .persist()
    )
    levels = seeds.select("v", F.lit(0).alias("level"))
    levels = cut_lineage(levels, tag="bfs")
    frontier = levels
    for depth in range(1, max_iters):
        nxt = (
            pairs.join(frontier.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(levels, "v", "left_anti")
            .select("v", F.lit(depth).alias("level"))
        )
        nxt = cut_lineage(nxt, tag="bfs")
        if nxt.isEmpty():
            break
        levels = cut_lineage(levels.unionByName(nxt), tag="bfs_levels")
        frontier = nxt
    pairs.unpersist()
    return levels


def rcm_ordering(g: Graph) -> DataFrame:
    """(v, order): relaxed Reverse Cuthill-McKee permutation, 0-based."""
    deg = g.degrees().select("v", "out_degree")
    comp = connected_components(g)
    # seed per component: minimum (degree, id) — the heap-pop of
    # `reverseCuthillMcKee.cpp:34-120` without the serial heap
    seeds = (
        comp.join(deg, "v")
        .groupBy("component")
        .agg(
            F.min_by("v", F.struct(F.col("out_degree"), F.col("v"))).alias("v")
        )
        .select("v")
    )
    levels = bfs_levels(g, seeds)
    ranked = (
        comp.join(levels, "v", "left")
        .join(deg, "v")
        .select(
            "v",
            "component",
            F.coalesce("level", F.lit(0)).alias("level"),
            "out_degree",
        )
    )
    # distributed partition-offset ranking; n falls out of the offsets
    cm, n = dense_rank_ids(
        ranked, ["component", "level", "out_degree", "v"], out="cm_order"
    )
    return cm.select(
        "v", (F.lit(n - 1) - F.col("cm_order")).cast("long").alias("order")
    )
