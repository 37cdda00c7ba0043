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


def rcm_ordering_strict(g: Graph) -> DataFrame:
    """(v, order): serial Reverse Cuthill-McKee, faithful to the reference's
    strict variant (`Utility/reverseCuthillMcKee.cpp:263-508`):

    - isolated (degree-0) vertices take the lowest ranks in id order
      (the reference pushes them onto R before the heap loop, `:315-326`)
    - each component's source pops the min-degree heap; BFS proceeds level
      by level, each level's discoveries appended in ascending degree
      (`:393-408`); heap degree-ties resolve by vertex id here (the
      reference inherits arbitrary insertion order — documented divergence)
    - final order is the reversal ``pOrder[R[i]] = NV-1-i`` (`:468-472`)

    Driver-side over collected adjacency — an interop/parity path for
    matrix reordering, NOT a 100 TB path (use :func:`rcm_ordering`, the
    distributed relaxed form, at scale).
    """
    import heapq
    from collections import defaultdict

    spark = g.edges.sparkSession
    adj: dict = defaultdict(set)
    for r in g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst").collect():
        adj[r.src].add(r.dst)
        adj[r.dst].add(r.src)
    verts = sorted(r.v for r in g.vertex_ids().collect())
    nv = len(verts)
    deg = {v: len(adj.get(v, ())) for v in verts}

    rlist = [v for v in verts if deg[v] == 0]
    visited = set(rlist)
    heap = [(deg[v], v) for v in verts if deg[v] > 0]
    heapq.heapify(heap)
    while heap:
        d, s = heapq.heappop(heap)
        if s in visited:
            continue
        visited.add(s)
        rlist.append(s)
        frontier = [s]
        while frontier:
            nxt = []
            for v in frontier:
                for x in sorted(adj[v]):
                    if x not in visited:
                        visited.add(x)
                        nxt.append(x)
            nxt.sort(key=lambda x: (deg[x], x))
            rlist.extend(nxt)
            frontier = nxt
    order = [(v, nv - 1 - i) for i, v in enumerate(rlist)]
    return spark.createDataFrame(order, "v long, order long")
