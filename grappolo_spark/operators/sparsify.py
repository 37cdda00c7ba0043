"""Edge-similarity sparsification.

Reference `Utility/utilitySparsificationFunctions.cpp`:

- ``edge_jaccard``: per-edge Jaccard of endpoint neighbor sets
  (`computeEdgeSimilarityMetrics`, `:165-224`) — re-expressed as a wedge
  self-join + groupBy instead of sorted-list merges. NOTE: the reference
  computes ``setIntersect/setUnion`` with INTEGER division (`:208`), so
  non-identical sets always score 0 — a bug we deliberately do not
  reproduce (documented divergence; we keep double division).
- ``sparsify_topk``: keep the top ``ceil(deg^alpha)`` edges per vertex by
  similarity, min 1, union of both endpoints' selections
  (`buildSparifiedGraph`, `:227-302`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grappolo_spark.graph import Graph


def edge_jaccard(g: Graph) -> DataFrame:
    """(u, v, jaccard) per undirected edge (u < v), neighbor-set Jaccard.

    Neighbor sets exclude self-loops. The shared-neighbor count comes from a
    wedge join: common w with edges (u,w) and (v,w).
    """
    e = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    deg = e.groupBy(F.col("src").alias("x")).agg(F.count(F.lit(1)).alias("d"))
    und = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    a = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    inter = (
        und.join(a, "u")
        .join(b, ["v", "w"])
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    out = (
        und.join(inter, ["u", "v"], "left")
        .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            "u",
            "v",
            F.round(
                F.coalesce("ninter", F.lit(0))
                / (F.col("du") + F.col("dv") - F.coalesce("ninter", F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )
    return out


def sparsify_topk(g: Graph, alpha: float = 0.5) -> DataFrame:
    """Sparsified undirected edge list (u, v): union over vertices of each
    vertex's top ``ceil(deg^alpha)`` incident edges by (jaccard desc, tie by
    the other endpoint asc — deterministic stand-in for the reference's
    arbitrary heap order)."""
    sim = edge_jaccard(g)
    both = sim.select("u", "v", "jaccard").unionByName(
        sim.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "jaccard"
        )
    )
    deg = both.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    w = Window.partitionBy("u").orderBy(F.desc("jaccard"), F.asc("v"))
    kept = (
        both.join(deg, "u")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.ceil(F.pow(F.col("d"), F.lit(alpha))))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    return kept
