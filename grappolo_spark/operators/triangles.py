"""Triangle counting via degree-ordered wedge self-joins.

The plan shape mirrors the reference's edge-similarity wedge scan
(`Utility/utilitySparsificationFunctions.cpp:165-224`): a self-join of the
edge table with itself, closed by a third join. Scale notes:

- Edges are oriented low-rank -> high-rank where rank = (degree, id). This
  standard optimization bounds each vertex's out-neighborhood by O(sqrt(m)),
  which caps the wedge blow-up on power-law graphs — the difference between
  a feasible and an infeasible job at 100 TB. Results are identical to any
  other orientation, so the SQL oracle can use plain id-ordering.
- The closing join is on (a, c), a shuffle hash join; AQE splits skewed
  buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph


def _oriented(g: Graph, by_degree: bool = True) -> DataFrame:
    """One direction per undirected edge, low rank -> high rank, no loops."""
    e = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not by_degree:
        return e.filter(F.col("src") < F.col("dst"))
    deg = g.edges.filter(F.col("src") != F.col("dst")).groupBy(
        F.col("src").alias("v")
    ).agg(F.count(F.lit(1)).alias("d"))
    e = (
        e.join(deg.withColumnRenamed("v", "src").withColumnRenamed("d", "ds"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("d", "dd"), "dst")
    )
    keep = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.filter(keep).select("src", "dst")


def triangle_count(g: Graph, per_vertex: bool = False) -> DataFrame:
    """Total triangle count, or per-vertex counts with ``per_vertex=True``.

    Returns a 1-row DF ``(triangles)`` or ``(v, triangles)``.
    """
    o = _oriented(g).persist()
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = wedges.join(e3, ["a", "c"])
    if not per_vertex:
        out = tris.agg(F.count(F.lit(1)).alias("triangles"))
    else:
        corners = (
            tris.select(F.col("a").alias("v"))
            .union(tris.select(F.col("b").alias("v")))
            .union(tris.select(F.col("c").alias("v")))
        )
        counts = corners.groupBy("v").agg(F.count(F.lit(1)).alias("triangles"))
        out = (
            g.vertex_ids()
            .join(counts, "v", "left")
            .select("v", F.coalesce("triangles", F.lit(0)).alias("triangles"))
        )
    return out
