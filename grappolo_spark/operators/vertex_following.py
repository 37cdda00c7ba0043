"""Vertex following: collapse degree-0 and degree-1 vertices.

Reference `Utility/vertexFollowing.cpp:46-86`:
- degree-0 vertex  → community −1 (dropped from the clustering)
- degree-1 vertex i with sole neighbor t:
    * if degree(t) > 1      → i follows t
    * if degree(t) == 1 and i > t → i follows t (larger id follows smaller
      in a degree-1 pair; the smaller keeps itself)
    * else                  → i stays (incl. pure self-loop vertices)
- all other vertices stay themselves.

Then the graph is rebuilt over representatives (`buildNewGraphVF`,
`vertexFollowing.cpp:91-258`): like coarsening but with no forced self-loop
placeholders and C<0 rows skipped. Representatives are renumbered densely
first (driver order, `driverForGraphClustering.cpp:112-132`).

Degree here = adjacency-entry count (self-loop counts once), as in the CSR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.multiphase import renumber_contiguously


def vertex_following_map(g: Graph) -> DataFrame:
    """Return (v, rep): dense representative id, −1 for isolated vertices."""
    deg = g.edges.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("d"), F.first("dst").alias("_ignore")
    ).drop("_ignore")
    # sole neighbor of degree-1 vertices
    only_nbr = (
        g.edges.join(deg.filter(F.col("d") == 1), g.edges.src == F.col("v"))
        .select(F.col("v"), F.col("dst").alias("t"))
    )
    deg_t = deg.select(F.col("v").alias("t"), F.col("d").alias("dt"))
    follow = (
        only_nbr.join(deg_t, "t", "left")
        .select(
            "v",
            F.when(
                (F.col("t") != F.col("v"))
                & ((F.col("dt") > 1) | (F.col("v") > F.col("t"))),
                F.col("t"),
            )
            .otherwise(F.col("v"))
            .alias("rep0"),
        )
    )
    all_v = g.vertex_ids()
    raw = (
        all_v.join(deg, "v", "left")
        .join(follow, "v", "left")
        .select(
            "v",
            F.when(F.col("d").isNull(), F.lit(-1))  # isolated (explicit vertices)
            .otherwise(F.coalesce("rep0", F.col("v")))
            .cast("long")
            .alias("comm"),
        )
    )
    dense, _ = renumber_contiguously(raw)
    return dense.select("v", F.col("comm").alias("rep"))


def apply_vertex_following(g: Graph, vf_map: DataFrame) -> Graph:
    """Rebuild the graph over representatives (no placeholder self-loops)."""
    a_src = vf_map.select(F.col("v").alias("src"), F.col("rep").alias("rsrc"))
    a_dst = vf_map.select(F.col("v").alias("dst"), F.col("rep").alias("rdst"))
    coarse = (
        g.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter((F.col("rsrc") >= 0) & (F.col("rdst") >= 0))
        .groupBy(F.col("rsrc").alias("src"), F.col("rdst").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )
    # groupBy output: unique (src, dst) by construction
    return Graph(edges=coarse, deduped=True)
