"""Graph sinks — the reference's writer family (`SURVEY.md §2.1`).

Parquet is the engine-native binary sink (replaces ``writeGraphBinaryFormatNew``,
`InputsOutput/writeBinary.cpp:2-29`); the text formats exist for interop with
the reference's toolchain. Text writers collect partition-ordered lines via
Spark's text datasource where the format allows (edge lists), and fall back
to a driver-side write for formats needing a global header + strict line
order (METIS, Pajek, MTX) — those are interop/debug paths, not 100 TB paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph


def write_parquet_graph(g: Graph, path: str, compression: str = "zstd") -> None:
    """Binary sink (reference `writeBinary.cpp`, blosc-HDF5 `loadHDF5.cc`)."""
    g.edges.write.mode("overwrite").option("compression", compression).parquet(path)


def write_cluster_assignment(assign: DataFrame, path: str) -> None:
    """One community id per line, vertex-id order — the ``<file>_clustInfo``
    sink of `driverForGraphClustering.cpp:194-203`."""
    rows = assign.orderBy("v").select(F.col("comm").cast("string")).collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(r[0] + "\n")


def _undirected_once(g: Graph) -> DataFrame:
    return g.edges.filter(F.col("src") <= F.col("dst")).select("src", "dst", "weight")


def write_metis(g: Graph, path: str) -> None:
    """METIS adjacency sink (`writeSimple.cpp:2-34`): header ``NV NE 0``,
    line i = 1-based neighbors of vertex i-1."""
    nv = g.num_vertices()
    # header counts what the body lists: non-self undirected edges (the
    # adjacency lines exclude self-loops, so num_edges() would over-count)
    ne = g.edges.filter(F.col("src") != F.col("dst")).count() // 2
    adj = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.sort_array(F.collect_list(F.col("dst") + 1)).alias("nbrs"))
        .select("src", F.concat_ws(" ", F.col("nbrs").cast("array<string>")).alias("line"))
    )
    lines = {r["src"]: r["line"] for r in adj.collect()}
    with open(path, "w") as f:
        f.write(f"{nv} {ne} 0\n")
        for v in range(nv):
            f.write(lines.get(v, "") + "\n")


def write_pajek(g: Graph, path: str, assign: DataFrame | None = None) -> None:
    """Pajek sink, optionally with a community column
    (`writeSimple.cpp:36-118`)."""
    nv = g.num_vertices()
    comm = None
    if assign is not None:
        comm = {r.v: r.comm for r in assign.collect()}
    edges = _undirected_once(g).collect()
    with open(path, "w") as f:
        f.write(f"*Vertices {nv}\n")
        for v in range(nv):
            if comm is not None:
                f.write(f'{v + 1} "{v}" {comm.get(v, -1)}\n')
            else:
                f.write(f'{v + 1} "{v}"\n')
        f.write("*Edges\n")
        for r in edges:
            f.write(f"{r.src + 1} {r.dst + 1} {r.weight:g}\n")


def write_matrix_market(
    g: Graph, path: str, old2new: DataFrame | None = None
) -> None:
    """MTX symmetric sink, optionally permuted by an (v, new_id) map —
    `writeMatrixMarket.cpp:2-130`. Writes the lower triangle once."""
    e = _undirected_once(g)
    if old2new is not None:
        m_src = old2new.select(F.col("v").alias("src"), F.col("new_id").alias("nsrc"))
        m_dst = old2new.select(F.col("v").alias("dst"), F.col("new_id").alias("ndst"))
        e = (
            e.join(m_src, "src")
            .join(m_dst, "dst")
            .select(
                F.col("nsrc").alias("src"), F.col("ndst").alias("dst"), "weight"
            )
        )
    nv = g.num_vertices()
    rows = e.select(
        F.greatest("src", "dst").alias("r"), F.least("src", "dst").alias("c"), "weight"
    ).collect()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write(f"{nv} {nv} {len(rows)}\n")
        for r in rows:
            f.write(f"{r.r + 1} {r.c + 1} {r.weight:g}\n")


def write_matrix_market_bipartite(g: Graph, path: str, num_s: int) -> None:
    """Bipartite MTX sink (`writeMatrixMarket.cpp:90-130`): a general
    coordinate matrix with the S side (vertices < num_s) as rows and the
    T side as columns, offsets undone — the inverse of
    ``read_matrix_market`` on a general matrix. Driver-side interop path."""
    e = (
        g.edges.filter((F.col("src") < num_s) & (F.col("dst") >= num_s))
        .select("src", "dst", "weight")
        .collect()
    )
    nt = g.num_vertices() - num_s
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{num_s} {nt} {len(e)}\n")
        for r in e:
            f.write(f"{r.src + 1} {r.dst - num_s + 1} {r.weight:g}\n")


def write_cluster_assignment_distributed(assign: DataFrame, path: str) -> None:
    """Distributed ``_clustInfo`` sink: one community id per line in vertex
    order, written as range-partitioned sorted text part files whose
    name-order concatenation IS the vertex order (part-00000 holds the
    lowest vertex range, and so on) — no driver collect, scales to any |V|.
    """
    (
        assign.repartitionByRange("v")
        .sortWithinPartitions("v")
        .select(F.col("comm").cast("string").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def write_edge_list(g: Graph, path: str, one_based: bool = True) -> None:
    """Distributed text sink: ``u v w`` lines, each undirected edge once
    (`writeEdgeListToFile`, `utilityFunctions.cpp:137-186`). Scales — this
    is a df.write, not a collect."""
    off = 1 if one_based else 0
    (
        _undirected_once(g)
        .select(
            F.concat_ws(
                " ",
                (F.col("src") + off).cast("string"),
                (F.col("dst") + off).cast("string"),
                F.col("weight").cast("string"),
            ).alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )


def build_old2new_map(assign: DataFrame) -> DataFrame:
    """Community-contiguous vertex reordering (v, new_id): pack vertices so
    same-community vertices are adjacent — reference ``buildOld2NewMap``
    (`utilityFunctions.cpp:540-629`), used by the matrix-reordering drivers.
    Distributed partition-offset ranking (no single-partition window)."""
    from grappolo_spark.plans.ranking import dense_rank_ids

    ranked, _ = dense_rank_ids(assign.select("v", "comm"), ["comm", "v"], out="new_id")
    return ranked.select("v", "new_id")
