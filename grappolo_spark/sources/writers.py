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

# Driver-side text sinks materialize O(V) or O(E) python rows; above this
# they must raise instead of silently OOMing the driver (same contract as
# similarity_fast._guard_collect_side). 10M short text lines ~ a few hundred
# MB of python objects — the upper edge of sane for an interop dump.
MAX_DRIVER_ROWS = 10_000_000


def _guard_driver_rows(n: int, what: str, alternatives: str, limit: int) -> None:
    """Raise before a driver-side text sink collects an oversized graph.

    ``n`` is usually a count the writer needed anyway (header fields), so
    the guard adds no extra action; it turns a silent driver OOM on a
    100M-edge "quick text dump" into an actionable error."""
    if n > limit:
        raise ValueError(
            f"{what} has {n} rows, above the driver-side text-sink bound "
            f"({limit}). This format needs a global header/strict line "
            f"order and is written on the driver. Use {alternatives} for "
            f"graphs this large, or raise max_driver_rows explicitly."
        )


def write_parquet_graph(g: Graph, path: str, compression: str = "zstd") -> None:
    """Binary sink (reference `writeBinary.cpp`, blosc-HDF5 `loadHDF5.cc`)."""
    g.edges.write.mode("overwrite").option("compression", compression).parquet(path)


def write_cluster_assignment(
    assign: DataFrame, path: str, max_driver_rows: int = MAX_DRIVER_ROWS
) -> None:
    """One community id per line, vertex-id order — the ``<file>_clustInfo``
    sink of `driverForGraphClustering.cpp:194-203`."""
    _guard_driver_rows(
        assign.count(), "assignment", "write_cluster_assignment_distributed",
        max_driver_rows,
    )
    rows = assign.orderBy("v").select(F.col("comm").cast("string")).collect()
    with open(path, "w") as f:
        for r in rows:
            f.write(r[0] + "\n")


def _undirected_once(g: Graph) -> DataFrame:
    return g.edges.filter(F.col("src") <= F.col("dst")).select("src", "dst", "weight")


def write_metis(
    g: Graph, path: str, max_driver_rows: int = MAX_DRIVER_ROWS
) -> None:
    """METIS adjacency sink (`writeSimple.cpp:2-34`): header ``NV NE 0``,
    line i = 1-based neighbors of vertex i-1."""
    nv = g.num_vertices()
    # header counts what the body lists: non-self undirected edges (the
    # adjacency lines exclude self-loops, so num_edges() would over-count)
    ne = g.edges.filter(F.col("src") != F.col("dst")).count() // 2
    # the collect materializes every adjacency cell: O(V + E) driver memory
    _guard_driver_rows(
        nv + 2 * ne, "graph (vertices + adjacency cells)",
        "write_edge_list / write_parquet_graph", max_driver_rows,
    )
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


def write_pajek(
    g: Graph,
    path: str,
    assign: DataFrame | None = None,
    max_driver_rows: int = MAX_DRIVER_ROWS,
) -> None:
    """Pajek sink, optionally with a community column
    (`writeSimple.cpp:36-118`)."""
    nv = g.num_vertices()
    _guard_driver_rows(
        nv + _undirected_once(g).count(), "graph (vertices + edges)",
        "write_edge_list / write_parquet_graph", max_driver_rows,
    )
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
    g: Graph,
    path: str,
    old2new: DataFrame | None = None,
    max_driver_rows: int = MAX_DRIVER_ROWS,
) -> None:
    """MTX symmetric sink, optionally permuted by an (v, new_id) map —
    `writeMatrixMarket.cpp:2-130`. Writes the lower triangle once."""
    e = _undirected_once(g)
    _guard_driver_rows(
        e.count(), "edge list", "write_edge_list / write_parquet_graph",
        max_driver_rows,
    )
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


def write_matrix_market_bipartite(
    g: Graph, path: str, num_s: int, max_driver_rows: int = MAX_DRIVER_ROWS
) -> None:
    """Bipartite MTX sink (`writeMatrixMarket.cpp:90-130`): a general
    coordinate matrix with the S side (vertices < num_s) as rows and the
    T side as columns, offsets undone — the inverse of
    ``read_matrix_market`` on a general matrix. Driver-side interop path."""
    e_df = g.edges.filter(
        (F.col("src") < num_s) & (F.col("dst") >= num_s)
    ).select("src", "dst", "weight")
    _guard_driver_rows(
        e_df.count(), "edge list", "write_edge_list / write_parquet_graph",
        max_driver_rows,
    )
    e = e_df.collect()
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


def write_bucketed_edges(
    g: Graph,
    table: str,
    buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Warehouse sink: persist the canonical edge table bucketed (and
    sorted) by ``src``.

    The durable analogue of ``Graph.partition_by_src()`` — a scan of the
    bucketed table already satisfies ``hashpartitioning(src)``, so every
    src-keyed groupBy/join in a superstep loop skips its pre-shuffle on
    EVERY later run, not just within one session. This is the Spark-native
    replacement for the reference's sorted-CSR binary dump
    (`loadBinary.cpp`, CSR counting-sort `loadEdgeList.cpp:225-249`): the
    sort order lives in the table layout, not in a custom format. Pick
    ``buckets`` ~ the cluster's target shuffle parallelism for the graph.
    """
    w = g.edges.write.mode("overwrite").bucketBy(buckets, "src")
    if sort:
        w = w.sortBy("src")
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed_graph(spark, table: str) -> Graph:
    """Load a :func:`write_bucketed_edges` table; the returned graph's
    edge scans carry the bucket layout (no repartition needed)."""
    # written from a canonical Graph (write_bucketed_edges contract)
    return Graph(edges=spark.table(table), deduped=True)


def build_old2new_map(assign: DataFrame) -> DataFrame:
    """Community-contiguous vertex reordering (v, new_id): pack vertices so
    same-community vertices are adjacent — reference ``buildOld2NewMap``
    (`utilityFunctions.cpp:540-629`), used by the matrix-reordering drivers.
    Distributed partition-offset ranking (no single-partition window)."""
    from grappolo_spark.plans.ranking import dense_rank_ids

    ranked, _ = dense_rank_ids(assign.select("v", "comm"), ["comm", "v"], out="new_id")
    return ranked.select("v", "new_id")
