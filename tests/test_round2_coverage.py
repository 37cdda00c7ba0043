"""Round-2 coverage additions: strict RCM, full graph characteristics,
bipartite MTX writer, distributed clustInfo sink, streaming parquet sink."""

import glob
import os

from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.ordering import rcm_ordering_strict
from grappolo_spark.sources import fixtures, readers, writers
from grappolo_spark.sources.fixtures import KARATE_EDGES


def test_rcm_strict_path_graph(spark):
    # path 0-1-2-3 plus isolated 9: R = [9 (isolated first), 0 (min-degree
    # seed), 1, 2, 3 (BFS levels)]; order[v] = NV-1-rank
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double",
    )
    verts = spark.createDataFrame([(0,), (1,), (2,), (3,), (9,)], "v long")
    g = Graph.from_edgelist(e, vertices=verts)
    got = {r.v: r.order for r in rcm_ordering_strict(g).collect()}
    assert got == {9: 4, 0: 3, 1: 2, 2: 1, 3: 0}


def test_rcm_strict_reduces_bandwidth_on_grid(spark):
    g = fixtures.grid2d(spark, 3, 10)
    order = {r.v: r.order for r in rcm_ordering_strict(g).collect()}
    pairs = [
        (r.src, r.dst)
        for r in g.edges.filter(F.col("src") < F.col("dst")).collect()
    ]
    bw = max(abs(order[u] - order[v]) for u, v in pairs)
    # a 3xN grid in RCM order has bandwidth ~ the short dimension + 1
    assert bw <= 5
    assert sorted(order.values()) == list(range(30))


def test_characteristics_full_karate(spark):
    g = fixtures.karate(spark)
    row = g.characteristics().collect()[0]
    degs = {}
    for u, v in KARATE_EDGES:
        degs[u] = degs.get(u, 0) + 1
        degs[v] = degs.get(v, 0) + 1
    n = 34
    avg = sum(degs.values()) / n
    avg_sq = sum(d * d for d in degs.values()) / n
    assert row.num_vertices == n
    assert row.num_edges == 78
    assert row.min_degree == 1 and row.max_degree == 17
    assert abs(row.avg_degree - round(avg, 6)) < 1e-9
    assert abs(row.avg_sq_degree - round(avg_sq, 6)) < 1e-9
    assert abs(row.variance - round(avg_sq - avg * avg, 6)) < 1e-6
    assert row.isolated == 0
    assert row.degree_one == sum(1 for d in degs.values() if d == 1)
    assert abs(row.density_pct - round(78 / (n * n) * 100, 6)) < 1e-9


def test_bipartite_mtx_roundtrip(spark, tmp_path):
    # 3x4 general matrix with 5 entries
    text = (
        "%%MatrixMarket matrix coordinate real general\n"
        "3 4 5\n"
        "1 1 2.5\n1 3 1\n2 2 1\n3 4 0.5\n3 1 1\n"
    )
    p = str(tmp_path / "bip.mtx")
    with open(p, "w") as f:
        f.write(text)
    g = readers.read_matrix_market(spark, p)
    out = str(tmp_path / "bip_out.mtx")
    writers.write_matrix_market_bipartite(g, out, num_s=3)
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].endswith("general")
    assert lines[1] == "3 4 5"
    assert sorted(lines[2:]) == sorted(text.strip().splitlines()[2:])


def test_distributed_clust_info_sink(spark, tmp_path):
    assign = spark.createDataFrame(
        [(v, v % 7) for v in range(200)], "v long, comm long"
    )
    out = str(tmp_path / "clust_dist")
    writers.write_cluster_assignment_distributed(assign, out)
    lines = []
    for part in sorted(glob.glob(os.path.join(out, "part-*"))):
        with open(part) as f:
            lines.extend(ln.strip() for ln in f if ln.strip())
    assert lines == [str(v % 7) for v in range(200)]


def test_streaming_parquet_sink_finalized_windows(spark, tmp_path):
    from grappolo_spark.streaming import (
        stream_windowed_events_to_parquet,
        windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    events.write.mode("overwrite").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(in_dir)
        q = stream_windowed_events_to_parquet(
            stream, out_dir, ck, window="1 day", watermark="1 day"
        )
        q.awaitTermination(120)

    run_once()
    # append a far-future event so the next run's watermark closes the
    # original windows (append mode emits only finalized windows)
    late = events.limit(1).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 365 DAYS")
    )
    late.write.mode("append").parquet(in_dir)
    run_once()

    got = spark.read.parquet(out_dir)
    assert got.count() >= 1
    # every emitted (finalized) row must equal the batch aggregation
    batch = windowed_event_counts(
        spark.read.parquet(in_dir), window="1 day", watermark="1 day"
    )
    mismatched = got.alias("g").join(
        batch.alias("b"),
        ["window_start", "window_end", "event_type", "n_events", "value_sum"],
        "left_anti",
    )
    assert mismatched.count() == 0
