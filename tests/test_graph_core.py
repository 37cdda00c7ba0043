from pyspark.sql import functions as F

from grappolo_spark.graph import Graph, canonical_edges, densify_ids
from grappolo_spark.sources import fixtures


def test_karate_shape(spark):
    g = fixtures.karate(spark)
    assert g.num_vertices() == 34
    assert g.num_edges() == 78
    assert g.edges.count() == 156  # symmetrized, each edge twice
    assert g.total_weight_2m() == 156.0


def test_symmetrize_dedup_selfloops(spark):
    df = spark.createDataFrame(
        [(1, 2, 1.0), (2, 1, 1.0), (1, 2, 1.0), (3, 3, 2.0)],
        "src long, dst long, weight double",
    )
    e = canonical_edges(df)
    rows = {(r.src, r.dst): r.weight for r in e.collect()}
    # (1,2) once each direction; self-loop (3,3) once
    assert rows == {(1, 2): 1.0, (2, 1): 1.0, (3, 3): 2.0}


def test_degrees_include_selfloop_once(spark):
    g = Graph.from_pairs(spark, [(0, 1), (1, 1, 3.0)])
    degs = {r.v: r.deg for r in g.degrees().collect()}
    assert degs == {0: 1.0, 1: 4.0}
    assert g.total_weight_2m() == 5.0  # 2*1 + 3


def test_densify_ids(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("z", "a")], "src string, dst string"
    )
    vmap, dense = densify_ids(df)
    m = {r.ext_id: r.v for r in vmap.collect()}
    assert m == {"a": 0, "b": 1, "c": 2, "z": 3}
    pairs = {(r.src, r.dst) for r in dense.collect()}
    assert pairs == {(0, 1), (1, 2), (3, 0)}


def test_characteristics(spark):
    g = fixtures.grid2d(spark, 3, 3)
    row = g.characteristics().collect()[0]
    assert row.num_vertices == 9
    assert row.min_degree == 2
    assert row.max_degree == 4
    assert row.total_weight_2m == 24.0  # 12 undirected edges
