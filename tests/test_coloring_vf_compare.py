from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.coloring import (
    color_histogram,
    distance_one_coloring,
    louvain_one_phase_colored,
    multihash_coloring,
    verify_coloring,
)
from grappolo_spark.operators.compare import (
    community_comparison,
    consensus_histogram,
    gini_coefficient,
)
from grappolo_spark.operators.vertex_following import (
    apply_vertex_following,
    vertex_following_map,
)
from grappolo_spark.sources import fixtures


def test_d1_coloring_valid_karate(spark):
    g = fixtures.karate(spark)
    colors = distance_one_coloring(g)
    assert verify_coloring(g, colors) == 0
    n_colors = colors.select("color").distinct().count()
    assert n_colors <= 18  # max degree + 1 bound (karate max deg 17)
    assert color_histogram(colors).agg(F.sum("size")).collect()[0][0] == 34


def test_multihash_coloring_valid(spark):
    g = fixtures.grid2d(spark, 5, 5)
    colors = multihash_coloring(g, nhash=2, nrounds=4)
    # complete coloring (no overflow leftovers on an easy graph) => 0 conflicts
    overflow = colors.filter(F.col("color") == 16).count()
    if overflow == 0:
        assert verify_coloring(g, colors) == 0


def test_colored_louvain_karate(spark):
    g = fixtures.karate(spark)
    res = louvain_one_phase_colored(g, thresh=1e-4, max_iters=6)
    # Gauss-Seidel sweep must beat the Jacobi single-phase plateau (0.191)
    assert res.modularity > 0.30
    assert res.assignment.count() == 34


def test_vertex_following_star(spark):
    star = fixtures.star_hub(spark, leaves=30, chords=0)
    vf = vertex_following_map(star)
    g2 = apply_vertex_following(star, vf)
    assert g2.num_vertices() == 1  # all leaves collapse into the hub
    assert g2.total_weight_2m() == star.total_weight_2m()
    # isolated vertex gets rep -1
    star.vertices = spark.createDataFrame([(999,)], "v long")
    vf2 = vertex_following_map(star)
    assert {r.rep for r in vf2.filter("v = 999").collect()} == {-1}


def test_community_comparison_identity_and_split(spark):
    a = spark.createDataFrame([(i, i // 5) for i in range(20)], "v long, comm long")
    m = community_comparison(a, a)
    assert m["precision"] == m["recall"] == m["fscore"] == 1.0
    assert m["mirkin"] == 0.0
    singletons = spark.createDataFrame([(i, i) for i in range(20)], "v long, comm long")
    m2 = community_comparison(a, singletons)
    assert m2["same_same"] == 0 and m2["precision"] == 0.0


def test_gini(spark):
    equal = spark.createDataFrame([(i, i % 4) for i in range(40)], "v long, comm long")
    assert abs(gini_coefficient(equal)) < 1e-9
    skewed = spark.createDataFrame(
        [(i, 0 if i < 99 else 1) for i in range(100)], "v long, comm long"
    )
    assert gini_coefficient(skewed) > 0.4


def test_consensus_histogram(spark):
    g = Graph.from_pairs(spark, [(0, 1), (1, 2), (2, 3)])
    a1 = spark.createDataFrame([(0, 0), (1, 0), (2, 1), (3, 1)], "v long, comm long")
    a2 = spark.createDataFrame([(0, 0), (1, 0), (2, 0), (3, 1)], "v long, comm long")
    h = {r.bin: r.edges for r in consensus_histogram(g.edges, [a1, a2]).collect()}
    # edge (0,1): co-clustered in both runs -> bin 10; (2,3): 1 of 2 -> bin 5
    assert h[10] == 1 and h[5] == 2
