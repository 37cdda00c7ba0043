"""int32 hot-chain equivalence (louvain_one_phase ids32).

The 32-bit id representation lives strictly inside the gather chain
(edge cache → gather join/agg → argmax); these tests pin that the
narrow chain produces EXACTLY the wide chain's results — same
assignment, same modularity (==, no tolerance), same iteration count —
across the weighted, unweighted, and early-terminate paths, and that
auto-gating turns it off when ids exceed int32.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.louvain import louvain_one_phase


def _rand_graph(spark, seed=11, n=600, verts=90, weighted=False):
    cols = [
        F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(verts)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(verts)).alias("dst"),
    ]
    if weighted:
        cols.append(
            (1.0 + F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(7))).alias(
                "weight"
            )
        )
    pairs = spark.range(n).select(*cols).filter(F.col("src") != F.col("dst"))
    return Graph.from_edgelist(pairs)


def _run(g, **kw):
    res = louvain_one_phase(g, max_iters=3, thresh=-1e9, **kw)
    return (
        res.iterations,
        res.modularity,
        {r["v"]: r["comm"] for r in res.assignment.collect()},
    )


def test_ids32_exact_equivalence_weighted(spark):
    g = _rand_graph(spark, weighted=True)
    assert _run(g, ids32=True) == _run(g, ids32=False)


def test_ids32_exact_equivalence_unweighted(spark):
    g = _rand_graph(spark, weighted=False)
    assert g.unweighted is True
    assert _run(g, ids32=True) == _run(g, ids32=False)


def test_ids32_exact_equivalence_early_terminate(spark):
    g = _rand_graph(spark, seed=23)
    a = _run(g, ids32=True, early_terminate=True)
    b = _run(g, ids32=False, early_terminate=True)
    assert a == b


def test_ids32_output_schema_stays_long(spark):
    g = _rand_graph(spark)
    res = louvain_one_phase(g, max_iters=2, thresh=-1e9, ids32=True)
    schema = {f.name: f.dataType.simpleString() for f in res.assignment.schema}
    assert schema["v"] == "bigint" and schema["comm"] == "bigint"


def test_pagerank_ids32_matches_long_path(spark):
    # summation order inside the contribution groupBy may differ between
    # the int and long hash layouts, so ranks agree to float accumulation
    # error, not bit-for-bit (documented in the pagerank docstring)
    from grappolo_spark.operators.pagerank import pagerank

    g = _rand_graph(spark, seed=31, weighted=True)
    a = {r["v"]: r["rank"] for r in pagerank(g, max_iters=6, ids32=True).collect()}
    b = {r["v"]: r["rank"] for r in pagerank(g, max_iters=6, ids32=False).collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)


def test_pagerank_ids32_output_schema_stays_long(spark):
    from grappolo_spark.operators.pagerank import pagerank

    g = _rand_graph(spark, seed=37)
    out = pagerank(g, max_iters=2, ids32=True)
    assert {f.name: f.dataType.simpleString() for f in out.schema} == {
        "v": "bigint",
        "rank": "double",
    }


def test_lpa_broadcast_ids32_matches_shuffle_long(spark):
    # the src-keyed broadcast gather + int chain vs the dst-co-partitioned
    # long shuffle plan: identical labels (exact — integer counts, same
    # tie-break ordering), across both toggles independently
    from grappolo_spark.operators.labelprop import label_propagation

    g = _rand_graph(spark, seed=41)

    def run(**kw):
        return {
            r["v"]: r["label"]
            for r in label_propagation(
                g,
                max_iters=3,
                stop_on_converge=False,
                local_threshold=0,
                **kw,
            ).collect()
        }

    ref = run(broadcast_labels=False, ids32=False)
    assert run(broadcast_labels=True, ids32=False) == ref
    assert run(broadcast_labels=True, ids32=True) == ref
    assert run() == ref  # auto


def test_cc_star_ids32_matches_long(spark):
    from grappolo_spark.operators.components import connected_components

    g = _rand_graph(spark, seed=53, n=900, verts=300)

    def run(**kw):
        return {
            r["v"]: r["component"]
            for r in connected_components(
                g, local_threshold=0, **kw
            ).collect()
        }

    ref = run(ids32=False)
    assert run(ids32=True) == ref
    assert run() == ref  # auto
    # freeze off exercises the no-contract path too
    assert run(ids32=True, freeze=False) == ref


def test_ids32_auto_disables_beyond_int32(spark):
    # ids beyond 2^31: the auto gate must fall back to the long chain and
    # still produce the long-path result
    big = 1 << 40
    pairs = [(big + 1, big + 2), (big + 2, big + 3), (big + 1, big + 3),
             (big + 4, big + 5)]
    g = Graph.from_pairs(spark, pairs)
    a = _run(g)  # auto: must detect the id bound and disable
    b = _run(g, ids32=False)
    assert a == b
    assert set(a[2]) == {big + 1, big + 2, big + 3, big + 4, big + 5}
