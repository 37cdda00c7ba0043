"""Round-6 fixes: the three ADVICE r5 correctness items.

1. ``distance_one_coloring(rand_df=...)`` INNER-joined conflicts with the
   tie-break table, so a conflicting vertex missing from ``rand_df``
   silently dropped its conflict row — an invalid coloring instead of an
   error. Now a coverage guard raises up front.
2. The LPA ids32 gate admitted ``min_id == -2^31``, but the tie-break
   negates the int32 label inside the max_by struct; ``-(-2^31)`` wraps
   under non-ANSI Spark and corrupts the tie ordering for that label.
3. On the louvain hints path, ids32 auto-enabled from the UNVERIFIED
   nv_hint dense-renumbering contract; sparse or >int32 ids then wrapped
   through silent non-ANSI casts. Hints are now trusted only when the
   multiphase driver vouches for its own renumbering (``_dense_ids``).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph

INT32_MIN = -(1 << 31)


def test_rand_df_coverage_guard_raises(spark):
    from grappolo_spark.operators.coloring import distance_one_coloring

    g = Graph.from_pairs(spark, [(1, 2), (2, 3), (1, 3)])
    # covers only v=1,2 — vertex 3 has no tie-break value
    partial = spark.createDataFrame(
        [(1, 0.25), (2, 0.75)], "v long, rand double"
    )
    with pytest.raises(ValueError, match="rand_df"):
        distance_one_coloring(g, rand_df=partial)


def test_rand_df_full_coverage_still_colors(spark):
    from grappolo_spark.operators.coloring import (
        distance_one_coloring,
        verify_coloring,
    )

    g = Graph.from_pairs(spark, [(1, 2), (2, 3), (1, 3)])
    full = spark.createDataFrame(
        [(1, 0.25), (2, 0.75), (3, 0.5)], "v long, rand double"
    )
    colors = distance_one_coloring(g, rand_df=full)
    assert verify_coloring(g, colors) == 0


def test_lpa_ids32_gate_excludes_int32_min(spark):
    """A label of exactly -2^31 must not enter the int32 tie-break: v=0 sees
    neighbor labels {-2^31, 5} at equal weight and must pick the SMALLER
    (-2^31); the wrapped negation would pick 5."""
    from grappolo_spark.operators.labelprop import label_propagation

    g = Graph.from_pairs(spark, [(0, INT32_MIN), (0, 5)])
    out = label_propagation(
        g, max_iters=1, stop_on_converge=False, local_threshold=0
    )
    got = {r["v"]: r["label"] for r in out.collect()}
    assert got[0] == INT32_MIN
    # and the forced-distributed path matches the local replay exactly
    local = label_propagation(
        g, max_iters=1, stop_on_converge=False, local_threshold=10**9
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, local.collect())
    )


def _louvain_rows(res):
    return sorted((r["v"], r["comm"]) for r in res.assignment.collect())


def test_louvain_hints_do_not_auto_narrow_unverified_ids(spark):
    """Public caller passes hints over ids far beyond int32: the hint-derived
    bound (0..nv_hint-1) is wrong, so ids32 must NOT auto-engage — the run
    must match the no-hints (stats-verified) run exactly."""
    from grappolo_spark.operators.louvain import louvain_one_phase

    big = 1 << 31  # first id outside int32
    pairs = [(big + 1, big + 2), (big + 2, big + 3), (big + 1, big + 3),
             (big + 10, big + 11)]
    g = Graph.from_pairs(spark, pairs)
    two_m = g.edges.agg(F.sum("weight")).collect()[0][0]
    ref = louvain_one_phase(g, max_iters=2)
    hinted = louvain_one_phase(
        g, max_iters=2, two_m_hint=two_m, nv_hint=5
    )
    assert _louvain_rows(hinted) == _louvain_rows(ref)


def test_louvain_explicit_ids32_with_bad_hints_falls_back(spark):
    """Explicit ids32=True with unverified hints triggers the one-time
    bounds scan, which sees the >int32 ids and keeps the long path —
    results still match the reference run."""
    from grappolo_spark.operators.louvain import louvain_one_phase

    big = 1 << 31
    pairs = [(big + 1, big + 2), (big + 2, big + 3), (big + 1, big + 3)]
    g = Graph.from_pairs(spark, pairs)
    two_m = g.edges.agg(F.sum("weight")).collect()[0][0]
    ref = louvain_one_phase(g, max_iters=2)
    hinted = louvain_one_phase(
        g, max_iters=2, two_m_hint=two_m, nv_hint=4, ids32=True
    )
    assert _louvain_rows(hinted) == _louvain_rows(ref)
