"""Synchronous label propagation with Grappolo's min-label tie-break.

Community label of v at t+1 = the label with the largest incident edge
weight among v's neighbors at t; ties broken by the SMALLER label id —
the same deterministic rule as the reference's Louvain target selection
(`Utility/utilityClusteringFunctions.cpp:245-248`). Synchronous (Jacobi)
update, like `parallelLouvainMethod`'s all-at-once sweep. Deterministic
given (graph, max_iters), hence oracle-checkable via unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.plans.iteration import (
    SuperstepRunner,
    cut_lineage,
    promote_result,
)


def _local_lpa(g: Graph, max_iters: int, stop_on_converge: bool, pdf) -> DataFrame:
    """Driver-local replay of the identical iteration for small graphs:
    same gather (sum weight per neighbor label), same (weight desc, label
    asc) argmax, same Jacobi update and convergence stop. Exact for
    integer-valued weights (the engine's count-weighted graphs); real
    weights may differ in the last ulp of summed ties.

    ``pdf`` is the caller's ONE collected edge pass (src, dst, weight),
    UNFILTERED: self-loop rows are dropped here in numpy, but their
    endpoints still register in ``ids`` (a vertex with only self-loops has
    no gather rows and keeps its own label) — so the output covers every
    edge endpoint and the caller needs no separate vertex_ids() pass."""
    import numpy as np
    import pandas as pd

    spark = g.edges.sparkSession
    if not len(pdf):
        return spark.createDataFrame([], "v long, label long")
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    w = pdf["weight"].to_numpy(dtype=np.float64)
    ids = np.unique(np.concatenate([src, dst]))
    m = src != dst
    s = np.searchsorted(ids, src[m])
    d = np.searchsorted(ids, dst[m])
    w = w[m]
    nv = len(ids)
    labels = np.arange(nv, dtype=np.int64)
    from grappolo_spark.operators.louvain import _first_group_starts

    for _ in range(max_iters):
        key = s * nv + labels[d]
        uk, inv = np.unique(key, return_inverse=True)
        wsum = np.bincount(inv, weights=w)
        gv = (uk // nv).astype(np.int64)
        gl = (uk % nv).astype(np.int64)
        order = np.lexsort((gl, -wsum, gv))
        first = _first_group_starts(gv[order])
        new = labels.copy()
        new[gv[order][first]] = gl[order][first]
        changed = bool((new != labels).any())
        labels = new
        if stop_on_converge and not changed:
            break
    return spark.createDataFrame(
        pd.DataFrame({"v": ids, "label": ids[labels]}), "v long, label long"
    )


def label_propagation(
    g: Graph,
    max_iters: int = 10,
    stop_on_converge: bool = True,
    local_threshold: int = 2_000_000,
    broadcast_labels: bool | None = None,
    broadcast_max_vertices: int = 5_000_000,
    ids32: bool | None = None,
    run_dir: str | None = None,
) -> DataFrame:
    """Return ``(v, label)``; isolated vertices keep their own id.

    Below ``local_threshold`` edge rows the identical iteration replays
    driver-locally (one Arrow collect — distributed supersteps over a
    small graph are fixed job overhead); ``run_dir`` (durable superstep
    state for resume) forces the distributed path. 0 disables.

    ``broadcast_labels`` (auto when |V| <= ``broadcast_max_vertices``):
    the src-keyed broadcast-gather layout proven on the louvain kernel —
    pairs are hash-partitioned ONCE on ``src`` (the aggregation key), the
    O(V) label table broadcasts into the join, and the whole
    freq→argmax chain runs with zero per-superstep exchanges; before,
    every superstep shuffled O(E) frequency rows from the dst-join
    layout to the src aggregation. Beyond the threshold the dst-
    co-partitioned shuffle plan is kept. ``ids32`` (None = auto with the
    broadcast path): 32-bit ids through the hot chain when the id bound
    fits — labels are vertex ids, so the label column narrows too;
    winners are identical (integer counts, same tie-break ordering).
    """
    spark = g.edges.sparkSession
    if run_dir is None and local_threshold > 0:
        # probe-and-collect in ONE evaluation of the (unpersisted) edge
        # pipeline: limit(threshold+1) caps the driver transfer, and when
        # the graph is under the bound the probe IS the collect — the old
        # flow evaluated the pipeline up to four times (count gate, the
        # filtered collect, and vertex_ids' two-scan union)
        probe = (
            g.edges.select("src", "dst", "weight")
            .limit(local_threshold + 1)
            .toPandas()
        )
        if len(probe) <= local_threshold:
            labels = _local_lpa(g, max_iters, stop_on_converge, probe)
            if g.vertices is None:
                # every vertex id is an edge endpoint (self-loop-only
                # vertices included — see _local_lpa): the LocalRelation
                # already covers the full vertex set, no join, no cut
                return labels
            out = g.vertex_ids().join(labels, "v", "left").select(
                "v", F.coalesce("label", F.col("v")).alias("label")
            )
            return cut_lineage(out, tag="result", keep_last=64)

    # ONE evaluation of the (possibly heavy, unpersisted) edge pipeline for
    # the O(V) side: the vertex table is cut first, then the stats agg and
    # the label init both read the small parquet. Durable runs keep the old
    # shape (resume state must not depend on a scratch-rotation file).
    ids_cut = None
    if run_dir is None:
        ids_cut = cut_lineage(g.vertex_ids(), tag="lpa_ids")
        vstats_src = ids_cut
    else:
        vstats_src = g.vertex_ids()
    vstats = vstats_src.agg(
        F.count(F.lit(1)).alias("nv"),
        F.min("v").alias("min_id"),
        F.max("v").alias("max_id"),
    ).collect()[0]
    nv = vstats["nv"] or 0
    if broadcast_labels is None:
        broadcast_labels = nv <= broadcast_max_vertices
    if ids32 is None:
        ids32 = bool(broadcast_labels)
    min_id = vstats["min_id"] if vstats["min_id"] is not None else 0
    max_id = vstats["max_id"] if vstats["max_id"] is not None else 0
    # strict lower bound: the tie-break negates the int32 label inside the
    # max_by struct, and -INT32_MIN wraps under non-ANSI Spark — a vertex id
    # of exactly -2^31 must keep the long path
    ids32 = bool(
        ids32
        and broadcast_labels
        and -(1 << 31) < min_id
        and max_id < (1 << 31) - 1
    )

    # weight ≡ 1.0 invariant (Graph.unweighted): persist only (src, dst)
    # and count rows per label instead of summing doubles — identical
    # winners (integer counts are exact doubles, same tie-break struct)
    unweighted = bool(getattr(g, "unweighted", False))
    if ids32:
        pair_cols = [
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
        ]
    else:
        pair_cols = [F.col("src"), F.col("dst")]
    if not unweighted:
        pair_cols.append(F.col("weight"))
    pairs = g.edges.filter(F.col("src") != F.col("dst")).select(*pair_cols)
    # broadcast gather: partition once on the AGGREGATION key src so the
    # freq/argmax groupBys reuse the cached layout; shuffle gather:
    # co-partition on the JOIN key dst so the O(E) side never moves
    pairs = pairs.repartition("src" if broadcast_labels else "dst").persist()

    runner = SuperstepRunner(spark, run_dir)
    start, resumed = runner.resume()
    if resumed is not None:
        labels = cut_lineage(resumed, tag="lpa")
    elif ids_cut is not None:
        # projection over the lpa_ids cut parquet: already a truncated
        # leaf, no second O(V) write+read job
        labels = ids_cut.select("v", F.col("v").alias("label"))
    else:
        labels = cut_lineage(
            g.vertex_ids().select("v", F.col("v").alias("label")), tag="lpa"
        )

    for step in range(start, max_iters):
        if ids32:
            # hot join side in the cache's int types (labels ⊆ vertex ids)
            l_hot = labels.select(
                F.col("v").cast("int").alias("v"),
                F.col("label").cast("int").alias("label"),
            )
        else:
            l_hot = labels
        l_side = F.broadcast(l_hot) if broadcast_labels else l_hot
        freq = (
            pairs.join(l_side, pairs.dst == l_side.v)
            .groupBy(F.col("src").alias("vv"), "label")
            .agg(
                F.count(F.lit(1)).cast("double").alias("w")
                if unweighted
                else F.sum("weight").alias("w")
            )
        )
        # argmax by weight, tie -> min label: max_by over struct(w, -label)
        best = freq.groupBy("vv").agg(
            F.max_by("label", F.struct(F.col("w"), -F.col("label"))).alias("new_label")
        )
        if ids32:
            # chain boundary: back to long for the O(V) state update
            best = best.select(
                F.col("vv").cast("long").alias("vv"),
                F.col("new_label").cast("long").alias("new_label"),
            )
        new = labels.join(best, labels.v == best.vv, "left").select(
            "v", F.coalesce("new_label", F.col("label")).alias("label")
        )
        # commit FIRST (single evaluation + write); the convergence count
        # then diffs two parquet-backed tables instead of re-running the
        # whole superstep plan — one pass per iteration, not two
        committed = runner.commit(step, new, {"op": "lpa"})
        if stop_on_converge:
            changed = (
                committed.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
        labels = committed
        if stop_on_converge and changed == 0:
            break

    pairs.unpersist()
    # rename the last commit into the long-lived result window instead of
    # re-writing it (no Spark job; falls back to a real cut if the label
    # table is somehow not rotation-backed)
    return promote_result(labels, fallback_cut=True)
