"""Multi-phase Louvain: kernel → renumber → prolong → coarsen → repeat.

DataFrame re-expression of `BasicCommunitiesDetection/runMultiPhaseBasic.cpp:52-170`
and the coloring variant `Coloring/runMultiPhaseColoring.cpp:51-238`:

- each phase runs one Louvain level (`louvain_one_phase`), then the cluster
  ids are renumbered contiguously (first-appearance order ≈ rank of the
  minimum member vertex id — deterministic; reference
  `Utility/buildNextPhase.cpp:48-79` scans vertices 0..NV-1 serially, which
  yields exactly "communities ordered by their minimum member id" for any
  assignment where each community contains its own minimum... see note in
  :func:`renumber_contiguously`),
- the original-vertex assignment is folded through (`C_orig[i] = C[C_orig[i]]`,
  `runMultiPhaseBasic.cpp:105-112`) — a join, not a scatter,
- the graph is coarsened: one vertex per cluster, edge weights summed
  (`buildNextLevelGraphOpt`, `buildNextPhase.cpp:83-255`). Over a symmetrized
  edge table this is literally ``groupBy(C[src], C[dst]).sum(weight)``:
  cross-cluster pairs keep both directions, intra-cluster mass folds into a
  self-loop of weight 2*w_intra + w_self — byte-identical totals to the CSR
  construction,
- loop while the phase's modularity gain exceeds ``threshold`` with caps of
  200 phases / 100000 total iterations (`runMultiPhaseBasic.cpp:116`).

Coarsened graphs shrink fast, so later phases' per-vertex tables drop under
the broadcast threshold and AQE switches the gather join to broadcast —
the Spark analogue of the reference keeping later phases cheap in cache.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph
from grappolo_spark.operators.louvain import louvain_one_phase
from grappolo_spark.plans.iteration import cut_lineage
from grappolo_spark.plans.ranking import dense_rank_ids


RENUMBER_SMALL_THRESHOLD = 100_000


@contextmanager
def _aqe_off_for_small(spark, nv: int | None, threshold: int = 100_000):
    """Disable adaptive execution around a SMALL phase's jobs.

    AQE's per-stage re-planning is pure overhead once a coarse graph is
    tiny — there is no skew to split and no partitions worth coalescing
    at <100k rows, but every query stage still pays the adaptive
    round-trip. Measured on the forced-distributed multiphase (warm,
    alternated A/B): sf0.001 15.5-19.5s with AQE vs 13.4-14.3s without;
    at sf0.1 the gate is load-noise-neutral (31-36s both ways, Q
    bit-identical) — the win is the micro-phase tail. Callers gate only
    coarse phases (phase 1's input can be dense at small nv and keeps
    AQE's skew handling). The conf is restored even on error; results
    materialized inside (parquet commits) are unaffected by the
    restore.

    The toggle is SESSION-GLOBAL: a concurrent query on the same
    SparkSession during a gated window would also run without AQE.
    Acceptable for the single-threaded bench/driver this repo targets;
    scope via a cloned session (``spark.newSession()``) if concurrent
    use ever arrives."""
    if nv is None or nv > threshold:
        yield
        return
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _renumber_np(vs, cs):
    """Array core of the driver-side renumber: rank communities by their
    minimum member vertex id (= the reference's first-appearance order of
    a serial 0..NV-1 scan); sentinel -1 (and any negative id) stays -1."""
    import numpy as np

    pos = cs >= 0
    # min member vertex id per community, ranked ascending = the
    # reference's first-appearance order of a serial 0..NV-1 scan
    order_idx = np.lexsort((vs[pos], cs[pos]))
    cu, firstpos = np.unique(cs[pos][order_idx], return_index=True)
    rank = np.argsort(np.argsort(vs[pos][order_idx][firstpos]))
    remap = dict(zip(cu.tolist(), rank.tolist()))
    new_c = np.array([remap[c] if c >= 0 else -1 for c in cs.tolist()],
                     dtype=np.int64)
    return new_c, len(cu)


def renumber_contiguously(
    assign: DataFrame,
    size_hint: int | None = None,
    small_threshold: int = RENUMBER_SMALL_THRESHOLD,
) -> tuple[DataFrame, int]:
    """Renumber communities to dense 0..k-1.

    The reference renumbers in first-appearance order of a serial 0..NV-1
    scan (`buildNextPhase.cpp:48-79`); that order equals ranking communities
    by their minimum member vertex id. We reproduce that rank — deterministic
    and distributed (groupBy + a k-row window, k = #communities).
    Sentinel −1 (isolated, dropped by vertex following) stays −1.

    ``size_hint`` (an upper bound on the ROW count of ``assign`` —
    multiphase passes the phase's vertex count) selects a driver-side fast
    path below ``small_threshold``: collect the assignment, renumber in
    Python, and return a **LocalRelation** (``createDataFrame``). One
    simple-scan action, and — the real win for the coarse phases, where
    ~2s/job of plan-compile dominates — the result carries its data in
    the plan, so downstream consumers (coarsen's two joins, the end-of-run
    C_orig fold) broadcast it with no lineage cut and no scratch-parquet
    lifetime to manage. Identical values either way; without a hint the
    distributed path runs (a billion-community phase 1 must never collect).
    """
    spark = assign.sparkSession
    if size_hint is not None and size_hint <= small_threshold:
        import numpy as np
        import pandas as pd

        # Arrow both ways: py4j row collect / pickle createDataFrame are
        # ~10x slower than toPandas/pandas at these row counts
        pdf = assign.select("v", "comm").toPandas()
        vs = pdf["v"].to_numpy(dtype=np.int64)
        cs = pdf["comm"].to_numpy(dtype=np.int64)
        new_c, k = _renumber_np(vs, cs)
        out = spark.createDataFrame(
            pd.DataFrame({"v": vs, "comm": new_c}), "v long, comm long"
        )
        return out, k
    firsts = (
        assign.filter(F.col("comm") >= 0)
        .groupBy("comm")
        .agg(F.min("v").alias("first_v"))
    )
    # distributed partition-offset ranking (runs EVERY phase — a global
    # single-partition window here would funnel ~|V|/2 community ids
    # through one task at phase 1); k falls out of the offsets for free
    ranked, k = dense_rank_ids(firsts, "first_v", out="new_comm")
    mapping = ranked.select("comm", "new_comm")
    out = (
        assign.join(mapping, "comm", "left")
        .select("v", F.coalesce("new_comm", F.lit(-1)).cast("long").alias("comm"))
    )
    return out, k


def coarsen(g: Graph, assign: DataFrame) -> Graph:
    """One vertex per cluster; summed edge weights; zero-weight self-loop
    guaranteed per cluster (reference `buildNextPhase.cpp:120-127`).

    Directedness is preserved: a directed graph's edge table is not
    symmetrized, so the grouped fold keeps direction and the coarse graph
    stays directed (`runDirectedMultiPhaseBasic.cpp:121-131` coarsens the
    out-CSR unchanged)."""
    a_src = assign.select(F.col("v").alias("src"), F.col("comm").alias("csrc"))
    a_dst = assign.select(F.col("v").alias("dst"), F.col("comm").alias("cdst"))
    folded = (
        g.edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter((F.col("csrc") >= 0) & (F.col("cdst") >= 0))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"), "weight")
    )
    placeholders = (
        assign.filter(F.col("comm") >= 0)
        .select(F.col("comm").alias("src"))
        .distinct()
        .select("src", F.col("src").alias("dst"), F.lit(0.0).alias("weight"))
    )
    coarse = (
        folded.unionByName(placeholders)
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )
    # groupBy output: unique (src, dst) by construction
    return Graph(edges=coarse, directed=g.directed, deduped=True)


@dataclass
class LouvainResult:
    assignment: DataFrame  # (v, comm) over ORIGINAL vertex ids
    modularity: float
    num_clusters: int
    phases: int
    total_iterations: int
    phase_history: list = field(default_factory=list)


def louvain(
    g: Graph,
    threshold: float = 1e-6,
    c_threshold: float = 0.01,
    min_graph_size: int = 100_000,
    max_phases: int = 200,
    max_total_iters: int = 100_000,
    coloring: bool = False,
    num_colors_cap: int = 1024,
    coloring_algo: str = "auto",
    local_threshold: int = 2_000_000,
    vertex_following: bool = False,
    sample_fraction: float | None = None,
    seed: int = 12345,
    early_terminate: bool = False,
    fast_track_resistance: bool = False,
    smart_init: bool = False,
    lineage_cut_every: int = 1,
    sample_hash: str = "xxh64",
    ids32: bool | None = None,
    run_dir: str | None = None,
) -> LouvainResult:
    """Full multi-phase Louvain (flagship query — reference entry point
    `driverForGraphClustering.cpp:52-247`).

    ``coloring=True`` runs each phase's sweep one color class at a time
    (Gauss-Seidel-like convergence with deterministic parallelism —
    `Coloring/parallelLouvainWithColoring.cpp:158-218`) while the coarse
    graph is larger than ``min_graph_size``, with the coarse threshold
    ``c_threshold``; a final plain phase always runs at ``threshold``
    (`runMultiPhaseColoring.cpp:110-126`).
    ``vertex_following=True`` collapses degree-0/1 vertices first
    (`Utility/vertexFollowing.cpp:46-86`).
    ``smart_init=True`` warm-starts each plain phase with the one-pass
    all-singleton sweep (``initCommAssOpt``,
    `Utility/utilityClusteringFunctions.cpp:108-169`).
    ``local_threshold``: coarse phases whose EDGE-ROW count drops below it
    run the IDENTICAL kernel driver-locally in numpy
    (:func:`louvain_local_tail`) — distributed supersteps over a
    small coarse graph are pure fixed job overhead, the Spark analogue of
    the reference keeping later phases in cache. 0 disables. Variant flags
    (sampling / early-terminate / FTR / coloring / run_dir resumability)
    always take the distributed path; ``smart_init`` is honored on BOTH
    paths (the local kernel replays the same warm start in numpy).
    Directed graphs (``Graph(directed=True)``) run the directed kernel
    (constant 2/m) and coarsen without symmetrizing — the
    `runDirectedMultiPhaseBasic.cpp:52-170` driver.
    """
    from grappolo_spark.operators.coloring import louvain_one_phase_colored
    from grappolo_spark.operators.louvain import louvain_local_tail
    from grappolo_spark.operators.vertex_following import (
        apply_vertex_following,
        vertex_following_map,
    )

    spark = g.edges.sparkSession

    if g.directed and (coloring or vertex_following):
        raise ValueError(
            "coloring / vertex_following assume a symmetrized edge table; "
            "not supported with directed=True"
        )

    vf_map = None
    if vertex_following:
        vf_map = vertex_following_map(g)  # (v, rep) with rep=-1 for isolated
        g = apply_vertex_following(g, vf_map)

    # C_orig over the current graph's vertices (identity at phase 1).
    # NOT cut: the identity is consumed exactly once, as the head of the
    # end-of-run fold chain, so the single "result" cut at the bottom
    # materializes it for free — a dedicated cut here was one full O(V)
    # write+read job outside the phases for nothing.
    c_orig = g.vertex_ids().select("v", F.col("v").alias("comm"))

    prev_mod = -1.0
    curr_mod = -1.0
    phase = 1
    tot_itr = 0
    num_clusters = 0
    history = []
    phase_maps = []  # deferred C_orig folds: one composed join at the end
    cur_g = g
    prev_k = None  # phase p+1's vertex count == phase p's cluster count
    two_m_seen = None  # 2m from phase 1's kernel — conserved by coarsening

    while True:
        phase_t0 = time.time()
        # phase 1's |V| is a distinct-count job over the full edge table;
        # the plain path only needs it AFTER the phase (renumber size
        # hint), and the kernel's own stats action counts vdeg rows anyway
        # (res.num_vertices) — so the upfront count runs only when the
        # coloring gate needs nv BEFORE the phase. Coarse phases get it
        # free from the previous phase's cluster count.
        edges_np_hint = None
        if prev_k is not None:
            nv = prev_k
        elif coloring:
            if cur_g.vertices is None:
                # the gate's |V| can ride a bounded edge probe instead of
                # a distinct-count job, and the probe-collected arrays are
                # handed to the colored kernel so it skips its own
                # transfer; above the bound (or with explicit vertices)
                # the count job runs as before
                import numpy as np

                from grappolo_spark.operators.coloring import (
                    _SMALL_EDGES_MAX,
                )

                epdf = (
                    cur_g.edges.select("src", "dst", "weight")
                    .limit(_SMALL_EDGES_MAX + 1)
                    .toPandas()
                )
                if len(epdf) <= _SMALL_EDGES_MAX:
                    es = epdf["src"].to_numpy(np.int64)
                    ed = epdf["dst"].to_numpy(np.int64)
                    ew = epdf["weight"].to_numpy(np.float64)
                    ids = np.unique(np.concatenate([es, ed]))
                    edges_np_hint = (es, ed, ew, ids)
                    nv = len(ids)
                else:
                    nv = cur_g.num_vertices()
                del epdf
            else:
                nv = cur_g.num_vertices()
        else:
            nv = None
        use_coloring = coloring and nv is not None and nv > min_graph_size
        use_local = (
            not use_coloring
            and local_threshold > 0
            and cur_g.vertices is None  # explicit isolated vertices need
            # the degrees()-based distributed init
            and sample_fraction is None
            and not early_terminate
            and not fast_track_resistance
            and run_dir is None
            # edge rows, not vertices: the collect and the numpy sorts
            # scale with rows (one cheap count against the cut parquet)
            and cur_g.edges.count() <= local_threshold
        )
        if use_local:
            # all remaining phases in one driver-local numpy loop: one
            # collect in, one DataFrame out — the coarse graphs are a few
            # thousand rows and distributed supersteps would be pure
            # fixed job overhead
            (
                tail_assign, prev_mod, num_clusters, phase, tot_itr, tail_hist
            ) = louvain_local_tail(
                cur_g,
                threshold=threshold,
                curr_mod=curr_mod,
                phase_start=phase,
                tot_itr_start=tot_itr,
                max_phases=max_phases,
                max_total_iters=max_total_iters,
                smart_init=smart_init,
            )
            history.extend(tail_hist)
            if not phase_maps and vf_map is None and g.vertices is None:
                # whole run handled by the tail over the ORIGINAL ids, and
                # the edge endpoints ARE the vertex set (no explicit
                # isolated vertices): the C_orig fold is the identity, so
                # return the tail's LocalRelation directly — no vertex_ids
                # scan, no fold join, no result cut job
                return LouvainResult(
                    assignment=tail_assign,
                    modularity=prev_mod,
                    num_clusters=num_clusters,
                    phases=phase,
                    total_iterations=tot_itr,
                    phase_history=history,
                )
            phase_maps.append(
                tail_assign.select(
                    F.col("v").alias("comm"), F.col("comm").alias("next_comm")
                )
            )
            break

        phase_thresh = c_threshold if use_coloring else threshold
        prev_mod = curr_mod
        # gate only COARSE phases: their edge count is bounded by the
        # previous phase's cluster pairs, so nv small => the whole phase
        # is small. Phase 1's input can be dense (small nv, huge edge
        # table) and keeps AQE's skew handling.
        with _aqe_off_for_small(spark, nv if phase > 1 else None):
            if use_coloring:
                res = louvain_one_phase_colored(
                    cur_g, thresh=phase_thresh, lower=curr_mod,
                    num_colors_cap=num_colors_cap,
                    coloring_algo=coloring_algo,
                    run_dir=f"{run_dir}/phase{phase}" if run_dir else None,
                    # nv is known here (the coloring gate counted it):
                    # lets the kernel pick the src-keyed narrow layout for
                    # the small-state broadcast gather upfront
                    nv_hint=nv,
                    edges_np_hint=edges_np_hint,
                )
            else:
                res = louvain_one_phase(
                    cur_g, thresh=phase_thresh, lower=curr_mod,
                    smart_init=smart_init,
                    sample_fraction=sample_fraction,
                    seed=seed,
                    sample_hash=sample_hash,
                    early_terminate=early_terminate,
                    ftr_phase=phase if fast_track_resistance else None,
                    # coarse phases skip the stats action: 2m is conserved
                    # by coarsening and |V| == the previous phase's
                    # cluster count
                    two_m_hint=two_m_seen,
                    nv_hint=prev_k,
                    # this driver produced the dense renumbering the hints
                    # describe, so the hint-derived id bound is verified
                    _dense_ids=True,
                    # default 1: parquet-cut EVERY iteration. Chaining via
                    # localCheckpoint (>1) measured ~3x SLOWER at sf0.1 —
                    # the checkpoint materializes through the non-adaptive
                    # df.rdd path; the assignment is consumed 4-6x per
                    # iteration so some truncation is mandatory, and the
                    # parquet cut wins
                    lineage_cut_every=lineage_cut_every,
                    # None = the kernel's auto gate (int32 hot chain when
                    # the verified/dense id bound fits — see its docstring)
                    ids32=ids32,
                    run_dir=f"{run_dir}/phase{phase}" if run_dir else None,
                )
            if res.two_m:
                two_m_seen = res.two_m
            curr_mod = res.modularity
            tot_itr += res.iterations

            if nv is None:
                nv = res.num_vertices  # counted by the kernel's stats action
            # driver-side continuation: a phase that ran entirely in numpy
            # over a complete driver edge copy hands back its arrays
            # (res.local_np) — renumber/coarsen/tail/fold then finish on
            # the driver with ZERO further Spark jobs (no coarse-edges
            # parquet cut, no result cut). Values are identical: the
            # renumber is the same array code renumber_contiguously runs
            # after its collect, the coarsen produces the same aggregated
            # multiset as coarsen() (integer-exact sums + zero-weight
            # self-loop placeholders), and the tail is the same
            # _local_tail_np the use_local branch runs. Gated to the
            # shapes the fold
            # below would reduce to exactly this composition.
            np_cont = (
                res.local_np is not None
                and not phase_maps
                and vf_map is None
                and g.vertices is None
                and run_dir is None
                and sample_fraction is None
                and not early_terminate
                and not fast_track_resistance
                and local_threshold > 0
            )
            if np_cont:
                ids_np, comm_raw, e_si, e_di, e_w = res.local_np
                assign_np, num_clusters = _renumber_np(ids_np, comm_raw)
                np_cont = bool((assign_np >= 0).all())
            if not np_cont:
                # nv bounds the assignment's row count, selecting the
                # driver-side renumber for small (coarse) phases
                assign, num_clusters = renumber_contiguously(
                    res.assignment, size_hint=nv
                )
        if np_cont:
            import numpy as np
            import pandas as pd

            from grappolo_spark.operators.louvain import _local_tail_np

            history.append(
                {
                    "phase": phase,
                    "modularity": curr_mod,
                    "clusters": num_clusters,
                    "iterations": res.iterations,
                    "vertices": nv,
                    "colored": use_coloring,
                    "seconds": round(time.time() - phase_t0, 3),
                }
            )
            done = (
                phase > max_phases
                or tot_itr > max_total_iters
                or (curr_mod - prev_mod) <= threshold
            )
            if done:
                # no further phase: the end-of-run fold reduces to the one
                # renumbered phase map over the full vertex set
                out = spark.createDataFrame(
                    pd.DataFrame({"v": ids_np, "comm": assign_np}),
                    "v long, comm long",
                )
                return LouvainResult(
                    assignment=out,
                    modularity=prev_mod,
                    num_clusters=num_clusters,
                    phases=phase,
                    total_iterations=tot_itr,
                    phase_history=history,
                )
            # numpy coarsen — same aggregated multiset as coarsen():
            # summed (csrc, cdst) pairs plus a zero-weight self-loop
            # placeholder for every cluster without one
            k = num_clusters
            ns, nd = assign_np[e_si], assign_np[e_di]
            key = ns * np.int64(k) + nd
            uk, uinv = np.unique(key, return_inverse=True)
            nw = np.bincount(uinv, weights=e_w)
            cs_, cd_ = (uk // k).astype(np.int64), (uk % k).astype(np.int64)
            missing = np.setdiff1d(
                np.arange(k, dtype=np.int64), cs_[cs_ == cd_]
            )
            ts = np.concatenate([cs_, missing])
            td = np.concatenate([cd_, missing])
            tw = np.concatenate([nw, np.zeros(len(missing))])
            next_colored = coloring and k > min_graph_size
            if not next_colored and len(ts) <= local_threshold:
                phase += 1
                (
                    tail_c, t_mod, t_k, t_phase, t_itr, t_hist
                ) = _local_tail_np(
                    ts, td, tw, k, g.directed, threshold, curr_mod,
                    phase, tot_itr, max_phases, max_total_iters, smart_init,
                )
                history.extend(t_hist)
                out = spark.createDataFrame(
                    pd.DataFrame({"v": ids_np, "comm": tail_c[assign_np]}),
                    "v long, comm long",
                )
                return LouvainResult(
                    assignment=out,
                    modularity=t_mod,
                    num_clusters=t_k,
                    phases=t_phase,
                    total_iterations=t_itr,
                    phase_history=history,
                )
            # remaining phases need the distributed machinery (next phase
            # colored, or coarse edges above local_threshold): hand the
            # phase map back as a LocalRelation and rejoin the normal flow
            history.pop()  # the normal flow re-appends this phase's entry
            assign = spark.createDataFrame(
                pd.DataFrame({"v": ids_np, "comm": assign_np}),
                "v long, comm long",
            )
        if nv is None or nv > RENUMBER_SMALL_THRESHOLD:
            # distributed renumber → parquet-cut the assignment. keep_last
            # must outlive the whole run: the end-of-run fold reads every
            # phase's assignment parquet. (A persist would be cheaper on
            # paper, but interdependent caches + later unpersist trigger
            # recache-recompilation storms on this Spark build — measured
            # 35s slower at sf0.1; parquet cuts keep every phase
            # independent.) The driver path needs no cut at all: its
            # LocalRelation carries the rows in the plan.
            assign = cut_lineage(assign, tag="phase_assign", keep_last=256)
        prev_k = num_clusters

        # defer C_orig[i] = C[C_orig[i]] (`runMultiPhaseBasic.cpp:105-112`):
        # each phase map is a small cut table, so the whole chain composes
        # into ONE join job after the loop instead of a job per phase
        phase_maps.append(
            assign.select(F.col("v").alias("comm"), F.col("comm").alias("next_comm"))
        )

        history.append(
            {
                "phase": phase,
                "modularity": curr_mod,
                "clusters": num_clusters,
                "iterations": res.iterations,
                "vertices": nv,
                "colored": use_coloring,
                "seconds": round(time.time() - phase_t0, 3),
            }
        )

        if phase > max_phases or tot_itr > max_total_iters:
            break
        if (curr_mod - prev_mod) > threshold:
            with _aqe_off_for_small(spark, nv if phase > 1 else None):
                cur_g = coarsen(cur_g, assign)
                coarse_edges = cur_g.edges
                if num_clusters <= 100_000:
                    # small coarse graphs: collapse to a few partitions
                    # before the cut. Leaving the parent's partition count
                    # (e.g. 32) makes every downstream stage schedule 32
                    # near-empty tasks; at ~1k coarse vertices the
                    # task-scheduling overhead, not the data, is the
                    # phase cost.
                    coarse_edges = coarse_edges.coalesce(4)
                cur_g = Graph(
                    edges=cut_lineage(
                        coarse_edges, tag="coarse_edges", keep_last=2
                    ),
                    directed=cur_g.directed,
                )
            phase += 1
        else:
            break

    # compose all phase folds in one plan; the single "result" cut below
    # materializes the whole chain (the intermediate cut here would be a
    # second full write of the O(V) assignment — only the vertex-following
    # prolongation needs a materialized intermediate, since it re-joins it)
    for pm in phase_maps:
        c_orig = c_orig.join(pm, "comm", "left").select(
            "v", F.coalesce("next_comm", F.lit(-1)).cast("long").alias("comm")
        )

    if vf_map is not None:
        c_orig = cut_lineage(c_orig, tag="c_orig")
        # prolong through the vertex-following collapse: followed vertex
        # takes its representative's community; isolated stay -1
        rep_comm = c_orig.select(
            F.col("v").alias("rep"), F.col("comm").alias("rep_comm")
        )
        c_orig = (
            vf_map.join(rep_comm, "rep", "left")
            .select(
                "v",
                F.when(F.col("rep") < 0, F.lit(-1))
                .otherwise(F.coalesce("rep_comm", F.lit(-1)))
                .cast("long")
                .alias("comm"),
            )
        )

    c_orig = cut_lineage(c_orig, tag="result", keep_last=64)
    return LouvainResult(
        assignment=c_orig,
        modularity=prev_mod,
        num_clusters=num_clusters,
        phases=phase,
        total_iterations=tot_itr,
        phase_history=history,
    )
