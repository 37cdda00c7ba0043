"""One Louvain level (phase) as iterative DataFrame supersteps.

Faithful re-expression of the reference kernel
`BasicCommunitiesDetection/parallelLouvainMethod.cpp:65-326` — same math,
same tie-breaking, same termination — but bulk-synchronous over DataFrames
instead of OpenMP over CSR. The reference's default sweep is already
Jacobi-style (all vertices move against the *previous* iteration's
assignment), which is exactly Spark's BSP model, so semantics line up
without emulation.

Per-iteration plan (3 shuffles, every aggregation partial+final so the
exchange carries one row per (group, partition): the gather groupBy, the
community agg, and the single-pass argmax/w_own aggregate — plus ONE
action, the state commit, which carries the modularity stats as observed
metrics. The argmax is a ``min_by`` aggregation; its struct payload makes
Spark pick SortAggregate, but the sort is per-partition (distributed) and
the partial step still reduces the shuffle to O(V)):

1. gather   : edges ⋈ assign(dst) → groupBy(src, comm_dst).sum(weight)
              (= ``buildLocalMapCounter``, `utilityClusteringFunctions.cpp:172-194`);
              the assignment broadcasts below a vertex threshold so the
              partitioned edge table is only scanned, never exchanged
2. cinfo    : assign ⋈ degrees → groupBy(comm).agg(sum deg, count)
              (= ``cInfo`` maintenance, `parallelLouvainMethod.cpp:274-278`)
3. gain     : for candidate y≠curr:
              ``2*(eiy − eix) − 2*deg_v*(ay − ax)/2m`` with
              ``eix = w(v→curr) − selfLoop``, ``ax = a_curr − deg_v``,
              ``ay = a_y``  (`utilityClusteringFunctions.cpp:226-259`)
4. argmax   : positive gains only, ties → smaller community id
              (`:245-248`) via ``min_by`` over (−gain, cand) — a hash
              aggregation, not a window sort; singleton-swap protection
              (`:254-256`)
5. modularity: ``Q = e_xx/2m − Σa_C²/(2m)²`` with e_xx measured on the
              *pre-move* assignment (`parallelLouvainMethod.cpp:244-255`),
              collected as CollectMetrics observations during the commit
6. stop when ``currMod − prevMod < thresh``; return the assignment from the
              *previous* iteration (`:266-268, 302-307`)

Isolated vertices never move (reference sets target −1, `:219-221`); here
they simply have no gather rows, so they keep their own singleton label.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Observation

from grappolo_spark.graph import Graph
from grappolo_spark.plans.iteration import (
    SuperstepRunner,
    cut_lineage,
    promote_result,
    read_observation,
)


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    degrees: DataFrame,
    directed: bool = False,
) -> float:
    """Q of a (v, comm) partition over a canonical edge table.

    Implements the formula the reference leaves stubbed in
    `utilityClusterComparisonMetrics.cpp:409-411` using the kernel's own
    accounting (`parallelLouvainMethod.cpp:244-255`). With ``directed``
    the edge table is taken as arcs and the constant doubles to 2/m
    (`parallelDirectedLouvainMethod.cpp:103-105`); ``degrees`` must then
    be out-degrees.
    """
    two_m = edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    if two_m == 0:
        return 0.0
    if directed:
        two_m /= 2.0  # const = 2/m expressed through the shared 1/two_m path
    a_src = assign.withColumnRenamed("v", "src").withColumnRenamed("comm", "comm_src")
    a_dst = assign.withColumnRenamed("v", "dst").withColumnRenamed("comm", "comm_dst")
    e_xx = (
        edges.join(a_src, "src")
        .join(a_dst, "dst")
        .filter(F.col("comm_src") == F.col("comm_dst"))
        .agg(F.sum("weight"))
        .collect()[0][0]
        or 0.0
    )
    a2_x = (
        assign.join(degrees, "v")
        .groupBy("comm")
        .agg(F.sum("deg").alias("cdeg"))
        .agg(F.sum(F.col("cdeg") * F.col("cdeg")))
        .collect()[0][0]
        or 0.0
    )
    return e_xx / two_m - a2_x / (two_m * two_m)


def _ftr_terms(curr_mod: float, nv: float, n_c2: float, w_2: float):
    """Fast-Track-Resistance terms — the ONE implementation of the
    Granell/Gomez/Arenas resolution-limit exit used by the FTR kernel and
    :func:`ftr_metrics` (`parallelLouvainMethodFastTrackResistance.cpp:193-239`):
    ``r_min = (−2m/nd)·Q`` with ``nd = n − Σ|C|²/n``, and
    ``Q_AFG = (2m·Q + r_min·nd) / (2m − n·r_min)``; optimal when Q_AFG == 0.
    """
    nd = nv - n_c2 / nv if nv else 0.0
    r_min = (-w_2 / nd) * curr_mod if nd else 0.0
    denom = w_2 - nv * r_min
    q_afg = (w_2 * curr_mod + r_min * nd) / denom if denom else 0.0
    return r_min, q_afg


def ftr_metrics(
    edges: DataFrame, assign: DataFrame, degrees: DataFrame
) -> dict:
    """FTR diagnostics of a fixed (v, comm) partition: modularity Q plus
    the resolution terms r_min and Q_AFG. Pure column arithmetic over the
    same accounting as :func:`modularity` — every term is ANSI-SQL
    expressible, so the driver value-oracles the FTR math itself (the
    kernel's Q_AFG exit is the same ``_ftr_terms`` call)."""
    q = modularity(edges, assign, degrees)
    w_2 = edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    row = (
        assign.groupBy("comm")
        .agg(F.count(F.lit(1)).alias("csize"))
        .agg(
            F.sum(F.col("csize") * F.col("csize")).alias("n_c2"),
            F.sum("csize").alias("nv"),
        )
        .collect()[0]
    )
    nv = float(row["nv"] or 0)
    n_c2 = float(row["n_c2"] or 0)
    r_min, q_afg = _ftr_terms(q, nv, n_c2, w_2)
    return {"modularity": q, "r_min": r_min, "q_afg": q_afg, "nv": nv, "n_c2": n_c2}


@dataclass
class LouvainPhaseResult:
    assignment: DataFrame  # (v, comm)
    modularity: float  # prevMod, as returned by the reference kernel
    iterations: int
    # total edge weight (2m), conserved by coarsening — multiphase feeds it
    # back to later phases as two_m_hint so they skip the stats action
    two_m: float = 0.0
    # |V| as seen by the kernel (from the stats action or the caller's
    # nv_hint) — lets multiphase skip its own distinct-count job for the
    # phase-1 renumber size hint. None when the kernel never counted.
    num_vertices: int | None = None
    # driver-held mirror of the phase, set ONLY by exact driver-side
    # kernels over a complete driver edge copy: (ids sorted, comm over
    # ids, src_pos, dst_pos, weight). Lets the multiphase driver continue
    # renumber/coarsen/tail/fold in numpy with zero further Spark jobs.
    local_np: tuple | None = None


def _singleton_sweep_best(edges: DataFrame, vdeg: DataFrame, const: float) -> DataFrame:
    """(v, cand): each vertex's best move under the all-singleton
    assumption — the ONE implementation of the ``initCommAssOpt`` gain
    (`Utility/utilityClusteringFunctions.cpp:108-169`), shared by
    :func:`smart_init_assignment` and the kernel's fused warm start so the
    gain formula exists exactly once.

    eix = 0, ax = 0, ay = deg(neighbor), so the gain collapses to
    ``2*w_uv − 2*deg_u*deg_v*const``. Strictly-positive gain required;
    ties break to the smaller neighbor id (min_by over (−gain, dst));
    swap protection (all sizes 1) blocks moves to a larger id, which with
    singleton community ids == vertex ids reduces to ``cand < v``.
    The argmax is a hash aggregation (map-side partial), not a window sort.
    """
    d_src = vdeg.select(F.col("v").alias("src"), F.col("deg").alias("deg_u"))
    d_dst = vdeg.select(F.col("v").alias("dst"), F.col("deg").alias("deg_v"))
    cand = (
        edges.filter(F.col("src") != F.col("dst"))
        .join(d_src, "src")
        .join(d_dst, "dst")
        .withColumn(
            "gain",
            2.0 * F.col("weight")
            - 2.0 * F.col("deg_u") * F.col("deg_v") * F.lit(const),
        )
        .filter(F.col("gain") > 0)
    )
    return (
        cand.groupBy("src")
        .agg(
            F.min_by(
                "dst", F.struct((-F.col("gain")).alias("ng"), F.col("dst"))
            ).alias("cand")
        )
        .filter(F.col("cand") < F.col("src"))
        .select(F.col("src").alias("v"), "cand")
    )


def smart_init_assignment(g: Graph) -> DataFrame:
    """One-pass warm start — reference ``initCommAssOpt``
    (`Utility/utilityClusteringFunctions.cpp:108-169`).

    Each vertex evaluates its neighbors assuming the all-singleton
    assignment (see :func:`_singleton_sweep_best` for the gain/tie-break) —
    one edge-table pass with a per-vertex argmax, no community-info join
    and no modularity action. Equivalent to the kernel's first Jacobi
    iteration, at a fraction of its cost.
    """
    vdeg = g.degrees().select("v", "deg")
    two_m = g.edges.agg(F.sum("weight")).collect()[0][0] or 0.0
    if two_m == 0.0:
        return g.vertex_ids().select("v", F.col("v").alias("comm"))
    const = (2.0 if g.directed else 1.0) / two_m
    best = _singleton_sweep_best(g.edges, vdeg, const)
    return (
        g.vertex_ids()
        .join(best, "v", "left")
        .select("v", F.coalesce("cand", F.col("v")).cast("long").alias("comm"))
    )


def louvain_one_phase_local(
    g: Graph,
    thresh: float = 1e-6,
    lower: float = -1.0,
    max_iters: int = 1000,
    smart_init: bool = False,
) -> LouvainPhaseResult:
    """The SAME Jacobi kernel, executed driver-locally in numpy.

    Multi-phase coarsening shrinks the graph geometrically; past phase 1-2
    the coarse graph is a few thousand rows and every distributed superstep
    is pure fixed overhead (2 Spark jobs for microseconds of math). This
    kernel collects the edge table once and replays the identical
    iteration: same gather, same gain ``2*(eiy−eix) − 2*deg*(ay−ax)/2m``,
    same (gain desc, cand asc) tie-break, same community-id swap
    protection, same pre-move modularity and termination — the counterpart
    of the reference keeping later phases hot in cache
    (`runMultiPhaseBasic.cpp:52-170`). With integer-valued weights (all
    coarse graphs built from count weights) the arithmetic is exact, so
    results are bit-identical to the distributed kernel; with real weights
    partial-sum order may differ in the last ulp (documented).
    Plain kernel only — callers fall back to the distributed path for
    sampling / early-termination / FTR / coloring variants.
    """
    import numpy as np

    src, dst, w = _collect_edges_np(g)
    spark = g.edges.sparkSession
    if len(src) == 0:
        return LouvainPhaseResult(
            spark.createDataFrame([], "v long, comm long"), 0.0, 0
        )
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    prev_comm, prev_mod, num_itrs = _local_kernel(
        s, d, w, len(ids), g.directed, thresh, lower, max_iters,
        smart_init=smart_init,
    )
    if prev_comm is None:
        return LouvainPhaseResult(
            spark.createDataFrame([], "v long, comm long"), 0.0, 0
        )
    import pandas as pd

    out = spark.createDataFrame(
        pd.DataFrame({"v": ids, "comm": ids[prev_comm]}), "v long, comm long"
    )
    return LouvainPhaseResult(out, prev_mod, num_itrs)


def _collect_edges_np(g: Graph):
    """Edge table -> numpy columns via one Arrow transfer (collect() walks
    py4j row objects — ~10x slower at a million rows)."""
    import numpy as np

    pdf = g.edges.select("src", "dst", "weight").toPandas()
    return (
        pdf["src"].to_numpy(dtype=np.int64),
        pdf["dst"].to_numpy(dtype=np.int64),
        pdf["weight"].to_numpy(dtype=np.float64),
    )


def _first_group_starts(sorted_arr):
    """Indices of the first element of each run in a SORTED array — what
    ``np.unique(..., return_index=True)[1]`` computes, without re-sorting
    (two passes instead of an O(n log n) sort; this box's throttled
    memory bus makes every full-width pass count)."""
    import numpy as np

    if len(sorted_arr) == 0:
        return np.empty(0, dtype=np.int64)
    mask = np.empty(len(sorted_arr), dtype=bool)
    mask[0] = True
    np.not_equal(sorted_arr[1:], sorted_arr[:-1], out=mask[1:])
    return np.flatnonzero(mask)


def _smart_init_np(s, d, w, vdeg, const, nv):
    """Numpy mirror of :func:`_singleton_sweep_best` — the initCommAssOpt
    one-pass warm start in index space: gain ``2*w − 2*deg_u*deg_v*const``
    over non-self edges, strictly positive, argmax per vertex with
    (gain desc, neighbor asc) tie-break, then the all-singleton swap rule
    (keep only moves to a smaller id). Exact for integer-valued weights."""
    import numpy as np

    m = s != d
    ss, dd, ww = s[m], d[m], w[m]
    gain = 2.0 * ww - 2.0 * vdeg[ss] * vdeg[dd] * const
    pos = gain > 0
    ss, dd, gain = ss[pos], dd[pos], gain[pos]
    comm = np.arange(nv, dtype=np.int64)
    if len(ss):
        # (gain desc, neighbor asc) argmax per src WITHOUT the 3-key
        # lexsort (the float key made it the dominant cost): one int sort
        # by src, segment-max the gains, then segment-min the neighbor
        # among the rows that hit their segment's max. Gains are strictly
        # positive floats compared bitwise, so the winner set is identical
        # to the lexsort pick.
        order = np.argsort(ss, kind="stable")
        so, do_, go = ss[order], dd[order], gain[order]
        starts = _first_group_starts(so)
        seg_max = np.maximum.reduceat(go, starts)
        counts = np.diff(np.append(starts, len(so)))
        at_max = go == np.repeat(seg_max, counts)
        so2, do2 = so[at_max], do_[at_max]
        starts2 = _first_group_starts(so2)
        pick_v = so2[starts2]
        pick_c = np.minimum.reduceat(do2, starts2)
        keep = pick_c < pick_v
        comm[pick_v[keep]] = pick_c[keep]
    return comm


def _local_kernel(s, d, w, nv, directed, thresh, lower, max_iters,
                  smart_init=False):
    """Index-space core of the local kernel (ids must be 0..nv-1).
    Returns (prev_comm array | None when 2m==0, prev_mod, iterations).
    ``smart_init`` seeds from the initCommAssOpt warm start instead of the
    all-singleton assignment — the same flag the distributed kernel honors,
    so the local fast path no longer silently ignores it."""
    import numpy as np

    vdeg = np.bincount(s, weights=w, minlength=nv)
    selfw = np.bincount(s[s == d], weights=w[s == d], minlength=nv)
    two_m = float(w.sum())
    if two_m == 0.0:
        return None, 0.0, 0
    const = (2.0 if directed else 1.0) / two_m

    if smart_init:
        comm = _smart_init_np(s, d, w, vdeg, const, nv)
    else:
        comm = np.arange(nv, dtype=np.int64)
    # when nv^2 fits int32 the packed key sorts at half the memory-bus
    # width — the per-iteration np.unique sort is this kernel's dominant
    # cost on a bandwidth-bound box. Same keys, same sort order, same
    # inverse: bit-identical results either way.
    key32 = nv * nv < (1 << 31)
    # s is loop-invariant: precompute its key contribution once, at the
    # key's width (int32 when it fits — see note above)
    s_base = (s * nv).astype(np.int32) if key32 else s * nv
    prev_comm = comm
    prev_mod = -1.0
    num_itrs = 0
    for _ in range(max_iters):
        num_itrs += 1
        cdeg = np.bincount(comm, weights=vdeg, minlength=nv)
        csize = np.bincount(comm, minlength=nv)
        # gather: sum weight per (src, comm[dst]) via a packed int key
        if key32:
            key = s_base + comm.astype(np.int32)[d]
        else:
            key = s_base + comm[d]
        uk, inv = np.unique(key, return_inverse=True)
        wsum = np.bincount(inv, weights=w)
        gv = uk // nv
        gc = uk % nv
        own = gc == comm[gv]
        w_own = np.zeros(nv)
        w_own[gv[own]] = wsum[own]

        e_xx = float(w_own.sum())
        a2_x = float((cdeg * cdeg).sum())
        curr_mod = e_xx * const - a2_x * const * const
        if (curr_mod - prev_mod) < thresh:
            break

        # reduced-score argmax (same trick as the distributed kernel):
        # eix/ax shift every candidate's gain by the same per-vertex
        # constant, so ordering by ``cw − deg·a_y·const`` picks the same
        # winner with the same (score desc, cand asc) tie-break, and the
        # full gain formula runs only on the O(V) winners — fewer full-
        # width passes over the candidate arrays (this box's throttled
        # memory bus makes each pass the dominant cost)
        cand_mask = ~own
        cv, cc, cw = gv[cand_mask], gc[cand_mask], wsum[cand_mask]
        best = np.full(nv, -1, dtype=np.int64)
        if len(cv):
            score = cw - vdeg[cv] * cdeg[cc] * const
            order = np.lexsort((cc, -score, cv))
            first = _first_group_starts(cv[order])
            pick_v = cv[order][first]
            pick_c = cc[order][first]
            pick_w = cw[order][first]
            eix = w_own[pick_v] - selfw[pick_v]
            ax = cdeg[comm[pick_v]] - vdeg[pick_v]
            ay = cdeg[pick_c]
            gain = (
                2.0 * (pick_w - eix)
                - 2.0 * vdeg[pick_v] * (ay - ax) * const
            )
            keep = gain > 0
            pick_v, pick_c = pick_v[keep], pick_c[keep]
            blocked = (
                (csize[pick_c] == 1)
                & (csize[comm[pick_v]] == 1)
                & (pick_c > comm[pick_v])
            )
            best[pick_v[~blocked]] = pick_c[~blocked]

        prev_mod = curr_mod if curr_mod > lower else lower
        prev_comm = comm
        comm = np.where(best >= 0, best, comm)
    return prev_comm, prev_mod, num_itrs


def louvain_local_tail(
    g: Graph,
    threshold: float = 1e-6,
    curr_mod: float = -1.0,
    phase_start: int = 1,
    tot_itr_start: int = 0,
    max_phases: int = 200,
    max_total_iters: int = 100_000,
    smart_init: bool = False,
):
    """Run ALL remaining multiphase phases driver-locally: one collect, one
    createDataFrame, zero intermediate Spark jobs.

    Exact mirror of the distributed multiphase loop (kernel → min-member
    renumber → C_orig fold → coarsen with zero-weight self-loop
    placeholders → gain check, `runMultiPhaseBasic.cpp:52-170`), in numpy
    index space. Returns (assignment DF over g's vertex ids with dense
    community labels, prev_mod, num_clusters, phase, tot_itr, history).
    """
    import numpy as np

    spark = g.edges.sparkSession
    src, dst, ww = _collect_edges_np(g)
    ids = (
        np.unique(np.concatenate([src, dst]))
        if len(src)
        else np.array([], dtype=np.int64)
    )
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    nv0 = len(ids)

    c_orig, prev_mod, num_clusters, phase, tot_itr, history = _local_tail_np(
        s, d, ww, nv0, g.directed, threshold, curr_mod, phase_start,
        tot_itr_start, max_phases, max_total_iters, smart_init,
    )

    import pandas as pd

    if nv0:
        out = spark.createDataFrame(
            pd.DataFrame({"v": ids, "comm": c_orig}), "v long, comm long"
        )
    else:
        out = spark.createDataFrame([], "v long, comm long")
    return out, prev_mod, num_clusters, phase, tot_itr, history


def _local_tail_np(
    s, d, ww, nv0, directed, threshold, curr_mod, phase_start,
    tot_itr_start, max_phases, max_total_iters, smart_init,
):
    """Index-space core of :func:`louvain_local_tail` (ids 0..nv0-1).
    Returns (c_orig over 0..nv0-1, prev_mod, num_clusters, phase, tot_itr,
    history) — the multiphase driver's numpy continuation calls this
    directly on a driver-coarsened graph, skipping the collect."""
    import numpy as np

    c_orig = np.arange(nv0, dtype=np.int64)
    prev_mod = -1.0
    phase = phase_start
    tot_itr = tot_itr_start
    num_clusters = 0
    history = []
    cur_s, cur_d, cur_w, cur_n = s, d, ww, nv0

    while True:
        prev_mod = curr_mod
        # smart_init applies per phase, mirroring the distributed driver
        # passing the flag into every plain phase's kernel
        comm, q, iters = _local_kernel(
            cur_s, cur_d, cur_w, cur_n, directed, threshold, curr_mod, 1000,
            smart_init=smart_init,
        )
        if comm is None:
            break
        curr_mod = q
        tot_itr += iters

        # renumber contiguously: rank communities by their minimum member
        firsts = np.full(cur_n, cur_n, dtype=np.int64)
        np.minimum.at(firsts, comm, np.arange(cur_n, dtype=np.int64))
        used = np.where(firsts < cur_n)[0]
        order = used[np.argsort(firsts[used])]
        remap = np.zeros(cur_n, dtype=np.int64)
        remap[order] = np.arange(len(order), dtype=np.int64)
        assign = remap[comm]
        num_clusters = len(order)

        c_orig = assign[c_orig]
        history.append(
            {
                "phase": phase,
                "modularity": curr_mod,
                "clusters": num_clusters,
                "iterations": iters,
                "vertices": cur_n,
                "colored": False,
                "local": True,
            }
        )
        if phase > max_phases or tot_itr > max_total_iters:
            break
        if (curr_mod - prev_mod) > threshold:
            # coarsen: fold edges through assign; guarantee a self-loop row
            # per cluster (weight 0 placeholders, `buildNextPhase.cpp:120-127`)
            k = num_clusters
            ns, nd = assign[cur_s], assign[cur_d]
            key = ns * k + nd
            uk, inv = np.unique(key, return_inverse=True)
            nw = np.bincount(inv, weights=cur_w)
            ns, nd = (uk // k).astype(np.int64), (uk % k).astype(np.int64)
            missing = np.setdiff1d(
                np.arange(k, dtype=np.int64), ns[ns == nd], assume_unique=False
            )
            cur_s = np.concatenate([ns, missing])
            cur_d = np.concatenate([nd, missing])
            cur_w = np.concatenate([nw, np.zeros(len(missing))])
            cur_n = k
            phase += 1
        else:
            break

    return c_orig, prev_mod, num_clusters, phase, tot_itr, history


# state rows at or below this bound run the plain Jacobi sweep with
# driver-held community state: the gather/argmax stays in Spark over the
# persisted edge cache (the O(E) side never moves), but the O(V) state
# crosses the boundary as broadcast LocalRelations in and one O(V) winner
# collect out — replacing the per-iteration parquet commit, the
# cinfo/state Spark joins and the observation machinery, which at small
# |V| are pure driver plan-compile and job-latency floor (the same
# structure as coloring._colored_small_state, which the round-5 A/Bs
# proved out). Identical results: integer-valued weights make every
# aggregate exact, and the score/gain/tie-break expressions are the same
# column expressions the distributed loop compiles.
_SMALL_STATE_MAX = 100_000


def _small_state_phase(
    spark,
    edges,
    e_cold,
    vdeg,
    selfw,
    const: float,
    two_m: float,
    nv_seen: int,
    thresh: float,
    lower: float,
    max_iters: int,
    init_assign,
    smart_init: bool,
    ids32: bool,
    unweighted: bool,
):
    """Driver-held-state Jacobi kernel (see _SMALL_STATE_MAX note).

    One Spark action per iteration: the fused gather→argmax job over the
    persisted edge cache, collecting O(V) winner rows. Community
    aggregates (cdeg/csize), the gain formula and the move/termination
    logic run in numpy with the exact expressions and lag structure of
    the distributed loop (and of ``_local_kernel``), so results are
    bit-identical on integer-valued weights.
    """
    import numpy as np
    import pandas as pd

    # one O(V) collect: per-vertex degree + self-loop weight
    st = (
        vdeg.join(selfw, "v", "left")
        .select("v", "deg", F.coalesce("selfloop", F.lit(0.0)).alias("selfloop"))
        .toPandas()
        .sort_values("v", kind="mergesort", ignore_index=True)
    )
    vs = st["v"].to_numpy(np.int64)
    deg = st["deg"].to_numpy(np.float64)
    selfloop = st["selfloop"].to_numpy(np.float64)
    nv = len(vs)
    if nv == 0:
        return LouvainPhaseResult(
            spark.createDataFrame([], "v long, comm long"), 0.0, 0,
            two_m=two_m, num_vertices=nv_seen,
        )

    if init_assign is not None:
        ip = init_assign.select("v", "comm").toPandas()
        imap = dict(zip(ip["v"].tolist(), ip["comm"].tolist()))
        comm = np.array([imap.get(int(v), int(v)) for v in vs], dtype=np.int64)
    elif smart_init:
        # the SHARED one-pass initCommAssOpt sweep, one extra Spark job
        # per phase (collected O(V) winners; cand < v already applied)
        bp = _singleton_sweep_best(e_cold, vdeg, const).toPandas()
        comm = vs.copy()
        if len(bp):
            idx = np.searchsorted(vs, bp["v"].to_numpy(np.int64))
            comm[idx] = bp["cand"].to_numpy(np.int64)
    else:
        comm = vs.copy()

    id_t = np.int32 if ids32 else np.int64
    id_sql = "int" if ids32 else "long"
    wsum_agg = (
        F.count(F.lit(1)).cast("double").alias("wsum")
        if unweighted
        else F.sum("weight").alias("wsum")
    )

    prev_comm = comm
    prev_mod = -1.0
    num_itrs = 0
    for _ in range(max_iters):
        num_itrs += 1
        cu, inv = np.unique(comm, return_inverse=True)
        cdeg = np.bincount(inv, weights=deg)
        csize = np.bincount(inv).astype(np.int64)

        # the one distributed job: gather + single-pass argmax/w_own over
        # the src-partitioned cache, both O(V) sides broadcast in as
        # LocalRelations typed to the cache's id attributes (ids32 keeps
        # the exchange-free chain), winners collected out
        state_src = spark.createDataFrame(
            pd.DataFrame(
                {
                    "src": vs.astype(id_t),
                    "comm": comm.astype(id_t),
                    "deg": deg,
                }
            ),
            f"src {id_sql}, comm {id_sql}, deg double",
        )
        dst_enr = spark.createDataFrame(
            pd.DataFrame(
                {
                    "dst": vs.astype(id_t),
                    "cand": comm.astype(id_t),
                    "ay": cdeg[inv],
                }
            ),
            f"dst {id_sql}, cand {id_sql}, ay double",
        )
        counter = (
            edges.join(F.broadcast(state_src), "src")
            .join(F.broadcast(dst_enr), "dst")
            .groupBy(F.col("src").alias("v"), F.col("cand"))
            .agg(
                wsum_agg,
                F.first("ay").alias("ay"),
                F.first("deg").alias("deg"),
                F.first("comm").alias("comm"),
            )
        )
        bestinfo = (
            counter.withColumn("is_own", F.col("cand") == F.col("comm"))
            .withColumn(
                "score",
                F.col("wsum") - F.col("deg") * F.col("ay") * F.lit(const),
            )
            .groupBy("v")
            .agg(
                F.min_by(
                    F.struct("cand", "wsum"),
                    F.struct(
                        F.when(F.col("is_own"), F.lit(float("inf")))
                        .otherwise(-F.col("score"))
                        .alias("ns"),
                        F.col("cand"),
                    ),
                ).alias("b"),
                F.sum(
                    F.when(F.col("is_own"), F.col("wsum")).otherwise(F.lit(0.0))
                ).alias("w_own"),
            )
        )
        rows = bestinfo.select(
            "v", F.col("b.cand").alias("cand"), F.col("b.wsum").alias("wsum"),
            "w_own",
        ).toPandas()

        # pre-move modularity (same accounting as the fused observations)
        e_xx = float(rows["w_own"].to_numpy(np.float64).sum()) if len(rows) else 0.0
        a2_x = float((cdeg * cdeg).sum())
        curr_mod = e_xx * const - a2_x * const * const
        if (curr_mod - prev_mod) < thresh:
            break

        # gain of the single best candidate + move decision, numpy mirror
        # of the distributed `moved`/`move_ok` expressions
        best = np.full(nv, -1, dtype=np.int64)
        if len(rows):
            rv = np.searchsorted(vs, rows["v"].to_numpy(np.int64))
            rcand = rows["cand"].to_numpy(np.int64)
            rwsum = rows["wsum"].to_numpy(np.float64)
            rwown = rows["w_own"].to_numpy(np.float64)
            rcomm = comm[rv]
            has_cand = rcand != rcomm
            ay = cdeg[np.searchsorted(cu, rcand)]
            eix = rwown - selfloop[rv]
            ax = cdeg[inv[rv]] - deg[rv]
            gain = 2.0 * (rwsum - eix) - 2.0 * deg[rv] * (ay - ax) * const
            cand_csize = csize[np.searchsorted(cu, rcand)]
            blocked = (
                (cand_csize == 1) & (csize[inv[rv]] == 1) & (rcand > rcomm)
            )
            keep = has_cand & (gain > 0) & ~blocked
            best[rv[keep]] = rcand[keep]

        prev_mod = curr_mod if curr_mod > lower else lower
        prev_comm = comm
        comm = np.where(best >= 0, best, comm)

    out = spark.createDataFrame(
        pd.DataFrame({"v": vs, "comm": prev_comm}), "v long, comm long"
    )
    return LouvainPhaseResult(
        assignment=out,
        modularity=prev_mod,
        iterations=num_itrs,
        two_m=two_m,
        num_vertices=nv_seen,
    )


def louvain_one_phase(
    g: Graph,
    thresh: float = 1e-6,
    lower: float = -1.0,
    max_iters: int = 1000,
    init_assign: DataFrame | None = None,
    sample_fraction: float | None = None,
    seed: int = 12345,
    sample_hash: str = "xxh64",
    early_terminate: bool = False,
    ftr_phase: int | None = None,
    lineage_cut_every: int = 1,
    salt_threshold: int = 1_000_000,
    smart_init: bool = False,
    broadcast_assign: bool | None = None,
    broadcast_max_vertices: int = 5_000_000,
    two_m_hint: float | None = None,
    nv_hint: int | None = None,
    ids32: bool | None = None,
    _dense_ids: bool = False,
    run_dir: str | None = None,
) -> LouvainPhaseResult:
    """Run one modularity-optimization level to its convergence threshold.

    ``broadcast_assign`` picks the physical gather strategy, mirroring
    :func:`grappolo_spark.operators.pagerank.pagerank`: when the assignment
    table is small (auto below ``broadcast_max_vertices``) it broadcasts
    into the ``edges JOIN assign(dst)`` gather, so the persisted edge table
    is only SCANNED per superstep — no exchange and, crucially, no
    per-superstep sort-merge sort of the O(E) side; the single per-
    iteration edge-width shuffle left is the gather's own partial-
    aggregated groupBy. Beyond the threshold (a billion-vertex assignment
    must not broadcast) the shuffle plan co-partitioned on ``dst`` is kept.

    ``init_assign`` gives warm starts (reference
    `parallelLouvainMethodInitialized.cpp:106-112`). ``sample_fraction``
    reproduces the Approx kernel's behavior
    (`parallelLouvainMethodApprox.cpp:139-155`): only a seeded random subset
    of vertices may move each iteration. ``early_terminate`` skips vertices
    whose community was unchanged over the last two iterations — the
    delta-iteration form of `parallelLouvianMethodEarlyTerminate.cpp:114,192`
    (the gather, the expensive stage, shrinks to the active set; modularity
    is then computed by a full edge scan so Q stays exact, unlike the
    reference's processed-only accounting — documented divergence).
    ``ftr_phase`` enables the Fast-Track-Resistance exit (Granell/Gomez/
    Arenas resolution-limit fix) for phases > 1: r_min and Q_AFG per
    `parallelLouvainMethodFastTrackResistance.cpp:193-239`, stop when
    Q_AFG == 0, 200-iteration cap (`:263-267`).

    Works unchanged on directed graphs (``Graph(directed=True)``, edges not
    symmetrized): vdeg becomes the out-degree and the constant 1/sum(w) is
    doubled to 1/m as in `parallelDirectedLouvainMethod.cpp:103-105`.

    ``ids32`` (None = auto): store vertex ids as 32-bit ints in the hot
    gather chain — the persisted edge cache, the gather join/aggregation
    and the argmax — halving the id bytes through the stage the round-5
    profile measured as 73% of kernel CPU (width-bound, zero shuffle).
    Auto enables it on the broadcast-gather path when the id bound is
    KNOWN to fit int32: verified via min/max ids in the start-of-phase
    stats action, or, on the multiphase hints path, implied by the dense
    contiguous renumbering contract (ids in [0, nv_hint)). Community ids
    are a subset of vertex ids, so the gather's candidate column narrows
    too. The state table, commits, and the returned assignment stay
    ``long`` — casts happen once per O(V) row at the chain boundaries.
    The shuffle-gather path never narrows (its co-partitioned joins and
    bucketed state cuts key on the canonical long columns).
    """
    spark = g.edges.sparkSession
    # weight ≡ 1.0 invariant (see Graph.unweighted): lets the hot gather
    # drop the weight column and count instead of sum — exactly equal
    unweighted = bool(getattr(g, "unweighted", False))
    vdeg_full = g.degrees().persist()
    vdeg = vdeg_full.select("v", "deg")
    # one action yields 2m AND the max degree (hub detection for salting)
    # AND |V| (broadcast-plan selection): sum of per-vertex degrees ==
    # total edge-row weight. Multiphase callers pass hints for coarse
    # phases instead — 2m is conserved by coarsening and |V| equals the
    # previous phase's cluster count, so when nv_hint is also under the
    # salting threshold (max degree <= nv-1) the whole action is skipped.
    hints_path = False
    if (
        two_m_hint is not None
        and nv_hint is not None
        and nv_hint <= salt_threshold
    ):
        hints_path = True
        two_m = two_m_hint
        use_salting = False
        nv_seen = nv_hint
        # hints path (multiphase coarse phases): ids are dense-renumbered
        # [0, nv) by contract, so nv bounds the id range
        min_id, max_id = 0, nv_hint - 1
        if broadcast_assign is None:
            broadcast_assign = nv_hint <= broadcast_max_vertices
    else:
        stats0 = vdeg_full.agg(
            F.sum("deg").alias("tw"),
            F.max("out_degree").alias("maxdeg"),
            F.count(F.lit(1)).alias("nv"),
            F.min("v").alias("min_id"),
            F.max("v").alias("max_id"),
        ).collect()[0]
        two_m = stats0["tw"] or 0.0
        use_salting = (stats0["maxdeg"] or 0) > salt_threshold
        nv_seen = stats0["nv"] or 0
        min_id = stats0["min_id"] if stats0["min_id"] is not None else 0
        max_id = stats0["max_id"] if stats0["max_id"] is not None else 0
        if broadcast_assign is None:
            broadcast_assign = nv_seen <= broadcast_max_vertices
    if ids32 is None:
        # hint-derived bounds are UNVERIFIED: auto-enable the int32 chain
        # from them only when the caller vouches for the dense-renumbering
        # contract (_dense_ids — the multiphase driver does; it produced
        # the renumbering). A public caller passing nv_hint over sparse or
        # >int32 ids must not get silent non-ANSI wrapping casts.
        ids32 = bool(broadcast_assign and (not hints_path or _dense_ids))
    elif ids32 and hints_path and not _dense_ids:
        # explicit ids32=True on unverified hints: one cheap bounds scan
        # replaces the trust — wrong communities are never an option
        row = g.edges.agg(
            F.min(F.least("src", "dst")).alias("lo"),
            F.max(F.greatest("src", "dst")).alias("hi"),
        ).collect()[0]
        min_id = row["lo"] if row["lo"] is not None else 0
        max_id = row["hi"] if row["hi"] is not None else 0
    ids32 = bool(
        ids32
        and broadcast_assign
        and -(1 << 31) <= min_id
        and max_id < (1 << 31) - 1
    )
    # hub skew (use_salting above): the gather routes through a two-stage
    # salted aggregation when any vertex's neighbor list exceeds the
    # threshold (the DataFrame analogue of the reference's per-thread
    # partial maps, `parallelLouvainMethodScale.cpp:86-90`); below it,
    # Spark's map-side partial agg absorbs the skew for free
    if two_m == 0.0:
        empty = spark.createDataFrame([], "v long, comm long")
        return LouvainPhaseResult(empty, 0.0, 0)
    const = 1.0 / two_m
    if g.directed:
        # directed modularity: constant = 1/m (reference doubles the
        # 1/sum(outDegree) constant, `parallelDirectedLouvainMethod.cpp:103-105`)
        const *= 2.0

    # hash-partition the edge table ONCE on the key the supersteps reuse;
    # every iteration then scans the persisted layout in place. The key
    # depends on the gather strategy:
    #   - broadcast gather (assignment small): the join side is broadcast,
    #     so the layout that matters is the AGGREGATION key — the gather's
    #     groupBy(v=src, cand) and the argmax's groupBy(v). src-partitioned
    #     edges satisfy both (partitioning on a subset of the grouping keys
    #     co-locates the groups), so the whole gather→counter→argmax chain
    #     runs with ZERO exchanges per superstep (plan-asserted; dst layout
    #     paid two O(E)-width shuffles per iteration here).
    #   - shuffle gather (assignment too big to broadcast): co-partition on
    #     the JOIN key dst so the O(E) side never moves per iteration; the
    #     downstream aggs then shuffle on v as before.
    # Tiny coarse phases pin a narrow partition count — the default
    # spark.sql.shuffle.partitions would fan a ~1k-vertex graph back out to
    # dozens of near-empty tasks per stage, and task scheduling (not data)
    # is the phase cost there.
    gather_key = "src" if broadcast_assign else "dst"
    # hot-cache projection: narrow the persisted layout to exactly what
    # the per-superstep gather reads — int32 ids when the bound allows
    # (ids32) and no weight column on unweighted graphs. The projection
    # happens BEFORE the one-time repartition so the exchange itself
    # moves narrow rows.
    e_base = g.edges
    if ids32 or unweighted:
        cols = (
            [
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
            ]
            if ids32
            else [F.col("src"), F.col("dst")]
        )
        if not unweighted:
            cols.append(F.col("weight"))
        e_base = e_base.select(*cols)
    if nv_hint is not None and nv_hint <= 100_000:
        # follow the input's partitioning, bounded by the session's
        # shuffle parallelism: small |V| does not imply small |E|, and a
        # constant 4 starves the sequential superstep jobs of cores when
        # the edge table is large; a tiny coarse parquet keeps its few
        # splits
        npart = max(
            4,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                g.edges.rdd.getNumPartitions(),
            ),
        )
        edges = e_base.repartition(npart, gather_key).persist()
    else:
        edges = e_base.repartition(gather_key).persist()
    # cold-path adapter: the canonical (long src, long dst, weight) view
    # for auxiliary consumers (self-loop weights, smart init, the
    # early-terminate e_xx scan). Casts/literals materialize AFTER the
    # cache scan, so the cache stays narrow and the cold paths keep the
    # canonical schema.
    e_cold = edges
    if ids32:
        e_cold = e_cold.withColumn("src", F.col("src").cast("long")).withColumn(
            "dst", F.col("dst").cast("long")
        )
    if unweighted:
        e_cold = e_cold.withColumn("weight", F.lit(1.0))

    selfw = (
        e_cold.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("v"))
        .agg(F.sum("weight").alias("selfloop"))
    )

    # small-state fast path (see _SMALL_STATE_MAX): plain-variant phases
    # with a driver-holdable O(V) state run the same supersteps with the
    # state held in numpy — the gather/argmax stays in Spark over the
    # persisted cache; one collect replaces commit+observe per iteration.
    # Variants whose semantics live outside the plain sweep (sampling,
    # early-terminate, FTR, durable run_dir, forced salting) keep the
    # distributed loop, as does any state too big to hold.
    if (
        nv_seen is not None
        and 0 < nv_seen <= _SMALL_STATE_MAX
        and broadcast_assign
        and not use_salting
        and sample_fraction is None
        and not early_terminate
        and ftr_phase is None
        and run_dir is None
    ):
        # the small-state supersteps are exchange-free (src-partitioned
        # cache + broadcast LocalRelations), so adaptive re-planning is
        # pure per-job driver latency — skip it for the sweep's jobs
        from grappolo_spark.operators.multiphase import _aqe_off_for_small

        with _aqe_off_for_small(spark, nv_seen, threshold=_SMALL_STATE_MAX):
            res = _small_state_phase(
                spark, edges, e_cold, vdeg, selfw, const, two_m, nv_seen,
                thresh, lower, max_iters, init_assign, smart_init, ids32,
                unweighted,
            )
        edges.unpersist()
        vdeg_full.unpersist()
        return res

    # with the broadcast gather OFF (billion-vertex assignments) the state
    # table is consumed by several v-keyed joins/aggs per superstep: commit
    # it BUCKETED by v at the loop's shuffle parallelism, so consumers read
    # it pre-partitioned instead of re-shuffling O(V) rows each iteration
    # (plan-asserted by test_bucketed_state_cut_skips_shuffle)
    runner = SuperstepRunner(
        spark, run_dir,
        bucket_by=None if broadcast_assign else "v",
        n_buckets=int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    start, resumed = runner.resume()
    if resumed is not None:
        assign = resumed
        prev_assign = assign
        prev_mod = runner.history[-1].get("prev_mod", -1.0) if runner.history else -1.0
    else:
        if init_assign is not None:
            assign = init_assign.select("v", "comm")
        elif smart_init:
            # fused initCommAssOpt: the SHARED one-pass sweep builder, fed
            # the partitioned edges and the vdeg/const already computed
            # here (two fewer jobs per phase than smart_init_assignment)
            best0 = _singleton_sweep_best(e_cold, vdeg, const)
            assign = vdeg.join(best0, "v", "left").select(
                "v", F.coalesce("cand", F.col("v")).cast("long").alias("comm")
            )
        else:
            assign = vdeg.select("v", F.col("v").alias("comm"))
        # parquet cut, NOT localCheckpoint: a localCheckpoint materializes
        # through the non-adaptive df.rdd compile path, and at sf0.1 the
        # kernel's iterations measured ~3x slower under it (198.6s vs
        # 72.2s whole-run A/B on an idle box) — the parquet round-trip's
        # fixed cost is the cheaper lineage truncation for multi-consumer
        # state on this build. Tiny coarse phases (nv_hint below the
        # broadcast bound) skip the cut ACTION entirely: only iteration 1
        # consumes the init plan (4-6 subplan copies over an
        # already-parquet-backed coarse graph inside ONE job), which costs
        # less than a dedicated write+read job at that size.
        if not (nv_hint is not None and nv_hint <= broadcast_max_vertices):
            assign = cut_lineage(
                assign, tag="louvain_assign",
                bucket_by=runner.bucket_by, n_buckets=runner.n_buckets,
            )
        prev_assign = assign
        prev_mod = -1.0

    hist1 = hist2 = None  # last two assignments (early-termination filter)
    num_itrs = start
    # per-iteration temporaries whose unpersist must wait until no live
    # plan references them (one-commit lag)
    pending: list = []
    retired: list = []
    # Fused-action mode (the default path): the modularity stats ride the
    # commit job as observed metrics (CollectMetrics nodes on cinfo/cur),
    # so each iteration runs ONE Spark action — the state write — instead
    # of a stats-collect plus a commit-write. The stop decision then lands
    # one commit late: the final (discarded) move is committed to scratch,
    # which is harmless because the kernel returns the PREVIOUS iteration's
    # assignment anyway (`parallelLouvainMethod.cpp:266-268,302-307`).
    # Variants whose stop inputs live outside cinfo/cur (early-terminate's
    # edge-scan e_xx, FTR's Q_AFG exit) and durable runs (run_dir: the
    # _METRICS.json sidecar must hold final numbers at write time) keep
    # the two-action flow. Chained cuts (lineage_cut_every > 1) compose
    # with fusion: non-cut iterations localCheckpoint the new assignment
    # (firing the observations) — no parquet round-trip — and every Nth
    # iteration commits through the runner to keep the plan tree bounded.
    # Chaining is NOT the default here: A/B at sf0.1 measured the
    # localCheckpoint path ~3x slower than per-iteration parquet commits
    # on this build (the non-adaptive df.rdd compile path), so
    # lineage_cut_every=1 stays the default; the branch is kept because
    # the economics differ per deployment (a real cluster with slow DFS
    # favors chaining) and its output equivalence is pinned by
    # tests/test_round2_fixes.py::test_lineage_cut_cadence_invariant.
    fuse_stats = run_dir is None and not early_terminate and ftr_phase is None
    for step in range(start, max_iters):
        num_itrs = step + 1
        # --- active set (early termination) --------------------------------
        active_src = None
        if early_terminate and hist1 is not None and hist2 is not None:
            stable = (
                assign.join(hist1.withColumnRenamed("comm", "c1"), "v")
                .join(hist2.withColumnRenamed("comm", "c2"), "v")
                .filter((F.col("comm") == F.col("c1")) & (F.col("c1") == F.col("c2")))
                .select("v")
            )
            active_src = assign.join(stable, "v", "left_anti").select(
                F.col("v").alias("src")
            )
        # --- cinfo of the current assignment ------------------------------
        cinfo = (
            assign.join(vdeg, "v")
            .groupBy("comm")
            .agg(F.sum("deg").alias("cdeg"), F.count(F.lit(1)).alias("csize"))
        )
        obs_cinfo = obs_cur = None
        if fuse_stats:
            obs_cinfo = Observation()
            cinfo = cinfo.observe(
                obs_cinfo,
                F.sum(F.col("cdeg") * F.col("cdeg")).alias("a2_x"),
                F.sum(F.col("csize") * F.col("csize")).alias("n_c2"),
                F.sum("csize").alias("nv"),
            )
        cinfo = cinfo.persist()

        # --- gather: weight from each vertex to each neighbor community ---
        # canonical long-id view (cold paths: early-terminate e_xx scan)
        a_dst = assign.select(
            F.col("v").alias("dst"), F.col("comm").alias("comm_dst")
        )
        if ids32:
            # hot join side in the cache's int32 types: join/agg keys stay
            # the cached attributes, preserving the exchange-free chain
            # (comm ids are a subset of vertex ids, so cand fits too)
            a_dst_hot = assign.select(
                F.col("v").cast("int").alias("dst"),
                F.col("comm").cast("int").alias("comm_dst"),
            )
            active_hot = (
                active_src.select(F.col("src").cast("int").alias("src"))
                if active_src is not None
                else None
            )
        else:
            a_dst_hot = a_dst
            active_hot = active_src
        gather_base = edges
        if unweighted and use_salting:
            # rare combo (hub graph with no weights): the salted sum needs
            # a weight column; restore the literal after the cache scan
            gather_base = edges.withColumn("weight", F.lit(1.0))
        gather_edges = (
            gather_base.join(active_hot, "src", "left_semi")
            if active_hot is not None
            else gather_base
        )
        # broadcast the O(V) assignment below the vertex threshold: the
        # persisted O(E) side is scanned in place — no exchange, no sort
        a_dst_side = F.broadcast(a_dst_hot) if broadcast_assign else a_dst_hot
        if unweighted and not use_salting:
            # weight ≡ 1.0 by construction (Graph.unweighted): drop the
            # 8-byte weight column from the hot gather entirely and count
            # rows instead of summing doubles — exact (integer counts are
            # exact doubles) and one column narrower through the fused
            # stage that the round-5 profile showed is width-bound
            gathered = gather_edges.join(a_dst_side, "dst").select(
                F.col("src").alias("v"), F.col("comm_dst").alias("cand")
            )
            counter = gathered.groupBy("v", "cand").agg(
                F.count(F.lit(1)).cast("double").alias("wsum")
            )
        else:
            gathered = gather_edges.join(a_dst_side, "dst").select(
                F.col("src").alias("v"), F.col("comm_dst").alias("cand"), "weight"
            )
            if use_salting:
                from grappolo_spark.plans.salting import salted_sum

                counter = salted_sum(gathered, ["v", "cand"], "weight", out="wsum")
            else:
                counter = gathered.groupBy("v", "cand").agg(
                    F.sum("weight").alias("wsum")
                )

        # --- single-pass best candidate + own-community weight -------------
        # The argmax does NOT need eix/ax: they shift every candidate's gain
        # by the same per-vertex constant, so ordering by the reduced score
        # ``wsum − deg·a_y·const`` picks the identical winner (ties included
        # — equal gains ⇔ equal scores). That lets ONE groupBy(v) produce
        # both the best candidate (min_by over (−score, cand)) AND the
        # own-community weight w_own (conditional sum) — no per-vertex
        # ``cur`` table, no second O(E)-width join, no counter persist.
        # The per-vertex constants (comm, deg, selfloop, cdeg_cur,
        # csize_cur) ride along via first(): identical on every row of a
        # group, since they come from the same O(V) state join.
        state0 = (
            assign.join(vdeg, "v")
            .join(selfw, "v", "left")
            .join(
                cinfo.select(
                    F.col("comm"), F.col("cdeg").alias("cdeg_cur"),
                    F.col("csize").alias("csize_cur"),
                ),
                "comm",
            )
            .select(
                "v", "comm", "deg",
                F.coalesce("selfloop", F.lit(0.0)).alias("selfloop"),
                "cdeg_cur", "csize_cur",
            )
        )
        cinfo_cand = cinfo.select(
            F.col("comm").alias("cand"), F.col("cdeg").alias("ay"),
            F.col("csize").alias("csize_cand"),
        )
        # broadcast the O(V) sides of the enriched join when the
        # assignment is small: without the hint the planner sort-merge
        # joins — i.e. SORTS — the O(E)-width counter every iteration
        # (measured 3.4x slower at sf0.1)
        if ids32:
            # match the counter's int32 key attributes so the join and the
            # following groupBy("v") reuse the cached partitioning — a
            # long/int coercion here would rewrite the grouping key into a
            # derived cast and reintroduce an exchange
            state0 = state0.withColumn("v", F.col("v").cast("int"))
            cinfo_cand = cinfo_cand.withColumn(
                "cand", F.col("cand").cast("int")
            )
        state0_side = F.broadcast(state0) if broadcast_assign else state0
        cc_side = F.broadcast(cinfo_cand) if broadcast_assign else cinfo_cand
        enriched = (
            counter.join(state0_side, "v")
            .join(cc_side, "cand")
            .withColumn("is_own", F.col("cand") == F.col("comm"))
            .withColumn(
                "score",
                F.col("wsum") - F.col("deg") * F.col("ay") * F.lit(const),
            )
        )
        bestinfo = enriched.groupBy("v").agg(
            F.min_by(
                F.struct("cand", "wsum", "ay", "csize_cand"),
                F.struct(
                    # own-community rows are masked out of the argmax
                    F.when(F.col("is_own"), F.lit(float("inf")))
                    .otherwise(-F.col("score"))
                    .alias("ns"),
                    F.col("cand"),
                ),
            ).alias("b"),
            F.sum(
                F.when(F.col("is_own"), F.col("wsum")).otherwise(F.lit(0.0))
            ).alias("w_own"),
            F.first("comm").alias("comm"),
            F.first("deg").alias("deg"),
            F.first("selfloop").alias("selfloop"),
            F.first("cdeg_cur").alias("cdeg_cur"),
            F.first("csize_cur").alias("csize_cur"),
        )
        if ids32:
            # chain boundary: back to canonical long ids for the O(V)
            # state update (b.cand flows through when()-coercion to long)
            bestinfo = bestinfo.withColumn("v", F.col("v").cast("long"))
        if fuse_stats:
            obs_cur = Observation()
            bestinfo = bestinfo.observe(obs_cur, F.sum("w_own").alias("e_xx"))
        bestinfo = bestinfo.persist()

        if not fuse_stats:
            # --- modularity of the pre-move assignment (combined action) ---
            if active_src is not None:
                a_src_m = assign.select(
                    F.col("v").alias("src"), F.col("comm").alias("comm_src")
                )
                exx_df = (
                    e_cold.join(a_src_m, "src")
                    .join(a_dst, "dst")
                    .filter(F.col("comm_src") == F.col("comm_dst"))
                    .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("e_xx"))
                )
            else:
                exx_df = bestinfo.agg(F.sum("w_own").alias("e_xx"))
            stats = (
                exx_df
                .crossJoin(
                    cinfo.agg(
                        F.sum(F.col("cdeg") * F.col("cdeg")).alias("a2_x"),
                        F.sum(F.col("csize") * F.col("csize")).alias("n_c2"),
                        F.sum("csize").alias("nv"),
                    )
                )
                .collect()[0]
            )
            e_xx = stats["e_xx"] or 0.0
            a2_x = stats["a2_x"] or 0.0
            curr_mod = e_xx * const - a2_x * const * const

            if ftr_phase is not None and ftr_phase > 1:
                # Fast-Track-Resistance exit (phase > 1): optimal when Q_AFG == 0
                _r_min, q_afg = _ftr_terms(
                    curr_mod, float(stats["nv"]), stats["n_c2"] or 0.0,
                    1.0 / const,
                )
                stop = (q_afg == 0) or (step + 1 > 200)
            else:
                stop = (curr_mod - prev_mod) < thresh
            metrics = {
                "op": "louvain",
                "e_xx": e_xx,
                "a2_x": a2_x,
                "curr_mod": curr_mod,
                "prev_mod": prev_mod,
                "gain": curr_mod - prev_mod,
            }
            if stop:
                pending.extend([cinfo, bestinfo])
                break

        # --- gain of the single best candidate + move decision -------------
        # gain (`utilityClusteringFunctions.cpp:226-259`) evaluated only on
        # the winner; the >0 filter commutes with the argmax because gain
        # is a strictly monotone transform of the score used to pick it.
        # Singleton-swap protection compares the target to the CURRENT
        # COMMUNITY id (maxIndex > sc, `:254-256`), not the vertex id.
        # The decision is INLINE over bestinfo (one when(), no assign⋈best
        # self-join): every gathered vertex flows straight through to the
        # committed output, so the observed subtree can never be pruned.
        # With the old left join, a runtime-empty move set — EVERY
        # iteration of an instantly-converged coarse phase — made AQE's
        # empty-relation propagation rewrite new_assign to its left side,
        # silently dropping both CollectMetrics observations and costing a
        # fallback stats job per iteration.
        moved = (
            bestinfo.withColumn("cand", F.col("b.cand"))
            .withColumn("eix", F.col("w_own") - F.col("selfloop"))
            .withColumn("ax", F.col("cdeg_cur") - F.col("deg"))
            .withColumn(
                "gain",
                2.0 * (F.col("b.wsum") - F.col("eix"))
                - 2.0 * F.col("deg") * (F.col("b.ay") - F.col("ax")) * F.lit(const),
            )
            .withColumn(
                "blocked",
                (F.col("b.csize_cand") == 1)
                & (F.col("csize_cur") == 1)
                & (F.col("cand") > F.col("comm")),
            )
        )
        # NULL-safe by construction: a masked argmax (cand == comm) or a
        # null gain falls to the otherwise() branch, i.e. "stay"
        move_ok = (
            F.col("cand").isNotNull()
            & (F.col("cand") != F.col("comm"))
            & (F.col("gain") > 0)
            & ~F.col("blocked")
        )
        if sample_fraction is not None and sample_fraction < 1.0:
            # seeded per-iteration sampling: non-sampled vertices keep comm
            # (`parallelLouvainMethodApprox.cpp:139-155` — a coin flip per
            # vertex per iteration). Default stream is xxhash64; the
            # "mult" stream is a Knuth multiplicative hash expressible in
            # ANSI SQL, so the sampled kernel itself is value-oracle-able.
            if sample_hash == "mult":
                sampled = (
                    (F.col("v") * F.lit(2654435761) + F.lit(seed + step)) % 100
                    < int(sample_fraction * 100)
                )
            else:
                sampled = (
                    F.xxhash64(F.col("v"), F.lit(seed + step)) % 100
                    < int(sample_fraction * 100)
                )
            move_ok = move_ok & sampled

        decided = moved.select(
            "v",
            F.when(move_ok, F.col("cand")).otherwise(F.col("comm")).alias("comm"),
        )
        # vertices with no gather rows — isolated, or outside the active
        # set under early termination — keep their community. When this
        # branch is runtime-empty, AQE prunes only the union arm; the
        # decided side (and its observations) always executes.
        new_assign = decided.unionByName(
            assign.join(bestinfo.select("v"), "v", "left_anti")
        )

        if fuse_stats:
            # materialize FIRST — the single action of the iteration; it
            # fires the observed metrics — then read them and decide the
            # stop. Cut iterations commit through the runner (parquet,
            # bounded plan tree); chained iterations persist + count (no
            # parquet round-trip — the dominant per-iteration cost on the
            # forced-distributed path).
            do_cut = (
                lineage_cut_every <= 1 or (step + 1) % lineage_cut_every == 0
            )
            if do_cut:
                committed = runner.commit(step, new_assign, {"op": "louvain"})
                for df_ in retired:
                    df_.unpersist()
                retired = pending + [cinfo, bestinfo]
                pending = []
            else:
                # localCheckpoint: materializes the iteration (firing the
                # observed metrics) and truncates the plan to a LogicalRDD
                # leaf — no parquet round-trip, and no cache whose later
                # unpersist would recompile dependents. The blocks are
                # executor-local scratch; every Nth iteration still commits
                # via the runner so converged state is parquet-backed.
                committed = new_assign.localCheckpoint(eager=True)
                runner.history.append({"op": "louvain", "step": step})
                # cinfo/bestinfo stay persisted until the next commit
                # retires them — the fallback stats recompute reads them
                pending.extend([cinfo, bestinfo])
            m_cur = read_observation(obs_cur)
            m_cinfo = read_observation(obs_cinfo)
            if m_cur is not None and m_cinfo is not None:
                e_xx = m_cur["e_xx"] or 0.0
                a2_x = m_cinfo["a2_x"] or 0.0
            else:
                # Belt-and-braces: since new_assign is derived FROM
                # bestinfo, AQE's empty-relation propagation can no longer
                # prune the CollectMetrics nodes (the old assign⋈best left
                # join lost both observations whenever the move set went
                # runtime-empty). Kept for edge-degenerate plans (e.g. an
                # all-isolated graph whose gather is empty): recompute
                # directly — bestinfo/cinfo are persisted, so this is one
                # cheap agg.
                row = (
                    bestinfo.agg(F.sum("w_own").alias("e_xx"))
                    .crossJoin(
                        cinfo.agg(
                            F.sum(F.col("cdeg") * F.col("cdeg")).alias("a2_x")
                        )
                    )
                    .collect()[0]
                )
                e_xx = row["e_xx"] or 0.0
                a2_x = row["a2_x"] or 0.0
            curr_mod = e_xx * const - a2_x * const * const
            runner.history[-1].update(
                e_xx=e_xx, a2_x=a2_x, curr_mod=curr_mod, prev_mod=prev_mod,
                gain=curr_mod - prev_mod,
            )
            if (curr_mod - prev_mod) < thresh:
                # stats are of the PRE-move assignment: return prev_assign
                # (the previous iteration's result), exactly as the
                # two-action flow would have before making this move
                break
            prev_mod = curr_mod if curr_mod > lower else lower
            prev_assign = assign
            hist2 = hist1
            hist1 = assign
            assign = committed
            continue

        prev_mod = curr_mod if curr_mod > lower else lower
        prev_assign = assign
        hist2 = hist1
        hist1 = assign
        # chain a few supersteps between parquet cuts (the plan is a short
        # linear chain over persisted temporaries) — halves the per-
        # iteration job count; with a run_dir every superstep still commits
        # durably so resume finds per-superstep state
        do_cut = (
            run_dir is not None
            or lineage_cut_every <= 1
            or (step + 1) % lineage_cut_every == 0
        )
        if do_cut:
            assign = runner.commit(
                step, new_assign, dict(metrics, prev_mod=prev_mod)
            )
            # one-commit lag: items retired at the PREVIOUS commit are now
            # certainly out of every live plan (assign is parquet-backed)
            for df_ in retired:
                df_.unpersist()
            retired = pending
            pending = []
        else:
            runner.history.append(dict(metrics, prev_mod=prev_mod, step=step))
            # localCheckpoint, not persist: materializes once (the next
            # iteration's plan consumes this assignment 4-6 times) AND
            # truncates the plan to a leaf — persist-chaining nests
            # InMemoryRelations whose plans grow multiplicatively and whose
            # unpersist recompiles dependents (measured OOM/storms)
            assign = new_assign.localCheckpoint(eager=True)
        pending.extend([cinfo, bestinfo])

    # NO final result cut: prev_assign is already a truncated leaf — the
    # init cut, an iteration's runner.commit parquet, or a chained
    # localCheckpoint — so re-writing it was a pure extra job per phase
    # (measured ~1s x phases on the forced-distributed multiphase). The
    # only uncut case is a tiny coarse phase's skipped init cut, whose
    # plan is a cheap projection over the coarse-edge parquet.
    # promote_result (a rename, no job) moves a commit-rotation-backed
    # assignment into the long-lived result window — without it, a LATER
    # kernel run's commits rotate this run's file out from under the
    # caller (FAILED_READ_FILE on collect; caught by
    # test_kernel_result_survives_later_runs).
    for df_ in retired + pending:
        df_.unpersist()
    edges.unpersist()
    vdeg_full.unpersist()
    # fallback_cut=True: if a future refactor hands a DERIVED plan (or a
    # localCheckpoint-backed frame) to this point, the rename fast path
    # silently not applying must degrade to an explicit result cut, not
    # to a rotation-lifetime FAILED_READ_FILE (matches coloring/labelprop).
    prev_assign = promote_result(prev_assign, fallback_cut=True)
    return LouvainPhaseResult(
        assignment=prev_assign.select("v", "comm"),
        modularity=prev_mod,
        iterations=num_itrs,
        two_m=two_m,
        num_vertices=nv_seen,
    )
