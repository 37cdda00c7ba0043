"""Distance-1 graph coloring + colored (Gauss-Seidel) Louvain sweeps.

Three operators from the reference's Coloring/ module, re-expressed as
iterative DataFrame rounds:

1. ``distance_one_coloring`` — speculative greedy coloring
   (Gebremedhin-Manne; reference `Coloring/coloringDistanceOne.cpp:50-233`):
   rounds of {propose first-fit color vs finalized neighbors; detect
   same-color conflicts among this round's proposals; loser requeued}.
   The reference breaks conflicts by thread-random values; we use
   ``xxhash64(v, seed)`` so the whole coloring is deterministic.

2. ``multihash_coloring`` — Jones-Plassmann/Luby adaptation
   (`Coloring/coloringMultiHashMaxMin.cpp:60-228`): per (round, hash) an
   uncolored vertex that is the local max of the hash among uncolored
   neighbors takes color ``2*(round*nhash+ih)``, a local min takes ``+1``;
   leftovers after ``nrounds`` get the max color (incomplete coloring).

3. ``louvain_one_phase_colored`` — one Louvain level processed one color
   class at a time (`Coloring/parallelLouvainWithColoring.cpp:158-218`):
   vertices in a class are pairwise non-adjacent, so within-class moves are
   conflict-free and community state is refreshed between classes —
   Gauss-Seidel convergence with deterministic parallelism, the heuristic
   the north_star names. Modularity is recomputed by a full edge scan after
   each sweep (`:230-246`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from grappolo_spark.graph import Graph
from grappolo_spark.operators.louvain import LouvainPhaseResult
from grappolo_spark.plans.iteration import (
    cut_lineage,
    promote_result,
    read_observation,
)

_MEX = """
aggregate(
  sort_array(array_distinct(filter({arr}, x -> x >= 0))),
  0,
  (acc, x) -> CASE WHEN x = acc THEN acc + 1 ELSE acc END
)
"""


def distance_one_coloring(
    g: Graph,
    seed: int = 12345,
    max_rounds: int = 100,
    rand_df: DataFrame | None = None,
) -> DataFrame:
    """Return (v, color) with no two adjacent vertices sharing a color.

    ``rand_df`` (optional ``(v, rand double)``): conflict tie-break values.
    By default the tie-break is a deterministic xxhash64 stream; passing
    ``functions.rngstream.rngstream_fill(spark, nv, n_threads)`` (i→v)
    reproduces the REFERENCE's tie-break ordering bit-for-bit — the
    `randValues[v] < randValues[w] || (== && v < w)` rule of
    `coloringDistanceOne.cpp:370-371` over the exact vector its
    `generateRandomNumbers()` fills at ``n_threads`` OpenMP threads.
    """
    pairs = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not g.deduped:
        # raw Graph(edges=...) may carry duplicate pairs; canonical graphs
        # skip this exchange (rows unique by construction)
        pairs = pairs.distinct()
    pairs = pairs.persist()
    colors = g.vertex_ids().select("v", F.lit(None).cast("int").alias("color"))
    colors = cut_lineage(colors, tag="coloring")
    # optional reference-parity tie-break values, keyed for both edge ends
    k_src = k_dst = None
    if rand_df is not None:
        keys = rand_df.select("v", F.col("rand").alias("tiebreak")).persist()
        # coverage guard: the conflict resolution INNER-joins the tie-break
        # table, so a conflicting vertex missing from rand_df would silently
        # drop its conflict row and let both endpoints keep the same color —
        # an invalid coloring. rngstream_fill keys by dense index 0..size-1,
        # which need not cover sparse vertex ids; fail fast instead.
        missing = (
            g.vertex_ids().join(keys, "v", "left_anti").limit(1).count()
        )
        if missing:
            raise ValueError(
                "rand_df must provide a tie-break value for every vertex id "
                "(vertex ids found with no rand_df row; rngstream_fill is "
                "keyed by dense index 0..size-1 — densify ids first)"
            )
        k_src = keys.select(F.col("v").alias("src"), F.col("tiebreak").alias("t_src"))
        k_dst = keys.select(F.col("v").alias("dst"), F.col("tiebreak").alias("t_dst"))

    # the pending count rides each round's cut-materializing job as an
    # observed metric (one job per round instead of two); only round 1
    # pays a dedicated count against the init cut
    n_pending = None
    for _ in range(max_rounds):
        if n_pending is None:
            n_pending = colors.filter(F.col("color").isNull()).count()
        if n_pending == 0:
            break
        pending = colors.filter(F.col("color").isNull()).select("v")
        # propose: first-fit against finalized neighbor colors
        nbr_colors = (
            pairs.join(
                colors.filter(F.col("color").isNotNull()).select(
                    F.col("v").alias("dst"), F.col("color").alias("ncolor")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("v"))
            .agg(F.collect_set("ncolor").alias("ncolors"))
        )
        proposals = (
            pending.join(nbr_colors, "v", "left")
            .select(
                "v",
                F.expr(_MEX.format(arr="coalesce(ncolors, array())"))
                .cast("int")
                .alias("proposal"),
            )
        )
        # conflicts among this round's proposals: same color across an edge;
        # loser = smaller (hash, id) — deterministic stand-in for the
        # reference's random tie-break (`coloringUtils.cpp:70-96`)
        p_src = proposals.select(
            F.col("v").alias("src"), F.col("proposal").alias("p_src")
        )
        p_dst = proposals.select(
            F.col("v").alias("dst"), F.col("proposal").alias("p_dst")
        )
        conflicts = (
            pairs.join(p_src, "src")
            .join(p_dst, "dst")
            .filter(F.col("p_src") == F.col("p_dst"))
        )
        if k_src is not None:
            # reference rule (`coloringDistanceOne.cpp:370-371`): the
            # smaller (rand, id) end of a conflicting edge loses
            loser_cond = F.struct(
                F.col("t_src").alias("h"), F.col("src").alias("i")
            ) < F.struct(F.col("t_dst").alias("h"), F.col("dst").alias("i"))
            conflicts = conflicts.join(k_src, "src").join(k_dst, "dst")
        else:
            loser_cond = F.struct(
                F.xxhash64(F.col("src"), F.lit(seed)).alias("h"),
                F.col("src").alias("i"),
            ) < F.struct(
                F.xxhash64(F.col("dst"), F.lit(seed)).alias("h"),
                F.col("dst").alias("i"),
            )
        losers = (
            conflicts.filter(loser_cond)
            .select(F.col("src").alias("v"))
            .distinct()
        )
        winners = proposals.join(losers, "v", "left_anti")
        colors = (
            colors.join(winners, "v", "left")
            .select("v", F.coalesce("color", "proposal").alias("color"))
        )
        obs = Observation()
        colors = colors.observe(
            obs, F.sum(F.col("color").isNull().cast("long")).alias("pending")
        )
        colors = cut_lineage(colors, tag="coloring")
        m = read_observation(obs)
        n_pending = m["pending"] if m is not None else None
    if k_src is not None:
        keys.unpersist()
    return colors


def multihash_coloring(
    g: Graph, nhash: int = 2, nrounds: int = 4, seed: int = 999
) -> DataFrame:
    """Bounded-palette JP coloring; may leave a shared overflow color."""
    pairs = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not g.deduped:
        # raw Graph(edges=...) may carry duplicate pairs; canonical graphs
        # skip this exchange (rows unique by construction)
        pairs = pairs.distinct()
    pairs = pairs.persist()
    colors = g.vertex_ids().select("v", F.lit(None).cast("int").alias("color"))
    colors = cut_lineage(colors, tag="coloring_mh")
    max_color = 2 * nhash * nrounds

    done = False
    for itr in range(nrounds):
        if done:
            break
        for ih in range(nhash):
            unc = colors.filter(F.col("color").isNull()).select("v")
            if unc.count() == 0:
                done = True  # fully colored: stop ALL rounds, not just this one
                break
            h = lambda c: F.xxhash64(c, F.lit(seed + ih))  # noqa: E731
            u_src = unc.select(F.col("v").alias("src"))
            u_dst = unc.select(F.col("v").alias("dst"))
            live = pairs.join(u_src, "src").join(u_dst, "dst")
            ext = (
                live.groupBy("src")
                .agg(
                    F.max(h(F.col("dst"))).alias("nmax"),
                    F.min(h(F.col("dst"))).alias("nmin"),
                )
            )
            newc = (
                unc.join(ext, unc.v == ext.src, "left")
                .select(
                    "v",
                    F.when(
                        F.col("nmax").isNull() | (h(F.col("v")) > F.col("nmax")),
                        F.lit(2 * (itr * nhash + ih)),
                    )
                    .when(
                        h(F.col("v")) < F.col("nmin"),
                        F.lit(2 * (itr * nhash + ih) + 1),
                    )
                    .alias("newcolor"),
                )
            )
            colors = (
                colors.join(newc, "v", "left")
                .select("v", F.coalesce("color", "newcolor").alias("color"))
            )
            colors = cut_lineage(colors, tag="coloring_mh")
    # leftovers share the max color (incomplete — as in the reference)
    return colors.select(
        "v", F.coalesce("color", F.lit(max_color)).cast("int").alias("color")
    )


def verify_coloring(g: Graph, colors: DataFrame) -> int:
    """#conflicting edges (reference self-check `coloringDistanceOne.cpp:206-226`)."""
    c_src = colors.select(F.col("v").alias("src"), F.col("color").alias("c1"))
    c_dst = colors.select(F.col("v").alias("dst"), F.col("color").alias("c2"))
    return (
        g.edges.filter(F.col("src") != F.col("dst"))
        .join(c_src, "src")
        .join(c_dst, "dst")
        .filter(F.col("c1") == F.col("c2"))
        .count()
    )


def color_histogram(colors: DataFrame) -> DataFrame:
    """Color-class sizes (reference ``buildColorSize``,
    `Coloring/equitableColoringDistanceOne.cpp:48-56`)."""
    return colors.groupBy("color").agg(F.count(F.lit(1)).alias("size"))


def select_coloring_algo(g: Graph, num_colors_cap: int = 1024) -> str:
    """Pick the scale-safe coloring for a colored-Louvain sweep.

    A greedy distance-one coloring uses at most ``max_degree + 1`` colors,
    and each color is a sequential driver-coordinated sub-sweep — on a hub
    graph (max degree in the thousands/millions) the exact chromatic sweep
    degenerates into thousands of sequential jobs per iteration. When the
    degree bound says the palette could exceed ``num_colors_cap``, switch
    to the multihash (Jones-Plassmann) coloring whose palette is fixed at
    ``2*nhash*nrounds + 1`` regardless of degree. One cheap max-degree
    aggregate decides — BEFORE paying for a full distance-one coloring.
    """
    maxdeg = (
        g.edges.filter(F.col("src") != F.col("dst"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
        or 0
    )
    return "multihash" if maxdeg + 1 > num_colors_cap else "distance_one"


def _class_best_moves(counter, state0, cinfo_cand, const: float):
    """Winner + gain/swap-protection filter for ONE color class.

    Shared by the distributed and small-state paths — identical column
    expressions keep the two paths bit-identical on integer-weight graphs
    (all sums are exact, so aggregation order cannot split them).
    Single-pass best candidate + own-community weight, same shape as the
    plain kernel: the argmax orders by the reduced score
    ``wsum − deg·a_y·const`` (eix/ax shift every candidate's gain
    equally), so ONE groupBy(v) yields the winner AND w_own; the gain
    formula and the swap protection (vs the CURRENT COMMUNITY id,
    maxIndex > sc, `utilityClusteringFunctions.cpp:254-256`) run only on
    the O(movers) winners.

    ``state0=None``/``cinfo_cand=None`` means the caller PRE-ENRICHED the
    counter (it already carries comm/deg/selfloop/cdeg_cur/csize_cur and
    ay/csize_cand — the small-state path attaches them in the gather so a
    class job broadcasts TWO LocalRelations instead of four and skips the
    post-aggregation joins entirely); all expressions from ``is_own`` on
    are char-identical on both shapes, and the forced-distributed
    equivalence test pins the bit parity.
    """
    enriched = counter
    if state0 is not None:
        enriched = enriched.join(state0, "v")
    if cinfo_cand is not None:
        enriched = enriched.join(cinfo_cand, "cand")
    bestinfo = (
        enriched.withColumn("is_own", F.col("cand") == F.col("comm"))
        .withColumn(
            "score",
            F.col("wsum") - F.col("deg") * F.col("ay") * F.lit(const),
        )
        .groupBy("v")
        .agg(
            F.min_by(
                F.struct("cand", "wsum", "ay", "csize_cand"),
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
            F.first("comm").alias("comm"),
            F.first("deg").alias("deg"),
            F.first("selfloop").alias("selfloop"),
            F.first("cdeg_cur").alias("cdeg_cur"),
            F.first("csize_cur").alias("csize_cur"),
        )
    )
    return (
        bestinfo.withColumn("cand", F.col("b.cand"))
        .filter(
            F.col("cand").isNotNull() & (F.col("cand") != F.col("comm"))
        )
        .withColumn("eix", F.col("w_own") - F.col("selfloop"))
        .withColumn("ax", F.col("cdeg_cur") - F.col("deg"))
        .withColumn(
            "gain",
            2.0 * (F.col("b.wsum") - F.col("eix"))
            - 2.0 * F.col("deg") * (F.col("b.ay") - F.col("ax"))
            * F.lit(const),
        )
        .filter(F.col("gain") > 0)
        .select(
            "v",
            "cand",
            (
                (F.col("b.csize_cand") == 1)
                & (F.col("csize_cur") == 1)
                & (F.col("cand") > F.col("comm"))
            ).alias("blocked"),
        )
    )


# state rows at or below this bound run the colored sweep with driver-held
# community state (numpy) — the gather/argmax stays in Spark, only the O(V)
# sides cross the boundary per class
_SMALL_STATE_MAX = 100_000


def _xxh64_long_np(x, seed: int):
    """Vectorized XXH64 of an 8-byte little-endian value (Spark's
    ``xxhash64`` over one LongType column) — bit-exact mirror of
    ``tests/xxh64_oracle.py``'s n=8 path, in uint64 numpy (all arithmetic
    wraps mod 2^64 exactly like the reference implementation)."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def rotl(v, r):
        r = np.uint64(r)
        return (v << r) | (v >> (np.uint64(64) - r))

    def fmix(h):
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
        return h

    x = x.astype(np.uint64)
    h = np.uint64(seed & ((1 << 64) - 1)) + P5 + np.uint64(8)
    k = rotl(x * P2, 31) * P1
    h = np.broadcast_to(h, x.shape).copy()
    h ^= k
    h = rotl(h, 27) * P1 + P4
    return fmix(h)


def _xxh64_int_lit_np(lit: int, seed_arr):
    """Fold a 4-byte IntegerType literal into per-element running hashes —
    the second step of ``F.xxhash64(long_col, F.lit(small_int))``."""
    import numpy as np

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def rotl(v, r):
        r = np.uint64(r)
        return (v << r) | (v >> (np.uint64(64) - r))

    def fmix(h):
        h ^= h >> np.uint64(33)
        h *= P2
        h ^= h >> np.uint64(29)
        h *= P3
        h ^= h >> np.uint64(32)
        return h

    h = seed_arr + P5 + np.uint64(4)
    # the literal's P1 multiple is computed in python ints (numpy SCALAR
    # uint64 arithmetic warns on overflow; array ops wrap silently)
    lit_p1 = np.uint64(
        ((lit & 0xFFFFFFFF) * 0x9E3779B185EBCA87) & ((1 << 64) - 1)
    )
    h = h ^ lit_p1
    h = rotl(h, 23) * P2 + P3
    return fmix(h)


def _multihash_colors_np(ids, s_idx, d_idx, nhash=2, nrounds=4, seed=999):
    """Numpy replay of :func:`multihash_coloring` for driver-held graphs:
    identical colors (the hash is the bit-exact Spark ``xxhash64`` of the
    vertex id long with the 4-byte ``seed + ih`` literal folded in, and
    the local-max/min rule is evaluated in the same signed order).

    ``ids``: sorted vertex ids (all edge endpoints); ``s_idx``/``d_idx``:
    NON-SELF edge endpoint positions into ids (both directions present,
    duplicates harmless). Returns an int32 color array over ids; vertices
    never claimed by a round keep the shared overflow color, exactly like
    the Spark loop's trailing coalesce."""
    import numpy as np

    from grappolo_spark.operators.louvain import _first_group_starts

    assert 0 <= seed and seed + nhash < (1 << 31), "numpy path needs int lits"
    n = len(ids)
    base = _xxh64_long_np(ids, 42)
    hashes = [
        _xxh64_int_lit_np(seed + ih, base).view(np.int64) for ih in range(nhash)
    ]
    # sort the edge lists by source ONCE so each sub-round's neighbor
    # max/min reduce with ``reduceat`` over contiguous runs (a masked
    # subset of a sorted array stays sorted) — the unbuffered
    # ``np.maximum.at`` costs ~100-200ms per call at 1M edges, and the
    # loop makes 2*nhash*nrounds of them
    order = np.argsort(s_idx, kind="stable")
    ss = s_idx[order]
    dd = d_idx[order]
    color = np.full(n, -1, dtype=np.int32)
    max_color = 2 * nhash * nrounds
    i64 = np.iinfo(np.int64)
    done = False
    for itr in range(nrounds):
        if done:
            break
        for ih in range(nhash):
            unc = color < 0
            if not unc.any():
                done = True
                break
            h = hashes[ih]
            live = unc[ss] & unc[dd]
            lu, lv = ss[live], dd[live]
            has = np.zeros(n, dtype=bool)
            has[lu] = True
            nmax = np.full(n, i64.min, dtype=np.int64)
            nmin = np.full(n, i64.max, dtype=np.int64)
            if len(lu):
                starts = _first_group_starts(lu)
                srcs = lu[starts]
                hv = h[lv]
                nmax[srcs] = np.maximum.reduceat(hv, starts)
                nmin[srcs] = np.minimum.reduceat(hv, starts)
            even = unc & (~has | (h > nmax))
            odd = unc & has & (h < nmin)
            color[even] = 2 * (itr * nhash + ih)
            color[odd] = 2 * (itr * nhash + ih) + 1
    color[color < 0] = max_color
    return color


# edge-row bound for holding a (src, dst, weight) copy on the driver in
# small-state mode: ~4M rows ≈ 100 MB of numpy — the per-iteration
# modularity e_xx then reduces in numpy instead of one full-scan Spark job
# per iteration (the class jobs, the heavy side, stay in Spark)
_SMALL_EDGES_MAX = 4_000_000

# test hook: force the Spark class-job route even when the driver edge
# copy would allow the exact numpy class sweep
_NP_CLASS_SWEEP = True

# state-row bound for the mid-regime BROADCAST class-gather layout in the
# distributed colored loop (the plain kernel's broadcast_max_vertices
# analogue): above it a billion-row state must shuffle, never broadcast
_BCAST_STATE_MAX = 5_000_000


def _colored_small_state(
    spark, edges, pdf, classes, const, two_m, thresh, lower, max_iters,
    edges_np=None, eidx=None,
):
    """Colored Gauss-Seidel sweeps with driver-held community state.

    Same per-class semantics as the distributed loop below — the gather
    (edges ⋈ movers ⋈ assignment → groupBy(v, cand)) and the winner/gain
    logic (:func:`_class_best_moves`) run IN SPARK over the persisted edge
    table, so the heavy side never moves; only O(V) LocalRelations (movers,
    assignment, per-community info computed in numpy — integer-exact, so
    bit-equal to the distributed aggregation) are broadcast in, and only
    the class's winner set (≤ movers rows) is collected out. This replaces
    the per-class parquet cut of the full state — the dominant fixed cost
    of a colored sweep at small |V| — with one lean collect per class;
    empty classes are skipped outright (the driver knows the histogram).
    The distributed path below is unchanged for large |V|: a billion-row
    state must never collect.
    """
    import numpy as np
    import pandas as pd

    vs = pdf["v"].to_numpy(np.int64)
    comm = pdf["comm"].to_numpy(np.int64).copy()
    deg = pdf["deg"].to_numpy(np.float64)
    selfloop = pdf["selfloop"].to_numpy(np.float64)
    color = pdf["color"].to_numpy()
    pos = {int(v): i for i, v in enumerate(vs)}

    # driver-held e_xx: map edge endpoints to state positions once; any
    # endpoint outside the state (a vertex the coloring missed) falls back
    # to the Spark scan — silent misindexing is never an option. ``eidx``
    # lets the numpy-coloring caller hand over the positions it already
    # computed (its pdf rows ARE the sorted id array), skipping the two
    # full-width searchsorted passes.
    si = di = ew = None
    if eidx is not None and edges_np is not None:
        si, di = eidx
        ew = edges_np[2]
    elif edges_np is not None and len(vs):
        es, ed, ew_ = edges_np
        order = np.argsort(vs)
        svs = vs[order]
        is_ = np.searchsorted(svs, es).clip(max=len(svs) - 1)
        id_ = np.searchsorted(svs, ed).clip(max=len(svs) - 1)
        if bool((svs[is_] == es).all()) and bool((svs[id_] == ed).all()):
            si, di, ew = order[is_], order[id_], ew_

    # full-numpy class sweep: with a valid driver edge copy AND
    # integer-valued weights every sum below (wsum per (v, cand), cdeg,
    # e_xx) is exact regardless of aggregation order, so the numpy replay
    # of the class job is bit-identical to the Spark plan — the same
    # exactness argument as the plain kernel's driver tail, now covering
    # the gather/argmax too. Real-valued weights keep the Spark class jobs
    # (their sums are order-sensitive, and the Spark plan is the contract).
    np_sweep = (
        _NP_CLASS_SWEEP
        and si is not None
        and float(np.abs(ew).sum()) < float(2**53)
        and bool((ew == np.rint(ew)).all())
    )
    from grappolo_spark.operators.louvain import _first_group_starts

    class_edges = None
    if np_sweep:
        # pre-partition the edge arrays by the src's color ONCE (colors
        # are static through the sweep): each class gather then touches
        # only its own slice instead of paying four full-width masked
        # gathers per class per iteration
        csrc = color[si]
        csort = np.argsort(csrc, kind="stable")
        csrc_sorted = csrc[csort]
        class_edges = {}
        for cls in classes:
            lo = np.searchsorted(csrc_sorted, cls, side="left")
            hi = np.searchsorted(csrc_sorted, cls, side="right")
            idx = csort[lo:hi]
            class_edges[int(cls)] = (si[idx], di[idx], ew[idx])

    prev_mod = -1.0
    prev_comm = comm.copy()
    num_itrs = 0
    for it in range(max_iters):
        num_itrs = it + 1
        for cls in classes:
            if np_sweep:
                # numpy replay of the class job (edges ⋈ class state ⋈
                # dst state → groupBy(v, cand) → _class_best_moves):
                # identical expressions, snapshot-at-class-start info,
                # moves applied after the class, exactly like the collect
                # loop below. Pinned vs the Spark route by
                # test_colored_class_sweep_numpy_matches_spark. A class
                # with no out-edges gathers nothing (the Spark inner join
                # would be empty) and is skipped outright.
                vg_e, di_c, ew_c = class_edges[int(cls)]
                if not len(vg_e):
                    continue
                cu, inv = np.unique(comm, return_inverse=True)
                cdeg = np.bincount(inv, weights=deg)
                csize = np.bincount(inv).astype(np.int64)
                ci_e = inv[di_c]
                key = vg_e * np.int64(len(cu)) + ci_e
                uk, uinv = np.unique(key, return_inverse=True)
                wsum = np.bincount(uinv, weights=ew_c)
                vg = uk // len(cu)
                ci = uk % len(cu)
                cand = cu[ci]
                ay = cdeg[ci]
                comm_v = comm[vg]
                is_own = cand == comm_v
                # score/ns replicate the min_by key: own community sinks
                # to +inf, ties on the score break to the SMALLER cand
                score = wsum - deg[vg] * ay * const
                ns = np.where(is_own, np.inf, -score)
                order = np.lexsort((cand, ns, vg))
                win = order[_first_group_starts(vg[order])]
                w_own = np.zeros(len(vs), dtype=np.float64)
                own_rows = np.flatnonzero(is_own)
                w_own[vg[own_rows]] = wsum[own_rows]
                wv = vg[win]
                keep = cand[win] != comm[wv]
                win = win[keep]
                wv = wv[keep]
                eix = w_own[wv] - selfloop[wv]
                ax = cdeg[inv[wv]] - deg[wv]
                gain = (
                    2.0 * (wsum[win] - eix)
                    - 2.0 * deg[wv] * (ay[win] - ax) * const
                )
                blocked = (
                    (csize[ci[win]] == 1)
                    & (csize[inv[wv]] == 1)
                    & (cand[win] > comm[wv])
                )
                apply_m = (gain > 0) & ~blocked
                comm[wv[apply_m]] = cand[win][apply_m]
                continue
            mask = color == cls
            if not mask.any():
                continue
            cu, inv = np.unique(comm, return_inverse=True)
            cdeg = np.bincount(inv, weights=deg)
            csize = np.bincount(inv).astype(np.int64)
            # TWO broadcast LocalRelations per class (was four: movers /
            # a_dst / state0 / cinfo_cand). The mover state doubles as the
            # src filter (inner join on src == mover v), and the dst side
            # carries its community's (ay, csize_cand) inline, so the
            # per-(v, cand) aggregation below can lift every per-v and
            # per-cand constant via first() — no post-aggregation joins,
            # roughly half the plan nodes per sequential class job (the
            # class-job cost at small |V| is driver plan-compile, not data).
            state_src = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "src": vs[mask],
                        "comm": comm[mask],
                        "deg": deg[mask],
                        "selfloop": selfloop[mask],
                        "cdeg_cur": cdeg[inv[mask]],
                        "csize_cur": csize[inv[mask]],
                    }
                ),
                "src long, comm long, deg double, selfloop double, "
                "cdeg_cur double, csize_cur long",
            )
            dst_enr = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "dst": vs,
                        "cand": comm,
                        "ay": cdeg[inv],
                        "csize_cand": csize[inv],
                    }
                ),
                "dst long, cand long, ay double, csize_cand long",
            )
            counter = (
                edges.join(F.broadcast(state_src), "src")
                .join(F.broadcast(dst_enr), "dst")
                .groupBy(F.col("src").alias("v"), F.col("cand"))
                .agg(
                    F.sum("weight").alias("wsum"),
                    F.first("ay").alias("ay"),
                    F.first("csize_cand").alias("csize_cand"),
                    F.first("comm").alias("comm"),
                    F.first("deg").alias("deg"),
                    F.first("selfloop").alias("selfloop"),
                    F.first("cdeg_cur").alias("cdeg_cur"),
                    F.first("csize_cur").alias("csize_cur"),
                )
            )
            best = _class_best_moves(counter, None, None, const)
            for r in best.collect():
                if not r["blocked"]:
                    comm[pos[r["v"]]] = r["cand"]

        # full-scan modularity after the sweep: e_xx from the edge table
        # (same expression as the distributed loop), a2_x in numpy
        # (integer-exact sum of squared community degrees). With a
        # driver-held edge copy (si/di set) the e_xx reduction is one numpy
        # mask-sum — exact for integer-valued weights, the same argument
        # that puts a2_x in numpy — instead of a Spark job per iteration.
        if si is not None:
            e_xx = float(ew[comm[si] == comm[di]].sum()) if len(ew) else 0.0
        else:
            a_src = spark.createDataFrame(
                pd.DataFrame({"src": vs, "cs": comm}), "src long, cs long"
            )
            a_dst2 = spark.createDataFrame(
                pd.DataFrame({"dst": vs, "cd": comm}), "dst long, cd long"
            )
            e_xx = (
                edges.join(F.broadcast(a_src), "src")
                .join(F.broadcast(a_dst2), "dst")
                .filter(F.col("cs") == F.col("cd"))
                .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("e_xx"))
                .collect()[0]["e_xx"]
            )
        cu, inv = np.unique(comm, return_inverse=True)
        cdeg = np.bincount(inv, weights=deg)
        a2_x = float((cdeg * cdeg).sum())
        curr_mod = e_xx * const - a2_x * const * const
        if (curr_mod - prev_mod) < thresh:
            break
        prev_mod = curr_mod if curr_mod > lower else lower
        prev_comm = comm.copy()

    out = spark.createDataFrame(
        pd.DataFrame({"v": vs, "comm": prev_comm}), "v long, comm long"
    )
    return LouvainPhaseResult(
        assignment=out,
        modularity=prev_mod,
        iterations=num_itrs,
        two_m=two_m,
        # exact driver mirror (only when the whole sweep ran in numpy over
        # a complete driver edge copy): lets the multiphase driver finish
        # renumber/coarsen/tail/fold without another Spark job
        local_np=(vs, prev_comm, si, di, ew) if np_sweep else None,
    )


def louvain_one_phase_colored(
    g: Graph,
    thresh: float = 0.01,
    lower: float = -1.0,
    max_iters: int = 100,
    num_colors_cap: int = 1024,
    coloring_algo: str = "auto",
    colors: DataFrame | None = None,
    run_dir: str | None = None,
    nv_hint: int | None = None,
    edges_np_hint: tuple | None = None,
) -> LouvainPhaseResult:
    """One Louvain level, sweeping color classes sequentially.

    ``nv_hint`` (the caller's vertex count, free from the coloring gate in
    the multiphase driver) picks the edge layout upfront: at or below
    ``_SMALL_STATE_MAX`` the sweep will take the driver-held-state path
    whose gather broadcasts both O(V) sides, so the layout that matters is
    the AGGREGATION key ``src`` (zero exchange per class job) and a few
    fat partitions beat ``spark.sql.shuffle.partitions`` near-empty tasks
    — the same reasoning as the plain kernel's broadcast gather. Without a
    hint, or above the bound, the distributed loop's shuffle-join key
    ``dst`` is kept.

    Same gain/tie-break/swap math as the plain kernel; community info is
    refreshed after each color class, so vertices in later classes see
    earlier classes' moves within the same iteration (Gauss-Seidel).

    ``coloring_algo="multihash"`` bounds the palette a priori (the
    Jones-Plassmann variant emits at most ``2*nhash*nrounds + 1`` colors
    regardless of degree), so an iteration runs a FIXED number of
    driver-coordinated sub-sweeps even on hub graphs — the scale choice
    when the exact chromatic sweep of ``distance_one`` would mean
    thousands of sequential classes. Its shared overflow color may contain
    adjacent vertices; that class's sub-sweep is then Jacobi (simultaneous
    moves against current state — the plain kernel's semantics), exactly
    like the ``num_colors_cap`` overflow merge below. The default
    ``"auto"`` makes that choice from the max degree
    (:func:`select_coloring_algo`) so hub graphs get the bounded palette
    WITHOUT the caller having to know — the cap stops being merely a
    post-hoc merge and becomes the plan choice.
    """
    spark = g.edges.sparkSession
    # ``colors`` injects a precomputed (v, color) partition — e.g. the
    # natural 2-coloring of a bipartite graph, or an externally balanced
    # palette. It must be PROPER except possibly in its last class (an
    # improper class's sub-sweep degrades to Jacobi semantics, same as the
    # overflow merge below). With an injected coloring the sweep order is
    # fully deterministic and SQL-expressible, which is how the driver
    # value-oracles one colored Gauss-Seidel iteration.
    small_hint = nv_hint is not None and nv_hint <= _SMALL_STATE_MAX
    # mid regime (100k < |V| <= 5M): the state is too big to hold on the
    # driver but fine to BROADCAST per class job — the same src-keyed
    # broadcast-gather layout the plain kernel and LPA run (r5), so the
    # per-class counter aggregates in place with zero exchanges instead of
    # shuffling O(E_class) gathered rows every sub-sweep
    bcast_hint = (
        nv_hint is not None and not small_hint and nv_hint <= _BCAST_STATE_MAX
    )
    gather_key = "src" if (small_hint or bcast_hint) else "dst"
    if small_hint:
        # partition count follows the INPUT's layout, not a constant:
        # small state does not imply small edges (a 16k-vertex phase-1
        # graph can carry millions of rows — 4 fat partitions left most
        # cores idle in every sequential class job), while a tiny coarse
        # parquet stays at its few file splits
        npart = max(
            4,
            min(
                int(spark.conf.get("spark.sql.shuffle.partitions")),
                g.edges.rdd.getNumPartitions(),
            ),
        )
        edges = g.edges.repartition(npart, gather_key).persist()
    else:
        edges = g.edges.repartition(gather_key).persist()
    vdeg = g.degrees().select("v", "deg").persist()
    # driver-held edge copy for small graphs, probe-collected straight off
    # the CALLER's table (limit caps the transfer): reused by the coloring
    # (numpy multihash), the state build, the numpy class sweep and the
    # per-iteration e_xx reduction — and under the bound 2m and the row
    # count come from it too, so the dedicated stats agg job disappears
    # (2m via numpy sum: exact for the engine's integer-valued weights,
    # the same argument as the rest of the small-state path). The gather
    # cache above stays LAZY: on the full-numpy route (numpy coloring +
    # exact numpy class sweep) no action ever touches it, so the
    # repartition+persist never runs at all.
    edges_np = None
    row0 = None
    hint_ids = None
    if small_hint and edges_np_hint is not None:
        # the multiphase driver already probe-collected this exact table
        # for its coloring gate (and derived nv from it) — reuse the
        # arrays (and the sorted endpoint ids, if carried) instead of a
        # second full transfer
        edges_np = edges_np_hint[:3]
        hint_ids = edges_np_hint[3] if len(edges_np_hint) > 3 else None
        two_m = float(edges_np[2].sum())
        n_edge_rows = len(edges_np[0])
    elif small_hint:
        import numpy as np

        epdf = (
            g.edges.select("src", "dst", "weight")
            .limit(_SMALL_EDGES_MAX + 1)
            .toPandas()
        )
        if len(epdf) <= _SMALL_EDGES_MAX:
            edges_np = (
                epdf["src"].to_numpy(np.int64),
                epdf["dst"].to_numpy(np.int64),
                epdf["weight"].to_numpy(np.float64),
            )
            two_m = float(edges_np[2].sum())
            n_edge_rows = len(epdf)
        del epdf
    if edges_np is None:
        row0 = edges.agg(
            F.sum("weight").alias("tw"), F.count(F.lit(1)).alias("ne")
        ).collect()[0]
        two_m = row0["tw"] or 0.0
        n_edge_rows = row0["ne"] or 0
    if two_m == 0.0:
        empty = spark.createDataFrame([], "v long, comm long")
        return LouvainPhaseResult(empty, 0.0, 0)
    const = 1.0 / two_m

    colors_np = None  # (ids array, int32 colors) when colored in numpy
    ids = None
    if colors is None and edges_np is not None and g.vertices is None:
        # numpy coloring path: zero Spark jobs for the whole palette —
        # the multihash hash is the bit-exact Spark xxhash64 replay
        # (pinned by test_multihash_numpy_matches_spark), so the colors,
        # the class list and every later move are identical
        import numpy as np

        es, ed, _ = edges_np
        ids = (
            hint_ids
            if hint_ids is not None
            else np.unique(np.concatenate([es, ed]))
        )
        if len(ids) > _SMALL_STATE_MAX:
            # nv_hint undersold the vertex count (public caller): fall
            # back to the probed Spark path rather than trust the hint
            ids = None
    if colors is None and edges_np is not None and g.vertices is None and ids is not None:
        s_idx = np.searchsorted(ids, es)
        d_idx = np.searchsorted(ids, ed)
        nonself = s_idx != d_idx
        if coloring_algo == "auto":
            # select_coloring_algo's max NON-SELF out-degree, in numpy
            maxdeg = (
                int(np.bincount(s_idx[nonself], minlength=len(ids)).max())
                if nonself.any()
                else 0
            )
            coloring_algo = (
                "multihash" if maxdeg + 1 > num_colors_cap else "distance_one"
            )
        if coloring_algo == "multihash":
            colors_np = (
                ids,
                _multihash_colors_np(ids, s_idx[nonself], d_idx[nonself]),
            )
    if colors is None and colors_np is None:
        if coloring_algo == "auto":
            coloring_algo = select_coloring_algo(g, num_colors_cap)
        if coloring_algo == "multihash":
            colors = multihash_coloring(g)
        else:
            colors = distance_one_coloring(g)

    if colors_np is not None:
        import numpy as np

        all_colors = [int(c) for c in np.unique(colors_np[1])]
    else:
        all_colors = [
            r.color
            for r in colors.select("color").distinct().orderBy("color").collect()
        ]
    if len(all_colors) > num_colors_cap:
        # hub graphs can exceed the palette cap (reference bounds colors by
        # MaxDegree, `runMultiPhaseColoring.cpp:68-87`); rather than freeze
        # the overflow vertices, merge all colors past the cap into ONE
        # final class — within it vertices may be adjacent, so that
        # sub-sweep is Jacobi (simultaneous moves vs the current state,
        # exactly the plain kernel's semantics); every vertex stays eligible
        overflow_from = all_colors[num_colors_cap - 1]
        if colors_np is not None:
            import numpy as np

            cvals = colors_np[1].copy()
            cvals[cvals >= overflow_from] = overflow_from
            colors_np = (colors_np[0], cvals)
        else:
            colors = colors.select(
                "v",
                F.when(F.col("color") >= overflow_from, F.lit(overflow_from))
                .otherwise(F.col("color"))
                .cast("int")
                .alias("color"),
            )
        classes = all_colors[: num_colors_cap - 1] + [overflow_from]
    else:
        classes = all_colors

    selfw = (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("v"))
        .agg(F.sum("weight").alias("selfloop"))
    )

    if colors_np is not None:
        # state built driver-side from the one edge collect: degrees and
        # self-loop weights via bincount (exact for integer-valued
        # weights; real weights may differ from the Spark sum order in
        # the last ulp — the documented small-path caveat), colors
        # attached positionally. No probe, no state join jobs.
        import numpy as np
        import pandas as pd

        es, ed, ew = edges_np
        ids, cvals = colors_np
        # s_idx/d_idx survive from the coloring block above (same ids)
        deg_np = np.bincount(s_idx, weights=ew, minlength=len(ids))
        sl_mask = es == ed
        self_np = np.bincount(
            s_idx[sl_mask], weights=ew[sl_mask], minlength=len(ids)
        )
        probe = pd.DataFrame(
            {
                "v": ids,
                "comm": ids,
                "deg": deg_np,
                "selfloop": self_np,
                "color": cvals,
            }
        )
        vdeg.unpersist()
        # the small-state sweep's class jobs are exchange-free (src-
        # partitioned cache + broadcast LocalRelations), so adaptive
        # re-planning is pure per-job driver latency here — same gate as
        # multiphase._aqe_off_for_small, keyed on the actual state size
        from grappolo_spark.operators.multiphase import _aqe_off_for_small

        with _aqe_off_for_small(spark, len(probe), threshold=_SMALL_STATE_MAX):
            res = _colored_small_state(
                spark, edges, probe, classes, const, two_m, thresh, lower,
                max_iters, edges_np=edges_np, eidx=(s_idx, d_idx),
            )
        edges.unpersist()
        return res

    # one combined per-vertex state table: (v, comm, deg, selfloop, color)
    state = (
        vdeg.join(selfw, "v", "left")
        .join(colors, "v")
        .select(
            "v",
            F.col("v").alias("comm"),
            "deg",
            F.coalesce("selfloop", F.lit(0.0)).alias("selfloop"),
            "color",
        )
    )
    # bounded probe: at or below _SMALL_STATE_MAX rows the whole sweep runs
    # with driver-held state (per-class parquet cuts replaced by lean
    # winner collects — see _colored_small_state); the limit stops the
    # scan early on big graphs, so the probe costs one truncated read
    probe = state.limit(_SMALL_STATE_MAX + 1).toPandas()
    if len(probe) <= _SMALL_STATE_MAX:
        vdeg.unpersist()
        if edges_np is None and n_edge_rows <= _SMALL_EDGES_MAX:
            import numpy as np

            epdf = edges.select("src", "dst", "weight").toPandas()
            edges_np = (
                epdf["src"].to_numpy(np.int64),
                epdf["dst"].to_numpy(np.int64),
                epdf["weight"].to_numpy(np.float64),
            )
        # the small-state sweep's class jobs are exchange-free (src-
        # partitioned cache + broadcast LocalRelations), so adaptive
        # re-planning is pure per-job driver latency here — same gate as
        # multiphase._aqe_off_for_small, keyed on the actual state size
        from grappolo_spark.operators.multiphase import _aqe_off_for_small

        with _aqe_off_for_small(spark, len(probe), threshold=_SMALL_STATE_MAX):
            res = _colored_small_state(
                spark, edges, probe, classes, const, two_m, thresh, lower,
                max_iters, edges_np=edges_np,
            )
        edges.unpersist()
        return res
    # distributed branch (>100k state rows): bucket the per-class state
    # cuts by v, so the gather's a_dst join and the winner-application
    # join read the O(V) state pre-partitioned each sub-sweep (same trade
    # as the plain kernel's bucketed commits; one exchange at write time)
    _nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    state = cut_lineage(state, tag="colored_state", bucket_by="v", n_buckets=_nb)

    prev_mod = -1.0
    prev_assign = state.select("v", "comm")
    num_itrs = 0

    for it in range(max_iters):
        num_itrs = it + 1
        for cls in classes:
            cinfo = state.groupBy("comm").agg(
                F.sum("deg").alias("cdeg"), F.count(F.lit(1)).alias("csize")
            )
            movers = state.filter(F.col("color") == cls)
            if bcast_hint:
                # src-keyed broadcast gather (mid regime): both O(V) sides
                # broadcast pre-enriched — the SAME counter/agg shape as
                # the small-state class job (whose bit parity vs this
                # loop's shuffle shape is already pinned), so the
                # per-class aggregation runs in place over the
                # src-partitioned cache with zero exchanges and
                # _class_best_moves needs no post-aggregation joins.
                # Measured at 11.7M edges / 160k vertices (adjacent warm
                # pairs): 85.4/87.6 vs 92.7/89.6 shuffle — a consistent
                # but modest win; the per-class floor there is the
                # sequential O(V) state machinery itself. A color-tagged
                # sortWithinPartitions cache (batch-stats scan pruning)
                # measured NEUTRAL at that size and was reverted, as was
                # a per-class localCheckpoint (pathological: chained
                # checkpoints re-materialize through the non-adaptive
                # path — the r2 finding, compounded per class).
                state_src = movers.join(
                    cinfo.select(
                        "comm",
                        F.col("cdeg").alias("cdeg_cur"),
                        F.col("csize").alias("csize_cur"),
                    ),
                    "comm",
                ).select(
                    F.col("v").alias("src"), "comm", "deg", "selfloop",
                    "cdeg_cur", "csize_cur",
                )
                dst_enr = state.join(cinfo, "comm").select(
                    F.col("v").alias("dst"),
                    F.col("comm").alias("cand"),
                    F.col("cdeg").alias("ay"),
                    F.col("csize").alias("csize_cand"),
                )
                counter = (
                    edges.join(F.broadcast(state_src), "src")
                    .join(F.broadcast(dst_enr), "dst")
                    .groupBy(F.col("src").alias("v"), F.col("cand"))
                    .agg(
                        F.sum("weight").alias("wsum"),
                        F.first("ay").alias("ay"),
                        F.first("csize_cand").alias("csize_cand"),
                        F.first("comm").alias("comm"),
                        F.first("deg").alias("deg"),
                        F.first("selfloop").alias("selfloop"),
                        F.first("cdeg_cur").alias("cdeg_cur"),
                        F.first("csize_cur").alias("csize_cur"),
                    )
                )
                best = _class_best_moves(counter, None, None, const)
            else:
                a_dst = state.select(
                    F.col("v").alias("dst"), F.col("comm").alias("comm_dst")
                )
                counter = (
                    edges.join(
                        movers.select(F.col("v").alias("src")), "src"
                    )
                    .join(a_dst, "dst")
                    .groupBy(
                        F.col("src").alias("v"),
                        F.col("comm_dst").alias("cand"),
                    )
                    .agg(F.sum("weight").alias("wsum"))
                )
                state0 = movers.join(
                    cinfo.select(
                        "comm",
                        F.col("cdeg").alias("cdeg_cur"),
                        F.col("csize").alias("csize_cur"),
                    ),
                    "comm",
                ).select(
                    "v", "comm", "deg", "selfloop", "cdeg_cur", "csize_cur"
                )
                cinfo_cand = cinfo.select(
                    F.col("comm").alias("cand"),
                    F.col("cdeg").alias("ay"),
                    F.col("csize").alias("csize_cand"),
                )
                best = _class_best_moves(counter, state0, cinfo_cand, const)
            state = (
                state.join(best, "v", "left")
                .select(
                    "v",
                    F.when(
                        F.col("cand").isNotNull() & ~F.col("blocked"), F.col("cand")
                    )
                    .otherwise(F.col("comm"))
                    .alias("comm"),
                    "deg", "selfloop", "color",
                )
            )
            state = cut_lineage(
                state, tag="colored_state", bucket_by="v", n_buckets=_nb
            )
        assign = state.select("v", "comm")

        # full-scan modularity after the sweep (`parallelLouvainWithColoring.cpp:230-246`)
        # — one combined action: e_xx and a2_x cross-joined scalar aggs
        a_src = assign.select(F.col("v").alias("src"), F.col("comm").alias("cs"))
        a_dst = assign.select(F.col("v").alias("dst"), F.col("comm").alias("cd"))
        exx_df = (
            edges.join(a_src, "src").join(a_dst, "dst")
            .filter(F.col("cs") == F.col("cd"))
            .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("e_xx"))
        )
        a2_df = (
            assign.join(vdeg, "v").groupBy("comm").agg(F.sum("deg").alias("cdeg"))
            .agg(F.coalesce(F.sum(F.col("cdeg") * F.col("cdeg")), F.lit(0.0)).alias("a2_x"))
        )
        stats = exx_df.crossJoin(a2_df).collect()[0]
        curr_mod = stats["e_xx"] * const - stats["a2_x"] * const * const
        if (curr_mod - prev_mod) < thresh:
            break
        prev_mod = curr_mod if curr_mod > lower else lower
        # re-cut to a dedicated tag: prev_assign must outlive a whole sweep
        # (len(classes) colored_state cuts) without being GC'd
        prev_assign = cut_lineage(assign, tag="colored_prev", keep_last=2)

    edges.unpersist()
    vdeg.unpersist()
    # colored_prev-backed state (keep_last=2!) is renamed into the result
    # window; the zero-iteration projection over colored_state falls back
    # to a real cut — either way the caller's files outlive later runs
    prev_assign = promote_result(prev_assign, fallback_cut=True)
    return LouvainPhaseResult(
        assignment=prev_assign.select("v", "comm"),
        modularity=prev_mod,
        iterations=num_itrs,
        two_m=two_m,
    )


def equitable_rebalance(
    g: Graph,
    colors: DataFrame,
    num_colors: int,
    strategy: str = "first_fit",
    max_rounds: int = 20,
    seed: int = 321,
) -> DataFrame:
    """Rebalance color classes toward ~NV/num_colors vertices each.

    Reference ``equitableDistanceOneColorBased``
    (`Coloring/equitableColoringDistanceOne.cpp:90-253`) + the vBase
    redistribution variants (`Coloring/vBase.cpp:6-169`): vertices in
    over-full classes move to a permissible (conflict-free) under-full
    class — smallest such color for ``first_fit``, least-populated for
    ``least_used``. Rounds repeat until balanced or no move is possible;
    cross-move conflicts are resolved with the same deterministic hash rule
    as distance_one_coloring.
    """
    import math

    pairs = g.edges.filter(F.col("src") != F.col("dst")).select("src", "dst")
    if not g.deduped:
        # raw Graph(edges=...) may carry duplicate pairs; canonical graphs
        # skip this exchange (rows unique by construction)
        pairs = pairs.distinct()
    pairs = pairs.persist()
    nv = colors.count()
    cap = math.ceil(nv / num_colors)
    colors = cut_lineage(colors, tag="equitable")

    for _ in range(max_rounds):
        spark = colors.sparkSession
        # ONE action per round for the balance decision: the histogram is
        # at most palette-sized, so collect it and split over/under on the
        # driver (was two isEmpty actions re-evaluating the sizes plan)
        counts = {
            r["color"]: r["s"]
            for r in colors.groupBy("color")
            .agg(F.count(F.lit(1)).alias("s"))
            .collect()
        }
        over_rows = [
            (c, counts.get(c, 0))
            for c in range(num_colors)
            if counts.get(c, 0) > cap
        ]
        under_rows = [
            (c, counts.get(c, 0))
            for c in range(num_colors)
            if counts.get(c, 0) < cap
        ]
        if not over_rows or not under_rows:
            break
        over = spark.createDataFrame(over_rows, "color int, size long")
        under = spark.createDataFrame(under_rows, "ucolor int, size long")
        # movable: excess vertices of over-full classes (largest ids move,
        # a deterministic stand-in for the reference's arbitrary thread order)
        ranked = colors.join(over, "color").select(
            "v",
            "color",
            F.row_number()
            .over(Window.partitionBy("color").orderBy(F.desc("v")))
            .alias("rn"),
            (F.col("size") - F.lit(cap)).alias("excess"),
        )
        movable = ranked.filter(F.col("rn") <= F.col("excess")).select("v")
        # forbidden colors per movable vertex = neighbor colors
        nbrc = (
            pairs.join(movable.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(
                colors.select(F.col("v").alias("dst"), F.col("color").alias("nc")),
                "dst",
            )
            .select(F.col("src").alias("v"), "nc")
            .distinct()
        )
        cand = (
            movable.crossJoin(under.select("ucolor", "size"))
            .join(
                nbrc,
                (movable.v == nbrc.v) & (F.col("ucolor") == F.col("nc")),
                "left_anti",
            )
        )
        if strategy == "least_used":
            w = Window.partitionBy("v").orderBy(F.asc("size"), F.asc("ucolor"))
        else:
            w = Window.partitionBy("v").orderBy(F.asc("ucolor"))
        picks = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("v", F.col("ucolor").alias("newcolor"))
        )
        # adjacent movers choosing the same class: loser (smaller hash,id) reverts
        p_src = picks.select(F.col("v").alias("src"), F.col("newcolor").alias("cs"))
        p_dst = picks.select(F.col("v").alias("dst"), F.col("newcolor").alias("cd"))
        losers = (
            pairs.join(p_src, "src")
            .join(p_dst, "dst")
            .filter(F.col("cs") == F.col("cd"))
            .filter(
                F.struct(F.xxhash64("src", F.lit(seed)).alias("h"), F.col("src").alias("i"))
                < F.struct(F.xxhash64("dst", F.lit(seed)).alias("h"), F.col("dst").alias("i"))
            )
            .select(F.col("src").alias("v"))
            .distinct()
        )
        winners = picks.join(losers, "v", "left_anti")
        # the applied-move count rides the cut's materializing job as an
        # observed metric — the old ``picks.isEmpty()`` gate re-evaluated
        # the whole window+cross-join picks plan a second time every
        # round. Breaking on zero APPLIED moves covers the old gate
        # (picks empty => winners empty) plus the all-losers corner, in
        # both of which the colors are unchanged — identical output, one
        # plan evaluation per round instead of two.
        joined = colors.join(winners, "v", "left")
        obs = Observation()
        joined = joined.observe(
            obs,
            F.sum(F.col("newcolor").isNotNull().cast("long")).alias("moved"),
        )
        colors = cut_lineage(
            joined.select(
                "v", F.coalesce("newcolor", "color").cast("int").alias("color")
            ),
            tag="equitable",
        )
        m = read_observation(obs)
        moved = m["moved"] if m is not None else None
        if moved is None:
            moved = winners.count()  # pruned observation: one cheap agg
        if moved == 0:
            break
    pairs.unpersist()
    return colors
