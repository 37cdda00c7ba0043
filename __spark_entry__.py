"""Driver contract for the spark-graft builder (PySpark target).

Graph queries run over two edge tables derived deterministically from the
TPC-H-ish testdata (so DuckDB can build the identical graph for the oracle):

- **cs graph**  — customer–supplier bipartite graph: edge (c_custkey,
  1000000 + l_suppkey) with weight = #lineitems, symmetrized. Dense-ish.
- **parts graph** — part co-occurrence: parts linked when they appear in ≥2
  common orders, weight 1. Sparse, multiple components, has triangles.

Every queries() entry has a value-level DuckDB oracle except the iterative
community detection (louvain) and hash-sketch ops (minhash/simhash — xxhash64
has no DuckDB equivalent); those get rows-only checks here and value-level
pytest oracles in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph

SF_DEFAULT = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# graph builders (Spark side)
# ---------------------------------------------------------------------------


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def build_cs_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Customer–supplier bipartite graph (suppliers offset by 1,000,000)."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    raw = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return Graph.from_edgelist(raw)


def build_parts_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Part co-occurrence graph: parts sharing >= 2 orders, weight 1."""
    li = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.withColumnRenamed("l_partkey", "u")
    b = li.withColumnRenamed("l_partkey", "v")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    # no weight column: canonical_edges fills weight=1.0 and the Graph
    # carries unweighted=True, so the iterative operators take their
    # narrow count-aggregated gathers (exactly equal results)
    return Graph.from_edgelist(pairs)


def _nation_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(v, comm): customers -> c_nationkey, suppliers -> 25 + s_nationkey."""
    cust = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("v"),
        F.col("c_nationkey").cast("long").alias("comm"),
    )
    supp = _read(spark, sf_dir, "supplier").select(
        (F.lit(1_000_000) + F.col("s_suppkey")).cast("long").alias("v"),
        (F.lit(25) + F.col("s_nationkey")).cast("long").alias("comm"),
    )
    return cust.unionByName(supp)


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB side — must mirror the builders exactly)
# ---------------------------------------------------------------------------

CS_EDGES_CTE = """
cs_raw AS (
  SELECT o.o_custkey AS src,
         1000000 + l.l_suppkey AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
cs_edges AS (
  SELECT src, dst, weight FROM cs_raw
  UNION ALL
  SELECT dst AS src, src AS dst, weight FROM cs_raw
)
"""

PARTS_EDGES_CTE = """
lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pp AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
parts_edges AS (
  SELECT u AS src, v AS dst, CAST(1.0 AS DOUBLE) AS weight FROM pp
  UNION ALL
  SELECT v, u, CAST(1.0 AS DOUBLE) FROM pp
)
"""

NATION_ASSIGN_CTE = """
assign AS (
  SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_nationkey AS BIGINT) AS comm
  FROM customer
  UNION ALL
  SELECT CAST(1000000 + s_suppkey AS BIGINT), CAST(25 + s_nationkey AS BIGINT)
  FROM supplier
)
"""

TOKEN_RE_SQL = "[A-Za-z0-9_]+"
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_EN = "\\b(the|and|is|of|to|in|that|it|was|for)\\b"
_DE = "\\b(der|die|und|das|ist|nicht|ein|mit|auf|zu)\\b"
_FR = "\\b(le|la|et|les|des|est|pas|une|dans|que)\\b"
_ES = "\\b(el|la|que|los|una|por|con|para|del|es)\\b"


def _materialize_ctes(sql: str) -> str:
    """Rewrite every ``name AS (`` CTE head to ``name AS MATERIALIZED (``.

    The unrolled superstep oracles reference each sweep's CTEs several
    times; DuckDB inlines CTEs by default, re-evaluating the whole prefix
    per reference — measured 201s -> 0.5s on the 3-sweep early-terminate
    oracle at sf0.01. Results are identical; only evaluation strategy
    changes. Only safe for non-recursive CTE chains (all builders below).
    """
    import re

    return re.sub(r"\b(\w+) AS \(", r"\1 AS MATERIALIZED (", sql)


def _pagerank_sql(iters: int = 10, alpha: float = 0.85) -> str:
    parts = [
        CS_EDGES_CTE.strip().rstrip(),
        "verts AS (SELECT DISTINCT src AS v FROM cs_edges)",
        "wout AS (SELECT src AS v, sum(weight) AS wo FROM cs_edges GROUP BY 1)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "pr0 AS (SELECT v, (SELECT 1.0 / n FROM nn) AS rank FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"""pr{i + 1} AS (
  SELECT t.v,
         (SELECT (1.0 - {alpha}) / n FROM nn)
           + {alpha} * COALESCE(c.contrib, 0.0) AS rank
  FROM verts t LEFT JOIN (
    SELECT e.dst AS v, sum(p.rank * e.weight / o.wo) AS contrib
    FROM cs_edges e
    JOIN pr{i} p ON e.src = p.v
    JOIN wout o ON o.v = e.src
    GROUP BY e.dst
  ) c ON c.v = t.v
)"""
        )
    return _materialize_ctes(
        "WITH " + ",\n".join(parts) + f"\nSELECT v, round(rank, 6) AS rank FROM pr{iters}"
    )


def _louvain_sweeps_sql(
    iters: int = 2,
    sample: tuple | None = None,
    early_term_from: int | None = None,
    mover_preds: list | None = None,
) -> str:
    """Unrolled-SQL oracle for ``iters`` Jacobi sweeps of the Louvain
    kernel from the all-singleton start over the cs graph (no self-loops,
    integer count weights — every intermediate double is bit-identical
    between engines: sums of integers are exact, and each rounded product
    is a single identically-ordered multiply). Mirrors the kernel exactly:
    gather, community info, reduced-score argmax with (score desc, cand
    asc) tie-break, gain>0 filter on the winner, singleton-swap
    protection vs the CURRENT community id, Jacobi update.

    ``sample=(seed, pct)`` reproduces the Approx kernel's per-iteration
    move sampling with the ``"mult"`` hash stream
    (`parallelLouvainMethodApprox.cpp:139-155`): a winner only moves when
    ``(v*2654435761 + seed + k) % 100 < pct``. ``early_term_from=k``
    reproduces the early-terminate kernel's active set from sweep k on:
    only vertices whose community changed within the last two sweeps
    gather and move (`parallelLouvianMethodEarlyTerminate.cpp:114,192`).
    ``mover_preds`` (one SQL predicate on ``e2.src`` per sweep, or None
    for all vertices) restricts each sweep's movers to one color class —
    the colored Gauss-Seidel schedule of
    `Coloring/parallelLouvainWithColoring.cpp:158-218`, where community
    state refreshes between classes so later classes see earlier moves."""
    parts = [
        CS_EDGES_CTE.strip(),
        "deg AS (SELECT src AS v, sum(weight) AS deg FROM cs_edges GROUP BY 1)",
        "twom AS (SELECT sum(weight) AS m2 FROM cs_edges)",
        "a0 AS (SELECT v, v AS comm FROM deg)",
    ]
    for k in range(iters):
        if early_term_from is not None and k >= early_term_from:
            # active set: NOT stable over the last two sweeps
            counter_src = f"""(
    SELECT e2.src, e2.dst, e2.weight FROM cs_edges e2
    JOIN a{k} s2 ON s2.v = e2.src
    JOIN a{k - 1} s1 ON s1.v = e2.src
    JOIN a{k - 2} s0 ON s0.v = e2.src
    WHERE NOT (s2.comm = s1.comm AND s1.comm = s0.comm)
  )"""
        elif mover_preds is not None and mover_preds[k] is not None:
            counter_src = (
                f"(SELECT e2.src, e2.dst, e2.weight FROM cs_edges e2 "
                f"WHERE {mover_preds[k]})"
            )
        else:
            counter_src = "cs_edges"
        parts.append(
            f"""cinfo{k} AS (
  SELECT a.comm, sum(d.deg) AS cdeg, count(*) AS csize
  FROM a{k} a JOIN deg d ON d.v = a.v GROUP BY a.comm
),
counter{k} AS (
  SELECT e.src AS v, a.comm AS cand, sum(e.weight) AS wsum
  FROM {counter_src} e JOIN a{k} a ON a.v = e.dst
  GROUP BY 1, 2
),
wown{k} AS (
  SELECT c.v, sum(c.wsum) AS w_own
  FROM counter{k} c JOIN a{k} a ON a.v = c.v AND a.comm = c.cand
  GROUP BY c.v
),
best{k} AS (
  SELECT v, cand FROM (
    SELECT c.v, c.cand,
           row_number() OVER (
             PARTITION BY c.v
             ORDER BY c.wsum - dv.deg * cc.cdeg * (1.0 / (SELECT m2 FROM twom)) DESC,
                      c.cand ASC
           ) AS rn,
           2.0 * (c.wsum - COALESCE(w.w_own, 0.0))
             - 2.0 * dv.deg * (cc.cdeg - (cu.cdeg - dv.deg))
               * (1.0 / (SELECT m2 FROM twom)) AS gain,
           (cc.csize = 1 AND cu.csize = 1 AND c.cand > av.comm) AS blocked
    FROM counter{k} c
    JOIN a{k} av ON av.v = c.v
    JOIN deg dv ON dv.v = c.v
    JOIN cinfo{k} cc ON cc.comm = c.cand
    JOIN cinfo{k} cu ON cu.comm = av.comm
    LEFT JOIN wown{k} w ON w.v = c.v
    WHERE c.cand <> av.comm
  ) WHERE rn = 1 AND gain > 0 AND NOT blocked{
      f" AND (v * 2654435761 + {sample[0] + k}) % 100 < {sample[1]}"
      if sample is not None else ""}
),
a{k + 1} AS (
  SELECT a.v, CAST(COALESCE(b.cand, a.comm) AS BIGINT) AS comm
  FROM a{k} a LEFT JOIN best{k} b ON b.v = a.v
)"""
        )
    return _materialize_ctes(
        "WITH " + ",\n".join(parts) + f"\nSELECT v, comm FROM a{iters}"
    )


def _lpa_sql(iters: int = 3) -> str:
    parts = [
        PARTS_EDGES_CTE.strip(),
        "l0 AS (SELECT DISTINCT src AS v, src AS label FROM parts_edges)",
    ]
    for i in range(iters):
        parts.append(
            f"""l{i + 1} AS (
  SELECT prev.v, COALESCE(b.label, prev.label) AS label
  FROM l{i} prev LEFT JOIN (
    SELECT v, label FROM (
      SELECT f.v, f.label,
             row_number() OVER (PARTITION BY f.v ORDER BY f.w DESC, f.label ASC) AS rn
      FROM (
        SELECT e.src AS v, p.label, sum(e.weight) AS w
        FROM parts_edges e JOIN l{i} p ON e.dst = p.v
        GROUP BY 1, 2
      ) f
    ) WHERE rn = 1
  ) b ON b.v = prev.v
)"""
        )
    return _materialize_ctes(
        "WITH " + ",\n".join(parts) + f"\nSELECT v, label FROM l{iters}"
    )


def _rngstream_sql(size: int = 1200, n_threads: int = 4) -> str:
    """Recursive-CTE oracle for the MRG32k3a reference-parity vector.

    DuckDB steps the PUBLISHED per-draw recurrence itself in exact BIGINT
    arithmetic — the only Python-precomputed inputs are the per-thread
    stream start states (2^127-step jumps, infeasible in SQL; their
    correctness is pinned independently by
    tests/test_rngstream.py::test_jump_matrix_equals_sequential_recurrence
    and the published first-draw anchor)."""
    from grappolo_spark.functions.rngstream import static_chunks, stream_starts

    rows = []
    for (start, cnt), st in zip(
        static_chunks(size, n_threads), stream_starts(n_threads)
    ):
        cols = ", ".join(f"CAST({x} AS BIGINT)" for x in st)
        rows.append(f"({start}, {cnt}, {cols})")
    values = ",\n    ".join(rows)
    return f"""
WITH RECURSIVE seeds(cstart, clen, s0, s1, s2, s3, s4, s5) AS (
  VALUES
    {values}
), gen(cstart, clen, k, s0, s1, s2, s3, s4, s5, rand) AS (
  SELECT cstart, clen, CAST(0 AS BIGINT), s0, s1, s2, s3, s4, s5,
         CAST(NULL AS DOUBLE)
  FROM seeds
  UNION ALL
  SELECT cstart, clen, k + 1, s1, s2, p1, s4, s5, p2,
         CASE WHEN p1 > p2 THEN (p1 - p2) * (1.0 / 4294967088.0)
              ELSE (p1 - p2 + 4294967087) * (1.0 / 4294967088.0) END
  FROM (
    SELECT *,
      ((1403580 * s1 - 810728 * s0) % 4294967087 + 4294967087)
        % 4294967087 AS p1,
      ((527612 * s5 - 1370589 * s3) % 4294944443 + 4294944443)
        % 4294944443 AS p2
    FROM gen WHERE k < clen
  )
)
SELECT cstart + k - 1 AS i, rand FROM gen WHERE k > 0 ORDER BY i
"""


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-phase Louvain over the sf0.001 cs graph."""
    from grappolo_spark.operators.multiphase import louvain

    g = build_cs_graph(spark, SF_DEFAULT)
    res = louvain(g, max_phases=3)
    return res.assignment


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from grappolo_spark.functions import dedup as D
    from grappolo_spark.functions import similarity as S
    from grappolo_spark.functions import text as T
    from grappolo_spark.operators.components import connected_components
    from grappolo_spark.operators.compare import community_comparison, gini_coefficient
    from grappolo_spark.operators.labelprop import label_propagation
    from grappolo_spark.operators.louvain import modularity
    from grappolo_spark.operators.multiphase import coarsen, louvain
    from grappolo_spark.operators.pagerank import pagerank
    from grappolo_spark.operators.sparsify import edge_jaccard, sparsify_topk
    from grappolo_spark.operators.triangles import triangle_count
    from grappolo_spark.operators.vertex_following import vertex_following_map

    def q_cs_edges(spark, sf):
        return build_cs_graph(spark, sf).edges

    def q_degree_stats(spark, sf):
        return build_cs_graph(spark, sf).characteristics()

    def q_cc(spark, sf):
        return connected_components(build_parts_graph(spark, sf))

    def q_cc_distributed(spark, sf):
        # local_threshold=0 FORCES the star supersteps (the 100 TB plan):
        # the driver oracle then value-checks the distributed kernel, not
        # the small-graph union-find shortcut
        return connected_components(build_parts_graph(spark, sf), local_threshold=0)

    def q_pagerank(spark, sf):
        g = build_cs_graph(spark, sf)
        pr = pagerank(g, alpha=0.85, max_iters=10)
        return pr.select("v", F.round("rank", 6).alias("rank"))

    def q_lpa(spark, sf):
        g = build_parts_graph(spark, sf)
        return label_propagation(g, max_iters=3, stop_on_converge=False)

    def q_lpa_distributed(spark, sf):
        # forced distributed superstep path (local_threshold=0), same
        # unrolled-SQL oracle as label_propagation
        g = build_parts_graph(spark, sf)
        return label_propagation(
            g, max_iters=3, stop_on_converge=False, local_threshold=0
        )

    def q_tri_total(spark, sf):
        return triangle_count(build_parts_graph(spark, sf))

    def q_tri_vertex(spark, sf):
        return triangle_count(build_parts_graph(spark, sf), per_vertex=True)

    def q_jaccard(spark, sf):
        return edge_jaccard(build_parts_graph(spark, sf))

    def q_sparsify(spark, sf):
        return sparsify_topk(build_parts_graph(spark, sf), alpha=0.5)

    def q_vf(spark, sf):
        return vertex_following_map(build_cs_graph(spark, sf))

    def q_coarsen(spark, sf):
        g = build_cs_graph(spark, sf)
        cg = coarsen(g, _nation_assign(spark, sf))
        return cg.edges.select("src", "dst", F.round("weight", 6).alias("weight"))

    def q_modularity(spark, sf):
        g = build_cs_graph(spark, sf)
        q = modularity(g.edges, _nation_assign(spark, sf), g.degrees())
        return spark.createDataFrame([(round(q, 6),)], "modularity double")

    def q_modularity_directed(spark, sf):
        # customer -> supplier arcs only (NOT symmetrized): the directed
        # kernel's accounting with constant 2/m over out-degrees
        li = _read(spark, sf, "lineitem")
        orders = _read(spark, sf, "orders")
        raw = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(
                F.col("o_custkey").alias("src"),
                (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
            )
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
        )
        g = Graph.from_edgelist(raw, directed=True)
        # shared nation labels on BOTH sides (no +25 offset) so intra-
        # community arcs exist and exercise the e_xx term
        cust = _read(spark, sf, "customer").select(
            F.col("c_custkey").cast("long").alias("v"),
            F.col("c_nationkey").cast("long").alias("comm"),
        )
        supp = _read(spark, sf, "supplier").select(
            (F.lit(1_000_000) + F.col("s_suppkey")).cast("long").alias("v"),
            F.col("s_nationkey").cast("long").alias("comm"),
        )
        q = modularity(
            g.edges, cust.unionByName(supp), g.degrees(), directed=True
        )
        return spark.createDataFrame([(round(q, 6),)], "modularity_dir double")

    def q_old2new(spark, sf):
        from grappolo_spark.sources.writers import build_old2new_map

        return build_old2new_map(_nation_assign(spark, sf))

    def q_smart_init(spark, sf):
        from grappolo_spark.operators.louvain import smart_init_assignment

        return smart_init_assignment(build_cs_graph(spark, sf))

    def q_corpus_edges(spark, sf):
        # end-to-end corpus front door (north_star): a deterministic
        # code-file table derived from documents (each doc = one python
        # file importing two arithmetically-chosen modules), pushed through
        # the REAL pipeline — Arrow-UDF link extraction with the sha256
        # per-row invariant enforced, module-resolution join, SNAP-style
        # densify, canonical symmetrize. The oracle rebuilds the same graph
        # in SQL with regexp extraction.
        from grappolo_spark.sources.corpus import build_graph_from_corpus

        docs = _read(spark, sf, "documents").select("doc_id")
        n = docs.count()
        corpus = docs.select(
            F.lit("org/corpus").alias("repo"),
            F.concat(
                F.lit("src/pkg_"), F.col("doc_id").cast("string"), F.lit("/mod.py")
            ).alias("path"),
            F.lit("c0").alias("commit"),
            F.lit("python").alias("lang"),
            F.concat(
                F.lit("# gen\n"),
                F.lit("import pkg_"),
                ((F.col("doc_id") * 7) % n).cast("string"),
                F.lit(".mod\n"),
                F.lit("import pkg_"),
                ((F.col("doc_id") * 13 + 1) % n).cast("string"),
                F.lit(".mod\n"),
            ).alias("content"),
        )
        _vm, g = build_graph_from_corpus(corpus)
        return g.edges.select("src", "dst", "weight")

    def q_compare(spark, sf):
        cust = _read(spark, sf, "customer")
        c1 = cust.select(
            F.col("c_custkey").cast("long").alias("v"),
            F.col("c_nationkey").cast("long").alias("comm"),
        )
        from pyspark.sql.window import Window

        seg_map = (
            cust.select("c_mktsegment").distinct()
            .select(
                "c_mktsegment",
                (F.dense_rank().over(Window.orderBy("c_mktsegment")) - 1)
                .cast("long")
                .alias("sid"),
            )
        )
        c2 = cust.join(F.broadcast(seg_map), "c_mktsegment").select(
            F.col("c_custkey").cast("long").alias("v"), F.col("sid").alias("comm")
        )
        m = community_comparison(c1, c2)
        return spark.createDataFrame(
            [
                (
                    m["n"],
                    float(m["same_same"]),
                    float(m["same_diff"]),
                    float(m["diff_same"]),
                    round(m["precision"], 6),
                    round(m["recall"], 6),
                    round(m["fscore"], 6),
                    round(m["mirkin"], 9),
                )
            ],
            "n long, same_same double, same_diff double, diff_same double, "
            "precision double, recall double, fscore double, mirkin double",
        )

    def q_gini(spark, sf):
        cust = _read(spark, sf, "customer").select(
            F.col("c_custkey").cast("long").alias("v"),
            F.col("c_nationkey").cast("long").alias("comm"),
        )
        return spark.createDataFrame(
            [(round(gini_coefficient(cust), 6),)], "gini double"
        )

    def q_louvain(spark, sf):  # rows-only check (iterative, non-SQL)
        g = build_cs_graph(spark, sf)
        return louvain(g, max_phases=3).assignment

    def q_louvain_sweeps(spark, sf):
        # VALUE-level oracle for the distributed Louvain kernel itself:
        # thresh=-1e9 disables the (data-dependent) convergence stop, so
        # the kernel runs a fixed number of Jacobi sweeps and returns the
        # assignment after exactly TWO moves — which the unrolled SQL
        # reproduces bit-for-bit (integer weights, identical fp op order)
        from grappolo_spark.operators.louvain import louvain_one_phase

        g = build_cs_graph(spark, sf)
        return louvain_one_phase(g, max_iters=3, thresh=-1e9).assignment

    def q_louvain_distributed(spark, sf):  # rows-only (iterative, non-SQL)
        # forces the DISTRIBUTED multiphase loop (gather/argmax supersteps,
        # coarsen, renumber) end-to-end — the driver-local numpy tail never
        # fires, so the scale path itself is what the driver smoke-checks
        g = build_cs_graph(spark, sf)
        return louvain(g, max_phases=3, local_threshold=0).assignment

    def q_louvain_sampled(spark, sf):
        # VALUE-level oracle for the SAMPLED (Approx) kernel: fixed sweeps
        # (thresh=-1e9), per-iteration move sampling on the "mult" hash
        # stream — ANSI-SQL-expressible, unlike xxhash64 — so the driver
        # checks the sampled move restriction itself, bit-for-bit
        from grappolo_spark.operators.louvain import louvain_one_phase

        g = build_cs_graph(spark, sf)
        return louvain_one_phase(
            g, max_iters=3, thresh=-1e9, sample_fraction=0.5,
            seed=12345, sample_hash="mult",
        ).assignment

    def q_louvain_early_term(spark, sf):
        # VALUE-level oracle for the early-terminate kernel: 3 fixed
        # sweeps, the third restricted to the active set (community
        # changed within the last two sweeps) — the unrolled SQL
        # reproduces the active-set gather exactly
        from grappolo_spark.operators.louvain import louvain_one_phase

        g = build_cs_graph(spark, sf)
        return louvain_one_phase(
            g, max_iters=4, thresh=-1e9, early_terminate=True
        ).assignment

    def q_louvain_colored_sweep(spark, sf):
        # VALUE-level oracle for ONE colored Gauss-Seidel iteration: the
        # cs graph is bipartite, so the natural 2-coloring (customers=0,
        # suppliers=1) is proper and SQL-expressible; the kernel sweeps
        # class 0 then class 1 with community state refreshed in between,
        # which the unrolled SQL mirrors class-by-class
        from grappolo_spark.operators.coloring import louvain_one_phase_colored

        g = build_cs_graph(spark, sf)
        colors = g.vertex_ids().select(
            "v", (F.col("v") >= 1_000_000).cast("int").alias("color")
        )
        return louvain_one_phase_colored(
            g, thresh=-1e9, max_iters=1, colors=colors
        ).assignment

    def q_louvain_colored_gs(spark, sf):  # rows-only (iterative, non-SQL)
        # forces the full colored multiphase driver end-to-end (coloring,
        # per-class sub-supersteps, coarsen) — the heuristic the
        # north-star names (`Coloring/parallelLouvainWithColoring.cpp`)
        # — in its SCALE configuration: bounded multihash palette (each
        # color class is a sequential driver-coordinated sub-sweep, so
        # the palette cap bounds jobs-per-iteration), colored phase(s)
        # while the graph is large, plain tail below min_graph_size
        # (`runMultiPhaseColoring.cpp:110-126`)
        g = build_cs_graph(spark, sf)
        return louvain(
            g, max_phases=3, coloring=True, min_graph_size=100,
            num_colors_cap=4, coloring_algo="multihash",
        ).assignment

    def q_ftr_metrics(spark, sf):
        # VALUE-level oracle for the Fast-Track-Resistance math (r_min,
        # Q_AFG — the FTR kernel's exit criterion) on a fixed partition
        from grappolo_spark.operators.louvain import ftr_metrics

        g = build_cs_graph(spark, sf)
        m = ftr_metrics(g.edges, _nation_assign(spark, sf), g.degrees())
        return spark.createDataFrame(
            [(
                round(m["modularity"], 6),
                round(m["r_min"], 9),
                # + 0.0 normalizes IEEE -0.0: Q_AFG(r_min) is ~0 by
                # construction, so rounding leaves a sign-noise zero
                round(m["q_afg"], 6) + 0.0,
                int(m["nv"]),
                int(m["n_c2"]),
            )],
            "modularity double, r_min double, q_afg double, nv long, n_c2 long",
        )

    def q_sessionize(spark, sf):
        # VALUE-level oracle for the stateful streaming sessionizer
        # (applyInPandasWithState, event-time timeout): run the REAL
        # stream over the events table (availableNow; far-future heartbeat
        # advances the watermark so timeouts flush every session), then
        # compare against the gaps-and-islands SQL. Timestamps go out as
        # microsecond offsets from 2024-01-01 so session-timezone
        # differences between engines cancel.
        import tempfile

        from grappolo_spark.streaming.sessions import sessionize

        events = (
            _read(spark, sf, "events")
            .filter(F.col("user_id") < 50)
            .select(
                "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
            )
        )
        root = tempfile.mkdtemp(prefix="grappolo-sess-")
        in_dir, out_dir, ck = f"{root}/ev", f"{root}/out", f"{root}/ck"
        events.write.mode("overwrite").parquet(in_dir)

        def run_once():
            stream = spark.readStream.schema(events.schema).parquet(in_dir)
            q = (
                sessionize(stream, gap_minutes=480, watermark="1 minute")
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        run_once()
        heartbeat = events.limit(1).select(
            F.lit(999_999).cast("long").alias("user_id"),
            (F.col("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
            F.lit(0.0).alias("value"),
        )
        heartbeat.write.mode("append").parquet(in_dir)
        run_once()
        run_once()  # a batchless pass lets remaining timeouts fire
        epoch0 = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
        return (
            spark.read.parquet(out_dir)
            .filter(F.col("user_id") != 999_999)
            .select(
                "user_id",
                (F.unix_micros("session_start") - epoch0).alias("start_us"),
                (F.unix_micros("session_end") - epoch0).alias("end_us"),
                "n_events",
                F.round("value_sum", 6).alias("value_sum"),
            )
        )

    def q_multimodal(spark, sf):
        # VALUE-level oracle for the multimodal decode path: the raw8
        # image/video histograms are pure integer math over the
        # deterministic synthesized payloads, so DuckDB recomputes the
        # EXACT feature values without ever touching binary — checking the
        # mapInPandas decode end-to-end (audio DSP stays pytest-oracled:
        # FFT isn't SQL-expressible)
        from grappolo_spark.functions.multimodal import (
            extract_features,
            synthesize_media,
        )

        media = synthesize_media(spark, n=60, seed=42)
        feats = extract_features(media).filter(F.col("kind") != "audio")
        return feats.select(
            "media_id",
            "kind",
            F.posexplode("feature").alias("bin", "share"),
        ).select(
            "media_id",
            "kind",
            F.col("bin").cast("long").alias("bin"),
            F.round(F.col("share").cast("double"), 6).alias("share"),
        )

    def q_coloring_valid(spark, sf):
        # validity oracle (`coloringDistanceOne.cpp:206-226` self-check):
        # the set of monochromatic edges of a distance-1 coloring must be
        # EMPTY — SQL-expressible as the empty relation, so the driver
        # value-checks the invariant itself
        from grappolo_spark.operators.coloring import distance_one_coloring

        g = build_parts_graph(spark, sf)
        colors = distance_one_coloring(g)
        c_src = colors.select(F.col("v").alias("src"), F.col("color").alias("c1"))
        c_dst = colors.select(F.col("v").alias("dst"), F.col("color").alias("c2"))
        return (
            g.edges.filter(F.col("src") != F.col("dst"))
            .join(c_src, "src")
            .join(c_dst, "dst")
            .filter(F.col("c1") == F.col("c2"))
            .select("src", "dst")
        )

    def q_equitable_valid(spark, sf):
        # after equitable rebalancing toward 16 classes (`-n` default,
        # `equitableColoringDistanceOne.cpp:90-253`) the coloring must STAY
        # proper — same empty-monochromatic-edge-set oracle
        from grappolo_spark.operators.coloring import (
            distance_one_coloring,
            equitable_rebalance,
        )

        g = build_parts_graph(spark, sf)
        # max_rounds=6 bounds the driver-gate wall time; the validity
        # invariant (properness) holds after ANY number of rounds
        colors = equitable_rebalance(
            g, distance_one_coloring(g), num_colors=16, max_rounds=6
        )
        c_src = colors.select(F.col("v").alias("src"), F.col("color").alias("c1"))
        c_dst = colors.select(F.col("v").alias("dst"), F.col("color").alias("c2"))
        return (
            g.edges.filter(F.col("src") != F.col("dst"))
            .join(c_src, "src")
            .join(c_dst, "dst")
            .filter(F.col("c1") == F.col("c2"))
            .select("src", "dst")
        )

    def q_coloring_histogram(spark, sf):  # rows-only (xxhash64 tie-break)
        from grappolo_spark.operators.coloring import (
            color_histogram,
            distance_one_coloring,
        )

        g = build_parts_graph(spark, sf)
        return color_histogram(distance_one_coloring(g)).orderBy("color")

    def q_rngstream(spark, sf):
        # reference-parity randomness (`Utility/utilityFunctions.cpp:47-75`,
        # `Utility/RngStream.cpp`): the exact vector generateRandomNumbers()
        # fills at 4 OpenMP threads — value-oracled against DuckDB stepping
        # the published MRG32k3a recurrence in a recursive CTE
        from grappolo_spark.functions.rngstream import rngstream_fill

        return rngstream_fill(spark, 1200, 4, block=128)

    def q_dedup_exact(spark, sf):
        return D.exact_dedup(_read(spark, sf, "documents"))

    def q_ngram_jaccard(spark, sf):
        # max_shingle_df caps hot-shingle buckets (quadratic at corpus
        # scale); the oracle SQL applies the identical cap
        return D.ngram_jaccard_pairs(
            _read(spark, sf, "documents"), n=3, threshold=0.3, max_shingle_df=50
        )

    def q_dedup_clusters(spark, sf):
        # pair table -> duplicate clusters via the engine's own CC; the
        # oracle recomputes the identical pairs in SQL and resolves them
        # with a recursive CTE
        pairs = D.ngram_jaccard_pairs(
            _read(spark, sf, "documents"), n=3, threshold=0.3, max_shingle_df=50
        )
        return D.dedup_clusters(pairs)

    def q_minhash(spark, sf):  # rows-only (xxhash64 sketch)
        return D.minhash_lsh_pairs(
            _read(spark, sf, "documents"), num_hashes=32, bands=8, threshold=0.5
        )

    def q_simhash(spark, sf):  # rows-only (xxhash64 sketch)
        return D.simhash_buckets(_read(spark, sf, "documents"))

    def q_tokens(spark, sf):
        d = T.token_count(_read(spark, sf, "documents"))
        return d.select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"))

    def q_quality(spark, sf):
        return T.quality_score(_read(spark, sf, "documents")).select(
            "doc_id", "quality"
        )

    def q_langid(spark, sf):
        return T.language_id(_read(spark, sf, "documents")).select(
            "doc_id", "lang_pred"
        )

    def q_fingerprint(spark, sf):
        return T.fingerprint(_read(spark, sf, "documents")).select(
            "doc_id", "fingerprint"
        )

    def q_ann(spark, sf):
        # scale kernel: broadcast queries, stream the corpus (numpy/BLAS
        # per Arrow batch) — bit-identical to the HOF crossJoin baseline,
        # which the DuckDB oracle still mirrors
        from grappolo_spark.functions.similarity_fast import cosine_topk_sharded

        emb = _read(spark, sf, "embeddings")
        q = emb.filter(F.col("vec_id") % 10 == 0)
        return cosine_topk_sharded(emb, k=5, queries=q)

    def q_ann_lsh(spark, sf):  # rows-only (hash-bucketed approximate path)
        emb = _read(spark, sf, "embeddings")
        return S.lsh_cosine_topk(emb, k=5, num_planes=6, num_tables=4)

    def q_ann_ivf(spark, sf):  # rows-only (float centroids not SQL-stable)
        from grappolo_spark.functions.ivf import ivf_cosine_topk

        emb = _read(spark, sf, "embeddings")
        return ivf_cosine_topk(
            emb, k=5, num_cells=16, nprobe=4,
            queries=emb.filter(F.col("vec_id") % 10 == 0),
        )

    def q_dedup_embedding(spark, sf):
        # embedding-cosine near-dup tier (exact baseline, SQL-oracled)
        from grappolo_spark.functions.similarity_fast import (
            embedding_near_dup_pairs,
        )

        return embedding_near_dup_pairs(
            _read(spark, sf, "embeddings"), threshold=0.3, method="exact"
        )

    return {
        "cs_edges": q_cs_edges,
        "degree_stats": q_degree_stats,
        "connected_components": q_cc,
        "cc_star_distributed": q_cc_distributed,
        "pagerank": q_pagerank,
        "label_propagation": q_lpa,
        "lpa_distributed": q_lpa_distributed,
        "triangle_total": q_tri_total,
        "triangles_per_vertex": q_tri_vertex,
        "edge_jaccard": q_jaccard,
        "sparsify_topk": q_sparsify,
        "vertex_following": q_vf,
        "coarsen_nation": q_coarsen,
        "modularity_nation": q_modularity,
        "modularity_directed": q_modularity_directed,
        "corpus_edges": q_corpus_edges,
        "old2new_map": q_old2new,
        "louvain_smart_init": q_smart_init,
        "cluster_compare": q_compare,
        "gini_nation": q_gini,
        "louvain_communities": q_louvain,
        "louvain_sweeps2": q_louvain_sweeps,
        "louvain_distributed": q_louvain_distributed,
        "louvain_sampled_sweeps": q_louvain_sampled,
        "louvain_early_term_sweeps": q_louvain_early_term,
        "louvain_colored_sweep1": q_louvain_colored_sweep,
        "louvain_colored_gs": q_louvain_colored_gs,
        "ftr_metrics": q_ftr_metrics,
        "sessionize_events": q_sessionize,
        "multimodal_features": q_multimodal,
        "coloring_valid": q_coloring_valid,
        "equitable_valid": q_equitable_valid,
        "coloring_histogram": q_coloring_histogram,
        "rngstream_randvec": q_rngstream,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "dedup_minhash_lsh": q_minhash,
        "simhash_buckets": q_simhash,
        "token_count": q_tokens,
        "quality_score": q_quality,
        "language_id": q_langid,
        "doc_fingerprint": q_fingerprint,
        "ann_cosine_topk": q_ann,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "dedup_embedding": q_dedup_embedding,
    }


def oracle_sql() -> dict[str, str]:
    sql = {}

    sql["cs_edges"] = f"WITH {CS_EDGES_CTE.strip()} SELECT src, dst, weight FROM cs_edges"

    sql["degree_stats"] = f"""
WITH {CS_EDGES_CTE.strip()},
deg AS (SELECT src AS v, count(*) AS od, sum(weight) AS wd FROM cs_edges GROUP BY 1),
ds AS (
  SELECT CAST(count(*) AS BIGINT) AS num_vertices,
         CAST(min(od) AS BIGINT) AS min_degree,
         CAST(max(od) AS BIGINT) AS max_degree,
         avg(od) AS avgd,
         avg(od * od) AS avgsq,
         CAST(sum(CASE WHEN od = 0 THEN 1 ELSE 0 END) AS BIGINT) AS isolated,
         CAST(sum(CASE WHEN od = 1 THEN 1 ELSE 0 END) AS BIGINT) AS degree_one,
         round(sum(wd), 6) AS total_weight_2m
  FROM deg
),
es AS (
  SELECT count(*) AS rows2,
         sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS selfs
  FROM cs_edges
)
SELECT num_vertices,
       CAST((rows2 - coalesce(selfs, 0)) / 2 + coalesce(selfs, 0) AS BIGINT) AS num_edges,
       min_degree,
       max_degree,
       round(avgd, 6) AS avg_degree,
       round(avgsq, 6) AS avg_sq_degree,
       round(avgsq - avgd * avgd, 6) AS variance,
       round(sqrt(avgsq - avgd * avgd), 6) AS std_dev,
       isolated,
       degree_one,
       round(((rows2 - coalesce(selfs, 0)) / 2 + coalesce(selfs, 0))
             / (CAST(num_vertices AS DOUBLE) * num_vertices) * 100.0, 6) AS density_pct,
       total_weight_2m
FROM ds, es
"""

    sql["connected_components"] = f"""
WITH RECURSIVE {PARTS_EDGES_CTE.strip()},
reach(v, r) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM parts_edges)
  UNION
  SELECT e.dst, reach.r FROM reach JOIN parts_edges e ON e.src = reach.v
)
SELECT v, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY v
"""

    # the forced-distributed variants compute the same values as the engine
    # defaults — one oracle text each, so the driver value-checks the
    # star supersteps / LPA supersteps themselves
    sql["cc_star_distributed"] = sql["connected_components"]

    sql["pagerank"] = _pagerank_sql(10, 0.85)
    sql["label_propagation"] = _lpa_sql(3)
    sql["lpa_distributed"] = _lpa_sql(3)
    sql["louvain_sweeps2"] = _louvain_sweeps_sql(2)
    # variant kernels, each a fixed unrolled sweep schedule (see the Spark
    # queries for the max_iters -> returned-sweep-count accounting):
    # sampled moves ("mult" stream, seed 12345, 50%), early-terminate
    # (third sweep active-set-restricted), colored Gauss-Seidel (bipartite
    # 2-coloring: customers then suppliers, state refreshed in between)
    sql["louvain_sampled_sweeps"] = _louvain_sweeps_sql(2, sample=(12345, 50))
    sql["louvain_early_term_sweeps"] = _louvain_sweeps_sql(3, early_term_from=2)
    sql["louvain_colored_sweep1"] = _louvain_sweeps_sql(
        2, mover_preds=["e2.src < 1000000", "e2.src >= 1000000"]
    )

    # FTR diagnostics: the same accounting as modularity_nation plus the
    # Granell/Gomez/Arenas resolution terms, mirroring ftr_metrics() and
    # _ftr_terms() operation-for-operation (louvain.py)
    sql["ftr_metrics"] = f"""
WITH {CS_EDGES_CTE.strip()},
{NATION_ASSIGN_CTE.strip()},
twom AS (SELECT sum(weight) AS w2 FROM cs_edges),
exx AS (
  SELECT COALESCE(sum(e.weight), 0.0) AS e_xx
  FROM cs_edges e
  JOIN assign a1 ON a1.v = e.src
  JOIN assign a2 ON a2.v = e.dst
  WHERE a1.comm = a2.comm
),
deg AS (SELECT src AS v, sum(weight) AS wd FROM cs_edges GROUP BY 1),
a2x AS (
  SELECT sum(cd * cd) AS a2_x FROM (
    SELECT a.comm, sum(d.wd) AS cd
    FROM deg d JOIN assign a ON a.v = d.v
    GROUP BY a.comm
  )
),
sizes AS (
  SELECT sum(CAST(csize AS DOUBLE) * csize) AS n_c2d,
         CAST(sum(csize) AS DOUBLE) AS nvd,
         CAST(sum(csize * csize) AS BIGINT) AS n_c2_i,
         CAST(sum(csize) AS BIGINT) AS nv_i
  FROM (SELECT comm, count(*) AS csize FROM assign GROUP BY 1)
),
terms AS (
  SELECT e_xx / w2 - a2_x / (w2 * w2) AS q,
         w2, nvd, n_c2d, nv_i, n_c2_i,
         nvd - n_c2d / nvd AS nd
  FROM exx, a2x, twom, sizes
),
rm AS (SELECT *, (-w2 / nd) * q AS r_min FROM terms)
SELECT round(q, 6) AS modularity,
       round(r_min, 9) AS r_min,
       round((w2 * q + r_min * nd) / (w2 - nvd * r_min), 6) + 0.0 AS q_afg,
       nv_i AS nv,
       n_c2_i AS n_c2
FROM rm
"""

    # gap-based sessionization (30-min-style idle gap, here 480 min):
    # classic gaps-and-islands over the events table; timestamps reported
    # as microsecond offsets from 2024-01-01 so engine session-timezone
    # interpretation cancels out of the comparison
    sql["sessionize_events"] = """
WITH e AS (
  SELECT user_id, ts, value FROM events WHERE user_id < 50
),
d AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 480 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM d
)
SELECT user_id,
       epoch_us(min(ts) - TIMESTAMP '2024-01-01 00:00:00') AS start_us,
       epoch_us(max(ts) - TIMESTAMP '2024-01-01 00:00:00') AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS value_sum
FROM s GROUP BY user_id, sid
"""

    # multimodal decode: recompute the raw8 gradient-image histograms in
    # pure SQL — pixel (x + y + 42 + media_id) % 256 over a 16x16 raster,
    # 16 intensity bins (>> 4), share = count/256 (exact in fp32 and fp64,
    # so round(...,6) matches bit-for-bit). Video rows featurize frame 0,
    # whose phase equals the image formula.
    sql["multimodal_features"] = """
WITH ids AS (
  SELECT i AS media_id,
         CASE WHEN i % 3 = 0 THEN 'image' ELSE 'video' END AS kind
  FROM range(60) t(i) WHERE i % 3 IN (0, 2)
),
px AS (
  SELECT ids.media_id, ids.kind,
         CAST(((x.r + y.r + 42 + ids.media_id) % 256) // 16 AS BIGINT) AS bin
  FROM ids, range(16) x(r), range(16) y(r)
),
hist AS (
  SELECT media_id, kind, bin, count(*) / 256.0 AS share
  FROM px GROUP BY 1, 2, 3
)
SELECT ids.media_id, ids.kind, CAST(b.r AS BIGINT) AS bin,
       round(COALESCE(hist.share, 0.0), 6) AS share
FROM ids CROSS JOIN range(16) b(r)
LEFT JOIN hist ON hist.media_id = ids.media_id AND hist.bin = b.r
"""

    # validity oracles: a proper (distance-1) coloring has NO monochromatic
    # edge, before and after equitable rebalancing — the oracle is the
    # empty relation with the matching schema
    _EMPTY_EDGES = (
        "SELECT CAST(NULL AS BIGINT) AS src, CAST(NULL AS BIGINT) AS dst WHERE 1 = 0"
    )
    sql["coloring_valid"] = _EMPTY_EDGES
    sql["equitable_valid"] = _EMPTY_EDGES
    sql["rngstream_randvec"] = _rngstream_sql(1200, 4)

    sql["triangle_total"] = f"""
WITH {PARTS_EDGES_CTE.strip()},
o AS (SELECT u, v FROM pp)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM o e1 JOIN o e2 ON e1.v = e2.u JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
"""

    sql["triangles_per_vertex"] = f"""
WITH {PARTS_EDGES_CTE.strip()},
o AS (SELECT u, v FROM pp),
tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM o e1 JOIN o e2 ON e1.v = e2.u JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS v FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
cnt AS (SELECT v, count(*) AS t FROM corners GROUP BY v)
SELECT verts.v, CAST(COALESCE(cnt.t, 0) AS BIGINT) AS triangles
FROM (SELECT DISTINCT src AS v FROM parts_edges) verts
LEFT JOIN cnt ON cnt.v = verts.v
"""

    sql["edge_jaccard"] = f"""
WITH {PARTS_EDGES_CTE.strip()},
e AS (SELECT src, dst FROM parts_edges),
deg AS (SELECT src AS x, count(*) AS d FROM e GROUP BY 1),
und AS (SELECT u, v FROM pp),
inter AS (
  SELECT und.u, und.v, count(*) AS ninter
  FROM und
  JOIN e a ON a.src = und.u
  JOIN e b ON b.src = und.v AND b.dst = a.dst
  GROUP BY 1, 2
)
SELECT und.u, und.v,
       round(COALESCE(inter.ninter, 0)
             / (du.d + dv.d - COALESCE(inter.ninter, 0)), 6) AS jaccard
FROM und
LEFT JOIN inter ON inter.u = und.u AND inter.v = und.v
JOIN deg du ON du.x = und.u
JOIN deg dv ON dv.x = und.v
"""

    sql["sparsify_topk"] = f"""
WITH {PARTS_EDGES_CTE.strip()},
e AS (SELECT src, dst FROM parts_edges),
deg0 AS (SELECT src AS x, count(*) AS d FROM e GROUP BY 1),
und AS (SELECT u, v FROM pp),
inter AS (
  SELECT und.u, und.v, count(*) AS ninter
  FROM und JOIN e a ON a.src = und.u JOIN e b ON b.src = und.v AND b.dst = a.dst
  GROUP BY 1, 2
),
jac AS (
  SELECT und.u, und.v,
         round(COALESCE(inter.ninter, 0)
               / (du.d + dv.d - COALESCE(inter.ninter, 0)), 6) AS jaccard
  FROM und
  LEFT JOIN inter ON inter.u = und.u AND inter.v = und.v
  JOIN deg0 du ON du.x = und.u
  JOIN deg0 dv ON dv.x = und.v
),
bidir AS (
  SELECT u, v, jaccard FROM jac
  UNION ALL
  SELECT v, u, jaccard FROM jac
),
dg AS (SELECT u, count(*) AS d FROM bidir GROUP BY 1),
rk AS (
  SELECT b.u, b.v, dg.d,
         row_number() OVER (PARTITION BY b.u ORDER BY b.jaccard DESC, b.v ASC) AS rn
  FROM bidir b JOIN dg ON dg.u = b.u
)
SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
FROM rk WHERE rn <= ceil(pow(d, 0.5))
"""

    sql["vertex_following"] = f"""
WITH {CS_EDGES_CTE.strip()},
deg AS (SELECT src AS v, count(*) AS d FROM cs_edges GROUP BY 1),
onbr AS (
  SELECT e.src AS v, max(e.dst) AS t
  FROM cs_edges e JOIN deg ON deg.v = e.src AND deg.d = 1
  GROUP BY 1
),
rep0 AS (
  SELECT d.v,
         CASE WHEN d.d = 1 AND o.t <> d.v AND (dt.d > 1 OR d.v > o.t)
              THEN o.t ELSE d.v END AS rep
  FROM deg d
  LEFT JOIN onbr o ON o.v = d.v
  LEFT JOIN deg dt ON dt.v = o.t
),
firsts AS (SELECT rep, min(v) AS mv FROM rep0 GROUP BY 1),
dense AS (
  SELECT rep, CAST(row_number() OVER (ORDER BY mv) - 1 AS BIGINT) AS nrep
  FROM firsts
)
SELECT r.v, dense.nrep AS rep FROM rep0 r JOIN dense ON dense.rep = r.rep
"""

    sql["coarsen_nation"] = f"""
WITH {CS_EDGES_CTE.strip()},
{NATION_ASSIGN_CTE.strip()},
folded AS (
  SELECT a1.comm AS src, a2.comm AS dst, sum(e.weight) AS weight
  FROM cs_edges e
  JOIN assign a1 ON a1.v = e.src
  JOIN assign a2 ON a2.v = e.dst
  GROUP BY 1, 2
),
ph AS (SELECT DISTINCT comm AS src, comm AS dst, 0.0 AS weight FROM assign),
uni AS (SELECT * FROM folded UNION ALL SELECT * FROM ph)
SELECT src, dst, round(sum(weight), 6) AS weight FROM uni GROUP BY 1, 2
"""

    sql["modularity_nation"] = f"""
WITH {CS_EDGES_CTE.strip()},
{NATION_ASSIGN_CTE.strip()},
twom AS (SELECT sum(weight) AS m2 FROM cs_edges),
exx AS (
  SELECT COALESCE(sum(e.weight), 0.0) AS e_xx
  FROM cs_edges e
  JOIN assign a1 ON a1.v = e.src
  JOIN assign a2 ON a2.v = e.dst
  WHERE a1.comm = a2.comm
),
deg AS (SELECT src AS v, sum(weight) AS wd FROM cs_edges GROUP BY 1),
a2x AS (
  SELECT sum(cd * cd) AS a2_x FROM (
    SELECT a.comm, sum(d.wd) AS cd
    FROM deg d JOIN assign a ON a.v = d.v
    GROUP BY a.comm
  )
)
SELECT round(e_xx / m2 - a2_x / (m2 * m2), 6) AS modularity
FROM exx, a2x, twom
"""

    sql["cluster_compare"] = """
WITH cont AS (
  SELECT c_nationkey AS c1, c_mktsegment AS c2, CAST(count(*) AS DOUBLE) AS nij
  FROM customer GROUP BY 1, 2
),
tp AS (SELECT sum(nij * (nij - 1) / 2) AS v FROM cont),
rowp AS (SELECT sum(ni * (ni - 1) / 2) AS v FROM (SELECT sum(nij) AS ni FROM cont GROUP BY c1)),
colp AS (SELECT sum(nj * (nj - 1) / 2) AS v FROM (SELECT sum(nij) AS nj FROM cont GROUP BY c2)),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer)
SELECT n.n,
       tp.v AS same_same,
       rowp.v - tp.v AS same_diff,
       colp.v - tp.v AS diff_same,
       round(tp.v / NULLIF(colp.v, 0), 6) AS precision,
       round(tp.v / NULLIF(rowp.v, 0), 6) AS recall,
       round(2 * (tp.v / NULLIF(colp.v, 0)) * (tp.v / NULLIF(rowp.v, 0))
             / NULLIF(tp.v / NULLIF(colp.v, 0) + tp.v / NULLIF(rowp.v, 0), 0), 6) AS fscore,
       round(2.0 * ((rowp.v - tp.v) + (colp.v - tp.v)) / (CAST(n.n AS DOUBLE) * n.n), 9) AS mirkin
FROM tp, rowp, colp, n
"""

    sql["gini_nation"] = """
WITH sizes AS (
  SELECT c_nationkey AS comm, CAST(count(*) AS DOUBLE) AS s
  FROM customer GROUP BY 1
),
rk AS (
  SELECT s, row_number() OVER (ORDER BY s, comm) AS i FROM sizes
),
agg AS (SELECT sum(i * s) AS ws, sum(s) AS tot, count(*) AS k FROM rk)
SELECT round(2.0 * ws / (k * tot) - (k + 1.0) / k, 6) AS gini FROM agg
"""

    sql["modularity_directed"] = f"""
WITH {CS_EDGES_CTE.strip()},
assign_d AS (
  SELECT CAST(c_custkey AS BIGINT) AS v, CAST(c_nationkey AS BIGINT) AS comm
  FROM customer
  UNION ALL
  SELECT CAST(1000000 + s_suppkey AS BIGINT), CAST(s_nationkey AS BIGINT)
  FROM supplier
),
m AS (SELECT sum(weight) / 2.0 AS m2 FROM cs_raw),
exx AS (
  SELECT COALESCE(sum(e.weight), 0.0) AS e_xx
  FROM cs_raw e
  JOIN assign_d a1 ON a1.v = e.src
  JOIN assign_d a2 ON a2.v = e.dst
  WHERE a1.comm = a2.comm
),
deg AS (SELECT src AS v, sum(weight) AS wd FROM cs_raw GROUP BY 1),
a2x AS (
  SELECT COALESCE(sum(cd * cd), 0.0) AS a2_x FROM (
    SELECT a.comm, sum(d.wd) AS cd
    FROM deg d JOIN assign_d a ON a.v = d.v
    GROUP BY a.comm
  )
)
SELECT round(e_xx / m2 - a2_x / (m2 * m2), 6) AS modularity_dir
FROM exx, a2x, m
"""

    sql["corpus_edges"] = """
WITH n AS (SELECT count(*) AS c FROM documents),
files AS (
  SELECT doc_id,
         'org/corpus::src/pkg_' || doc_id || '/mod.py' AS id,
         'pkg_' || doc_id || '/mod' AS module,
         '# gen' || chr(10) ||
         'import pkg_' || ((doc_id * 7) % (SELECT c FROM n)) || '.mod' || chr(10) ||
         'import pkg_' || ((doc_id * 13 + 1) % (SELECT c FROM n)) || '.mod' || chr(10)
           AS content
  FROM documents
),
refs AS (
  SELECT id AS src_id,
         replace(unnest(regexp_extract_all(content,
                 'import ([A-Za-z_][0-9A-Za-z_.]*)', 1)), '.', '/') AS ref
  FROM files
),
pairs AS (
  SELECT r.src_id, f.id AS dst_id
  FROM refs r JOIN files f ON r.ref = f.module
  WHERE r.src_id <> f.id
),
canon AS (
  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b
  FROM pairs
),
ids AS (SELECT DISTINCT x AS ext FROM (SELECT a AS x FROM canon UNION ALL SELECT b FROM canon)),
vm AS (SELECT ext, CAST(row_number() OVER (ORDER BY ext) - 1 AS BIGINT) AS v FROM ids),
dcan AS (
  SELECT va.v AS src, vb.v AS dst
  FROM canon JOIN vm va ON va.ext = canon.a JOIN vm vb ON vb.ext = canon.b
)
SELECT src, dst, CAST(1.0 AS DOUBLE) AS weight FROM dcan
UNION ALL
SELECT dst AS src, src AS dst, CAST(1.0 AS DOUBLE) AS weight FROM dcan WHERE src <> dst
"""

    sql["old2new_map"] = f"""
WITH {NATION_ASSIGN_CTE.strip()}
SELECT v, CAST(row_number() OVER (ORDER BY comm, v) - 1 AS BIGINT) AS new_id
FROM assign
"""

    sql["louvain_smart_init"] = f"""
WITH {CS_EDGES_CTE.strip()},
deg AS (SELECT src AS v, sum(weight) AS wd FROM cs_edges GROUP BY 1),
twom AS (SELECT sum(weight) AS m2 FROM cs_edges),
cand AS (
  SELECT e.src, e.dst,
         2.0 * e.weight - 2.0 * du.wd * dv.wd * (1.0 / (SELECT m2 FROM twom)) AS gain
  FROM cs_edges e
  JOIN deg du ON du.v = e.src
  JOIN deg dv ON dv.v = e.dst
  WHERE e.src <> e.dst
),
best AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY gain DESC, dst ASC) AS rn
    FROM cand WHERE gain > 0
  ) WHERE rn = 1 AND dst < src
)
SELECT d.v, CAST(COALESCE(b.dst, d.v) AS BIGINT) AS comm
FROM deg d LEFT JOIN best b ON b.src = d.v
"""

    sql["dedup_exact"] = f"""
SELECT md5({_NORM_SQL}) AS content_hash,
       min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM documents GROUP BY 1
"""

    sql["dedup_ngram_jaccard"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS ts FROM documents)
),
sh_all AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
),
-- identical stop-shingle cap as the Spark query (max_shingle_df=50)
rare AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 50),
sh AS (SELECT doc_id, s.shingle FROM sh_all s JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(ninter / (sa.sz + sb.sz - ninter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(ninter / (sa.sz + sb.sz - ninter), 6) >= 0.3
"""

    sql["dedup_clusters"] = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) AS i
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS ts FROM documents)
),
sh_all AS (
  SELECT DISTINCT doc_id,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(tok, 2) OVER w IS NOT NULL
),
rare AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 50),
sh AS (SELECT doc_id, s.shingle FROM sh_all s JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE round(ninter / (sa.sz + sb.sz - ninter), 6) >= 0.3
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM prs
  UNION
  SELECT id_b, id_a FROM prs
),
reach(v, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM sym)
  UNION
  SELECT e.v, reach.r FROM reach JOIN sym e ON e.u = reach.v
)
SELECT CAST(v AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS keep_id
FROM reach GROUP BY v
"""

    sql["token_count"] = f"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '{TOKEN_RE_SQL}')) AS BIGINT) AS n_tokens
FROM documents
"""

    sql["quality_score"] = f"""
SELECT doc_id,
  round(
    0.4 * least(len(regexp_extract_all(text, '{TOKEN_RE_SQL}')) / 100.0, 1.0)
    + 0.4 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1))
    + 0.2 * least(len(regexp_extract_all(lower(text), '{_EN}')) / 10.0, 1.0)
  , 6) AS quality
FROM documents
"""

    sql["language_id"] = f"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{_DE}')) AS c_de,
         len(regexp_extract_all(lower(text), '{_EN}')) AS c_en,
         len(regexp_extract_all(lower(text), '{_ES}')) AS c_es,
         len(regexp_extract_all(lower(text), '{_FR}')) AS c_fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
            WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
            WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
            WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM c
"""

    sql["doc_fingerprint"] = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'))), ' ')) AS fingerprint
FROM documents
"""

    sql["ann_cosine_topk"] = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
dots AS (
  SELECT a.vec_id AS qa, b.vec_id AS nb, sum(a.x * b.x) AS dot
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id % 10 = 0 AND a.vec_id <> b.vec_id
  GROUP BY 1, 2
),
cos AS (
  SELECT qa AS query_id, nb AS neighbor_id,
         round(dot / (na.nrm * nb2.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON na.vec_id = qa
  JOIN norms nb2 ON nb2.vec_id = nb
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM cos
)
SELECT query_id, neighbor_id, cosine FROM rk WHERE rn <= 5
"""

    sql["dedup_embedding"] = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
dots AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, sum(a.x * b.x) AS dot
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT ia AS id_a, ib AS id_b,
       round(dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots
JOIN norms na ON na.vec_id = ia
JOIN norms nb ON nb.vec_id = ib
WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.3
"""

    return sql
