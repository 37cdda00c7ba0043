"""Capture .explain('formatted') plans for the round-6 optimization targets.

Usage: python scripts/r06_plans.py before|after [query ...]

Writes plans/r06/<query>_<suffix>.txt. Iterative kernels' per-superstep
plans are mirrored from the operator code the same way the repo's plan
tests do (tests/test_round5_fixes.py), so the files show the exact join/
aggregation chain the loop compiles each iteration; result-level plans are
captured from the real query functions.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
)


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(argv: list[str]) -> int:
    suffix = argv[0]
    only = set(argv[1:])
    os.makedirs(OUT_DIR, exist_ok=True)

    from pyspark.sql import functions as F

    import __spark_entry__ as M
    from grappolo_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="r06-plans", master="local[8]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    sections: dict[str, str] = {}

    # ---- graph build ----------------------------------------------------
    cs = M.build_cs_graph(spark, sf)
    sections["graph_build"] = grab(cs.edges)

    # ---- vertex_ids (shared by pagerank/cc/lpa/multiphase state init) ---
    sections["vertex_ids"] = grab(cs.vertex_ids())

    # ---- pagerank: base table + one superstep ---------------------------
    from grappolo_spark.operators import pagerank as PR

    base_probe = {}

    real_persist_pr = None

    def _capture_pagerank():
        # mirror of pagerank()'s base/superstep construction (operators/
        # pagerank.py) on the broadcast path
        g = cs
        wout = g.edges.groupBy(F.col("src").alias("v")).agg(
            F.sum("weight").alias("wout")
        )
        if suffix == "after":
            base = wout  # sym_complete: base IS the wout aggregation
        else:
            verts = g.vertex_ids()
            base = verts.join(wout, "v", "left").select(
                "v", F.coalesce("wout", F.lit(0.0)).alias("wout")
            )
        base = base.persist()
        base.count()
        edges = g.edges.repartition("dst").persist()
        edges.count()
        ranks = base.select("v", F.lit(1.0).alias("rank"), "wout")
        contribs = (
            edges.join(F.broadcast(ranks), edges.src == ranks.v)
            .select(
                F.col("dst").alias("v"),
                (F.col("rank") * F.col("weight") / F.col("wout")).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("in_contrib"))
        )
        new = base.join(contribs, "v", "left").select(
            "v",
            (
                F.lit(0.15) + F.lit(0.85) * F.coalesce("in_contrib", F.lit(0.0))
            ).alias("rank"),
            "wout",
        )
        sections["pagerank_base"] = grab(base)
        sections["pagerank_superstep"] = grab(new)
        base.unpersist()
        edges.unpersist()

    _capture_pagerank()

    if suffix == "after":
        # the driver-held-rank loop's one Spark job per superstep: the
        # same broadcast-join gather over the dst-partitioned cache, with
        # the rank table a LocalRelation instead of the committed state
        # (operators/pagerank.py np loop)
        import pandas as pd

        g = cs
        edges_np_cap = g.edges.repartition("dst").persist()
        edges_np_cap.count()
        bp = (
            g.edges.groupBy(F.col("src").alias("v"))
            .agg(F.sum("weight").alias("wout"))
            .toPandas()
        )
        bp["rank"] = 1.0 / len(bp)
        rank_lr = spark.createDataFrame(
            bp[["v", "rank", "wout"]], "v long, rank double, wout double"
        )
        cp = (
            edges_np_cap.join(
                F.broadcast(rank_lr), edges_np_cap.src == rank_lr.v
            )
            .select(
                F.col("dst").alias("v"),
                (F.col("rank") * F.col("weight") / F.col("wout")).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("in_contrib"))
        )
        sections["pagerank_np_gather"] = grab(cp)
        edges_np_cap.unpersist()

    # ---- cc star round --------------------------------------------------
    from grappolo_spark.operators.components import _large_star, _small_star

    parts = M.build_parts_graph(spark, sf)
    pairs = (
        parts.edges.filter(F.col("src") != F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )
    sections["cc_star_round"] = grab(_small_star(_large_star(pairs, dedup=False)))

    # ---- louvain gather superstep (broadcast layout, as in the kernel) --
    edges = cs.edges.repartition("src").persist()
    edges.count()
    assign = cs.vertex_ids().select("v", F.col("v").alias("comm"))
    a_dst = assign.select(F.col("v").alias("dst"), F.col("comm").alias("comm_dst"))
    gathered = edges.join(F.broadcast(a_dst), "dst").select(
        F.col("src").alias("v"), F.col("comm_dst").alias("cand"), "weight"
    )
    counter = gathered.groupBy("v", "cand").agg(F.sum("weight").alias("wsum"))
    best = counter.groupBy("v").agg(
        F.min_by(
            F.struct("cand", "wsum"), F.struct(-F.col("wsum"), F.col("cand"))
        ).alias("b")
    )
    sections["louvain_gather"] = grab(best)
    edges.unpersist()

    # ---- colored class gather, mid-regime broadcast layout --------------
    if suffix == "after":
        # mirror of louvain_one_phase_colored's bcast_hint class job
        # (operators/coloring.py): both O(V) sides broadcast pre-enriched
        # over the src-partitioned cache — the claim is ZERO exchanges
        # between the cache scan and the class winner set
        ce = cs.edges.repartition("src").persist()
        ce.count()
        st = cs.vertex_ids().select(
            "v", F.col("v").alias("comm"), F.lit(1.0).alias("deg"),
            F.lit(0.0).alias("selfloop"), (F.col("v") % 8).cast("int").alias("color"),
        )
        cinfo = st.groupBy("comm").agg(
            F.sum("deg").alias("cdeg"), F.count(F.lit(1)).alias("csize")
        )
        movers = st.filter(F.col("color") == 0)
        state_src = movers.join(
            cinfo.select(
                "comm", F.col("cdeg").alias("cdeg_cur"),
                F.col("csize").alias("csize_cur"),
            ),
            "comm",
        ).select(
            F.col("v").alias("src"), "comm", "deg", "selfloop",
            "cdeg_cur", "csize_cur",
        )
        dst_enr = st.join(cinfo, "comm").select(
            F.col("v").alias("dst"), F.col("comm").alias("cand"),
            F.col("cdeg").alias("ay"), F.col("csize").alias("csize_cand"),
        )
        counter = (
            ce.join(F.broadcast(state_src), "src")
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
        from grappolo_spark.operators.coloring import _class_best_moves

        sections["colored_class_gather_bcast"] = grab(
            _class_best_moves(counter, None, None, 1.0)
        )
        ce.unpersist()

    # ---- LPA superstep (forced distributed, broadcast layout) -----------
    lp_pairs = (
        parts.edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .repartition("src")
        .persist()
    )
    lp_pairs.count()
    labels = parts.vertex_ids().select("v", F.col("v").alias("label"))
    freq = (
        lp_pairs.join(F.broadcast(labels), lp_pairs.dst == labels.v)
        .groupBy(F.col("src").alias("vv"), "label")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    lp_best = freq.groupBy("vv").agg(
        F.max_by("label", F.struct(F.col("w"), -F.col("label"))).alias("new_label")
    )
    sections["lpa_superstep"] = grab(lp_best)
    lp_pairs.unpersist()

    # ---- triangle count -------------------------------------------------
    from grappolo_spark.operators.triangles import triangle_count

    sections["triangle_count"] = grab(triangle_count(parts, per_vertex=True))

    # ---- dedup minhash / ann -------------------------------------------
    from grappolo_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sections["dedup_minhash_lsh"] = grab(
        minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5)
    )

    for name, text in sections.items():
        if only and name not in only:
            continue
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
