"""Dump formatted physical plans for the engine's hot paths.

Plan-quality checklist (run and eyeball, or grep the assertions):
- parquet scans show PushedFilters + pruned ReadSchema (no full-width scans)
- the Louvain gather join reuses the pre-partitioned edge layout (exactly
  one Exchange on the assignment side, none on the persisted edge side)
- aggregations are partial+final HashAggregate inside WholeStageCodegen
- small per-vertex tables broadcast (AQE) once coarsening shrinks them

Writes PLANS.md with the formatted plans.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as M
    from grappolo_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    sections = []

    # 1. pruned + filtered scan
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    scan = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_partkey")
    sections.append(("pruned filtered parquet scan", grab(scan)))

    # 2. graph build (join + groupBy + symmetrize)
    g = M.build_cs_graph(spark, sf)
    sections.append(("cs graph build", grab(g.edges)))

    # 3. louvain gather superstep: edges (pre-partitioned by dst) ⋈ assignment
    edges = g.edges.repartition("dst").persist()
    edges.count()
    assign = g.vertex_ids().select("v", F.col("v").alias("comm"))
    a_dst = assign.select(F.col("v").alias("dst"), F.col("comm").alias("comm_dst"))
    gather = (
        edges.join(a_dst, "dst")
        .groupBy(F.col("src").alias("v"), F.col("comm_dst").alias("cand"))
        .agg(F.sum("weight").alias("wsum"))
    )
    sections.append(("louvain gather superstep", grab(gather)))

    # 3b. single-pass best-candidate aggregation (round 3 kernel): one
    #     groupBy(v) yields argmax + own-community weight; the O(V) sides
    #     broadcast so the O(E) counter is never sort-merge-sorted
    vdeg0 = g.degrees()
    cinfo0 = (
        assign.join(vdeg0.select("v", "deg"), "v")
        .groupBy("comm")
        .agg(F.sum("deg").alias("cdeg"), F.count(F.lit(1)).alias("csize"))
    )
    state0 = (
        assign.join(vdeg0.select("v", "deg"), "v")
        .join(
            cinfo0.select(
                "comm",
                F.col("cdeg").alias("cdeg_cur"),
                F.col("csize").alias("csize_cur"),
            ),
            "comm",
        )
        .select("v", "comm", "deg", "cdeg_cur", "csize_cur")
    )
    cinfo_cand = cinfo0.select(
        F.col("comm").alias("cand"), F.col("cdeg").alias("ay"),
        F.col("csize").alias("csize_cand"),
    )
    bestinfo = (
        gather.join(F.broadcast(state0), "v")
        .join(F.broadcast(cinfo_cand), "cand")
        .withColumn("is_own", F.col("cand") == F.col("comm"))
        .withColumn(
            "score", F.col("wsum") - F.col("deg") * F.col("ay") * F.lit(1e-6)
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
        )
    )
    sections.append(
        ("louvain single-pass argmax + w_own (hash agg, broadcast state)",
         grab(bestinfo))
    )

    # 4. pagerank contribution superstep
    from grappolo_spark.operators.pagerank import pagerank  # noqa: F401
    wout = edges.groupBy(F.col("src").alias("v")).agg(F.sum("weight").alias("wout"))
    ranks = wout.withColumn("rank", F.lit(1.0))
    contrib = (
        edges.join(ranks, edges.src == ranks.v)
        .select(F.col("dst").alias("v"), (F.col("rank") * F.col("weight") / F.col("wout")).alias("c"))
        .groupBy("v")
        .agg(F.sum("c").alias("in_contrib"))
    )
    sections.append(("pagerank contribution superstep", grab(contrib)))

    # 5. pagerank BROADCAST superstep: ranks broadcast, edges partitioned by
    #    dst -> the groupBy(dst) reuses the layout, zero edge-row shuffle
    edges_d = g.edges.repartition("dst").persist()
    edges_d.count()
    contrib_b = (
        edges_d.join(F.broadcast(ranks), edges_d.src == ranks.v)
        .select(F.col("dst"), (F.col("rank") * F.col("weight") / F.col("wout")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("in_contrib"))
    )
    sections.append(("pagerank broadcast superstep (zero edge shuffle)", grab(contrib_b)))

    # 6. distributed dense ranking (replaces the single-partition global
    #    window): range exchange + PARTITIONED window only
    from grappolo_spark.plans.ranking import dense_rank_ids
    ids = g.vertex_ids()
    ranked, _n = dense_rank_ids(ids.select(F.col("v").alias("ext_id")), "ext_id", out="dense_id")
    sections.append(("dense renumbering (partition-offset ranking)", grab(ranked)))

    with open("PLANS.md", "w") as f:
        f.write("# PLANS — formatted physical plans of the hot paths\n")
        f.write("(generated by scripts/explain_plans.py at sf0.01)\n")
        for title, plan in sections:
            f.write(f"\n## {title}\n\n```\n{plan}\n```\n")

    # machine checks
    txt = dict(sections)
    ok = True
    if "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40" not in txt["pruned filtered parquet scan"].replace("\n", ""):
        print("WARN: filter not pushed to parquet scan")
        ok = False
    gather_plan = txt["louvain gather superstep"]
    n_exchanges = gather_plan.count("Exchange")
    print(f"gather exchanges: {n_exchanges} (expect small; edge side cached pre-partitioned)")
    # formatted mode tags codegen per-operator ("[codegen id : n]"), not
    # as WholeStageCodegen blocks
    print("codegen-tagged operators in gather:", gather_plan.count("codegen id"))
    all_plans = "\n".join(p for _, p in sections)
    n_single = all_plans.count("Exchange SinglePartition")
    print(f"single-partition exchanges anywhere: {n_single} (expect 0)")
    if n_single:
        ok = False
    bplan = txt["pagerank broadcast superstep (zero edge shuffle)"]
    if "BroadcastHashJoin" not in bplan:
        print("WARN: broadcast pagerank superstep did not broadcast")
        ok = False
    bi = txt["louvain single-pass argmax + w_own (hash agg, broadcast state)"]
    # the two O(E)-side joins (counter x state0, x cinfo_cand) must be
    # broadcast; SMJ between the O(V) internals of state0 is fine and AQE
    # usually converts it at runtime, so it is informational only
    if "BroadcastHashJoin" not in bi:
        print("WARN: bestinfo O(V) sides did not broadcast")
        ok = False
    print(
        "bestinfo joins:",
        {k: bi.count(k) for k in ("BroadcastHashJoin", "SortMergeJoin")},
        "(SMJ only between O(V) internals is fine)",
    )
    print("OK" if ok else "CHECK PLANS.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
