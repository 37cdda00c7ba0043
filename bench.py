"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, "edges_per_sec_superstep": N}

The headline throughput figure is edges/sec per superstep, measured on the
PageRank loop (fixed 10 supersteps over the symmetrized cs edge table) —
the metric BASELINE.md tracks. Run scripts/scaling_bench.py for the
two-parallelism (N vs 4N cores) scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    import __spark_entry__ as M
    from grappolo_spark.operators.components import connected_components
    from grappolo_spark.operators.labelprop import label_propagation
    from grappolo_spark.operators.multiphase import louvain
    from grappolo_spark.operators.pagerank import pagerank
    from grappolo_spark.operators.triangles import triangle_count
    from grappolo_spark.functions.dedup import minhash_lsh_pairs
    from grappolo_spark.functions.similarity_fast import cosine_topk_sharded
    from grappolo_spark.session import get_spark

    spark = get_spark(
        app_name="grappolo-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) if cpus != "*" else 32, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return out

    # graph build (scan + join + groupBy + symmetrize), materialized once
    cs = timed("graph_build", lambda: M.build_cs_graph(spark, sf_dir).partition_by_src())
    n_edges = cs.edges.count()

    pr_iters = 10
    timed("pagerank_10it", lambda: pagerank(cs, max_iters=pr_iters).count())

    parts = M.build_parts_graph(spark, sf_dir)
    # engine default (auto local union-find below the edge threshold) AND
    # the forced distributed star path, so both plans stay measured
    timed("connected_components", lambda: connected_components(parts).count())
    timed(
        "cc_star_distributed",
        lambda: connected_components(parts, local_threshold=0).count(),
    )
    timed(
        "label_propagation_3it",
        lambda: label_propagation(parts, max_iters=3, stop_on_converge=False).count(),
    )
    timed("triangle_count", lambda: triangle_count(parts).collect())
    # smart_init = the reference's initCommAssOpt warm start: replaces each
    # phase's first full iteration with a one-pass sweep, same trajectory
    timed(
        "louvain_multiphase",
        lambda: louvain(cs, max_phases=3, smart_init=True).assignment.count(),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed(
        "dedup_minhash_lsh",
        lambda: minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5).count(),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed(
        "ann_cosine_topk",
        lambda: cosine_topk_sharded(
            emb, k=5, queries=emb.filter(F.col("vec_id") % 10 == 0)
        ).count(),
    )

    total = round(sum(timings.values()), 3)
    eps = round(n_edges * pr_iters / timings["pagerank_10it"], 1)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "edges": n_edges,
                "edges_per_sec_superstep": eps,
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
