"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "runs": {name: [sec, ...]},
   "sf": <dir>, "edges_per_sec_superstep": N}

Each headline query runs best-of-N (default N=2, $SPARK_GRAFT_BENCH_REPEATS)
and reports the MIN plus every raw run, so a single externally-loaded run on
this shared box can't masquerade as a regression (the round-2 bench was one
unguarded run and its pagerank number landed 2.7x off the recorded best).
The heavy forced-distributed diagnostic lines (`louvain_distributed`,
`louvain_colored`) run best-of-N like the rest since round 4 — a single
loaded draw on the slowest lines distorted the round-4 record; they exist
to keep the 100x-scale plan measured, not to be the headline.

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
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

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
    all_runs: dict[str, list[float]] = {}

    def timed(name, fn, n=None):
        n = repeats if n is None else n
        runs, out = [], None
        for _ in range(max(1, n)):
            t0 = time.time()
            out = fn()
            runs.append(round(time.time() - t0, 3))
        timings[name] = min(runs)
        all_runs[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)
        return out

    # graph build (scan + join + groupBy + symmetrize), INCLUDING the
    # materializing count — the round-2 bench timed only the lazy plan
    # construction, which made the number noise-dominated
    holder: dict = {}

    def build_fn():
        if "g" in holder:
            holder["g"].unpersist()
        g = M.build_cs_graph(spark, sf_dir).partition_by_src()
        holder["n"] = g.edges.count()
        holder["g"] = g
        return g

    cs = timed("graph_build", build_fn)
    n_edges = holder["n"]

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
    # forced-distributed LPA: the src-keyed broadcast-gather layout
    # (zero per-superstep exchanges; 2.2-2.7x over the dst shuffle plan
    # at 134M edges — SCALING.json round5_late)
    timed(
        "lpa_distributed_3it",
        lambda: label_propagation(
            parts, max_iters=3, stop_on_converge=False, local_threshold=0
        ).count(),
    )
    timed("triangle_count", lambda: triangle_count(parts).collect())
    # engine default: at this sf the whole multiphase runs the driver-local
    # numpy tail (identical kernel, equivalence-tested); smart_init is the
    # reference's initCommAssOpt warm start, honored on BOTH paths
    timed(
        "louvain_multiphase",
        lambda: louvain(cs, max_phases=3, smart_init=True).assignment.count(),
    )
    # forced-distributed multiphase: the plan that runs at 100x scale
    # (gather/argmax supersteps + coarsen + renumber), measured separately
    timed(
        "louvain_distributed",
        lambda: louvain(
            cs, max_phases=3, smart_init=True, local_threshold=0
        ).assignment.count(),
    )
    # colored Gauss-Seidel diagnostic (the north-star heuristic,
    # `parallelLouvainWithColoring.cpp`) in its scale configuration:
    # bounded multihash palette (palette size caps the sequential
    # sub-sweeps per iteration), colored phase 1, plain tail below
    # min_graph_size
    timed(
        "louvain_colored",
        lambda: louvain(
            cs, max_phases=3, coloring=True, min_graph_size=2000,
            num_colors_cap=8, coloring_algo="multihash",
        ).assignment.count(),
    )

    # bucketed warehouse sink: one-time bucketBy(src) write, then the
    # re-read table's src-keyed scans skip the superstep pre-shuffle in
    # EVERY later run (the durable analogue of partition_by_src)
    import tempfile

    from grappolo_spark.sources.writers import (
        read_bucketed_graph,
        write_bucketed_edges,
    )

    bt_path = tempfile.mkdtemp(prefix="grappolo-bucketed-") + "/cs_edges"
    n_buckets = max(int(cpus) if cpus != "*" else 32, 8)
    spark.sql("DROP TABLE IF EXISTS cs_edges_bucketed")
    timed(
        "bucketed_edge_write",
        lambda: write_bucketed_edges(
            cs, "cs_edges_bucketed", buckets=n_buckets, path=bt_path
        ),
        n=1,
    )

    def bucketed_read_fn():
        g = read_bucketed_graph(spark, "cs_edges_bucketed")
        # degrees = the src-keyed agg every superstep needs; the bucketed
        # scan satisfies hashpartitioning(src), so this plan has NO
        # exchange — compare with graph_build, which pays the full
        # join+groupBy+symmetrize pipeline
        return g.degrees().count()

    timed("graph_build_bucketed", bucketed_read_fn)

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
                "runs": all_runs,
                "repeats": repeats,
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
