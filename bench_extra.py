"""Extra benchmarks: per-query isolation + per-phase profiling (round 6).

NOT part of the driver contract — ``bench.py`` stays the frozen measurement
harness. This file exists for the optimization loop (guide §1): select single
queries by name, run them warm with job descriptions set, and print per-phase
timing for the multiphase lines so the driver-side plan-compile floor is
visible. Usage::

    python bench_extra.py louvain_distributed --repeats 3
    python bench_extra.py all

Environment: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = 2
    names: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--repeats":
            repeats = int(next(it))
        else:
            names.append(a)

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
        app_name="grappolo-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) if cpus != "*" else 32, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    holder: dict = {}

    def _cs():
        if "cs" not in holder:
            g = M.build_cs_graph(spark, sf_dir).partition_by_src()
            g.edges.count()
            holder["cs"] = g
        return holder["cs"]

    def _parts():
        return M.build_parts_graph(spark, sf_dir)

    def _print_phases(res, name):
        for h in res.phase_history:
            print(f"#   {name} {h}", file=sys.stderr, flush=True)
        return res.assignment.count()

    queries = {
        "graph_build": lambda: M.build_cs_graph(spark, sf_dir)
        .partition_by_src()
        .edges.count(),
        "pagerank_10it": lambda: pagerank(_cs(), max_iters=10).count(),
        "connected_components": lambda: connected_components(_parts()).count(),
        "cc_star_distributed": lambda: connected_components(
            _parts(), local_threshold=0
        ).count(),
        "label_propagation_3it": lambda: label_propagation(
            _parts(), max_iters=3, stop_on_converge=False
        ).count(),
        "lpa_distributed_3it": lambda: label_propagation(
            _parts(), max_iters=3, stop_on_converge=False, local_threshold=0
        ).count(),
        "triangle_count": lambda: triangle_count(_parts()).collect(),
        "louvain_multiphase": lambda: _print_phases(
            louvain(_cs(), max_phases=3, smart_init=True), "mp"
        ),
        "louvain_distributed": lambda: _print_phases(
            louvain(_cs(), max_phases=3, smart_init=True, local_threshold=0),
            "dist",
        ),
        "louvain_colored": lambda: _print_phases(
            louvain(
                _cs(), max_phases=3, coloring=True, min_graph_size=2000,
                num_colors_cap=8, coloring_algo="multihash",
            ),
            "col",
        ),
        "dedup_minhash_lsh": lambda: minhash_lsh_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            num_hashes=32, bands=8, threshold=0.5,
        ).count(),
        "ann_cosine_topk": lambda: (
            lambda emb: cosine_topk_sharded(
                emb, k=5, queries=emb.filter(F.col("vec_id") % 10 == 0)
            ).count()
        )(spark.read.parquet(f"{sf_dir}/embeddings.parquet")),
    }

    if not names or names == ["all"]:
        names = list(queries)

    timings: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        runs = []
        for i in range(repeats):
            sc.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            fn()
            runs.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        timings[name] = runs
        print(f"# {name}: {runs}", file=sys.stderr, flush=True)

    print(json.dumps({"sf": sf_dir, "cpus": cpus, "runs": timings}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
