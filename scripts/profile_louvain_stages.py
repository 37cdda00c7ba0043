"""Per-STAGE time split of the Louvain kernel at the weak-scaling size.

Round-4's weak-scaling pair (8 cores @ 33.5M edges vs 32 @ 134M) put the
kernel at efficiency 0.284 — the bandwidth-heaviest regime on this box —
without saying WHICH stage inside the one-action-per-iteration commit job
pays the bill. This runs the same synthetic workload as scaling_job.py
(xxhash64 edge table, 2^22 vertices x avg degree 16 ~= 134M symmetrized
rows at the default), executes a fixed number of forced supersteps, then
pulls the Spark REST UI's per-stage metrics for the LAST iteration's
commit job and prints a table: stage, tasks, wall, executor CPU-sum,
input / shuffle-read / shuffle-write bytes. Classification to kernel
roles (gather agg / cinfo / argmax / commit write) follows from the byte
profile: the O(E) gather stage is the one whose input is the edge table's
~GBs; cinfo/argmax move O(V); the write stage has the parquet sink.

Usage: python scripts/profile_louvain_stages.py [--cpus 32]
       [--vertices 4194304] [--avg-degree 16] [--iters 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rest(url):
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.load(r)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--vertices", type=int, default=1 << 22)
    ap.add_argument("--avg-degree", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--driver-mem",
        default="8g",
        help="JVM heap; 'auto' = 2g/core (executor-faithful: a 4N cluster "
        "brings 4x memory with its 4x cores). 8g reproduces the early "
        "round-5 profile.",
    )
    args = ap.parse_args()
    if args.driver_mem == "auto":
        args.driver_mem = f"{2 * args.cpus}g"
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.driver_mem

    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"

    from pyspark.sql import functions as F

    from grappolo_spark.graph import Graph
    from grappolo_spark.operators.louvain import louvain_one_phase
    from grappolo_spark.session import get_spark

    spark = get_spark(
        app_name=f"louvain-stages-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={args.cpus} "
                f"-XX:ConcGCThreads={max(1, args.cpus // 4)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = args.vertices
    raw = (
        spark.range(n * args.avg_degree)
        .select(
            (F.pmod(F.xxhash64("id", F.lit(args.seed)), F.lit(n))).alias("src"),
            (F.pmod(F.xxhash64("id", F.lit(args.seed + 1)), F.lit(n))).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    g = Graph.from_edgelist(raw)
    edges = g.edges.repartition(args.partitions, "src").persist()
    n_edges = edges.count()
    g = Graph(edges=edges, unweighted=g.unweighted)
    print(f"# edges={n_edges}", file=sys.stderr, flush=True)

    t0 = time.time()
    res = louvain_one_phase(g, max_iters=args.iters, thresh=-1e9)
    res.assignment.count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "edges": n_edges,
                "vertices": args.vertices,
                "iters": res.iterations,
                "seconds": round(dt, 3),
                "edges_per_sec_superstep": round(
                    n_edges * res.iterations / dt, 1
                ),
            }
        ),
        flush=True,
    )

    ui = spark.sparkContext.uiWebUrl
    app = rest(f"{ui}/api/v1/applications")[0]["id"]
    import datetime

    def ts(s):
        v = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not v:
            return 0.0
        return datetime.datetime.fromisoformat(
            v.replace("GMT", "+00:00")
        ).timestamp()

    # every COMPLETE stage launched inside the kernel window, ranked by
    # executor-time sum: the dominant stages of the whole 2-iteration run
    # (commit jobs fuse gather/cinfo/argmax/write into one action, so the
    # roles are identified by the byte profile, not by job boundaries)
    stages = [
        s
        for s in rest(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
        if ts(s) >= t0
    ]
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    rows = [
        {
            "stage": s["stageId"],
            "name": (s["name"] or "").split(" at ")[0],
            "tasks": s["numCompleteTasks"],
            "cpu_sum_s": round((s.get("executorRunTime") or 0) / 1000.0, 1),
            "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
            "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
            "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
            "spill_mem_mb": round((s.get("memoryBytesSpilled") or 0) / 1e6, 1),
            "spill_disk_mb": round((s.get("diskBytesSpilled") or 0) / 1e6, 1),
        }
        for s in stages[:15]
    ]
    total_cpu = round(
        sum((s.get("executorRunTime") or 0) for s in stages) / 1000.0, 1
    )
    print(json.dumps({"total_stage_cpu_s": total_cpu, "top_stages": rows}, indent=1))
    spark.stop()
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main() or 0)
