import os

from grappolo_spark.operators.pagerank import pagerank
from grappolo_spark.sources import fixtures


def test_pagerank_resume_matches_uninterrupted(spark, tmp_path):
    """Kill/restart semantics: running 4 supersteps, then resuming the same
    run_dir for the remaining 6, must equal a straight 10-superstep run."""
    g = fixtures.karate(spark)
    full = {r.v: r.rank for r in pagerank(g, max_iters=10).collect()}

    run_dir = str(tmp_path / "pr_run")
    pagerank(g, max_iters=4, run_dir=run_dir)  # "crashes" after 4 supersteps
    assert os.path.isdir(os.path.join(run_dir, "step=000003"))
    resumed = {
        r.v: r.rank for r in pagerank(g, max_iters=10, run_dir=run_dir).collect()
    }
    assert all(abs(full[v] - resumed[v]) < 1e-12 for v in full)


def test_superstep_metrics_sidecar(spark, tmp_path):
    import json

    g = fixtures.karate(spark)
    run_dir = str(tmp_path / "pr_m")
    pagerank(g, max_iters=3, run_dir=run_dir)
    with open(os.path.join(run_dir, "step=000002", "_METRICS.json")) as f:
        payload = json.load(f)
    # per-partition lineage + per-superstep metrics history
    assert payload["partitions"] and all("rows" in p for p in payload["partitions"])
    assert len(payload["history"]) == 3
