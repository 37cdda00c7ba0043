"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction the
same bench job runs at two parallelism levels — local[8] (N) and local[32]
(4N) — on the same input, in fresh JVMs. Reports per-query and headline
throughput at both plus scaling efficiency:

    efficiency(q) = T_N(q) / (4 * T_4N(q))

Writes SCALING.json and prints a markdown table to append to BASELINE.md.

Usage: python scripts/scaling_bench.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "-u", "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    args = ap.parse_args()

    lo = run_bench(args.n, args.sf_dir)
    print(f"# local[{args.n}] done: {lo['value']}s", file=sys.stderr, flush=True)
    hi = run_bench(args.n4, args.sf_dir)
    print(f"# local[{args.n4}] done: {hi['value']}s", file=sys.stderr, flush=True)

    factor = args.n4 / args.n
    rows = []
    for q in lo["queries"]:
        t_lo, t_hi = lo["queries"][q], hi["queries"][q]
        rows.append((q, t_lo, t_hi, round(t_lo / (factor * t_hi), 3)))
    overall = round(lo["value"] / (factor * hi["value"]), 3)

    result = {
        "sf": args.sf_dir,
        "n_cores": args.n,
        "n4_cores": args.n4,
        "total_sec_n": lo["value"],
        "total_sec_4n": hi["value"],
        "edges": lo["edges"],
        "edges_per_sec_superstep_n": lo["edges_per_sec_superstep"],
        "edges_per_sec_superstep_4n": hi["edges_per_sec_superstep"],
        "scaling_efficiency_overall": overall,
        "per_query": {q: {"sec_n": a, "sec_4n": b, "efficiency": e} for q, a, b, e in rows},
    }
    with open("SCALING.json", "w") as f:
        json.dump(result, f, indent=2)

    print(f"\n| query | local[{args.n}] s | local[{args.n4}] s | efficiency (T_N/(4·T_4N)) |")
    print("|---|---|---|---|")
    for q, a, b, e in rows:
        print(f"| {q} | {a} | {b} | {e} |")
    print(f"| **total** | {lo['value']} | {hi['value']} | **{overall}** |")
    print(
        f"\nPageRank throughput: {lo['edges_per_sec_superstep_n'] if 'edges_per_sec_superstep_n' in lo else lo['edges_per_sec_superstep']:.0f} edges/s/superstep at local[{args.n}] vs "
        f"{hi['edges_per_sec_superstep']:.0f} at local[{args.n4}]"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
