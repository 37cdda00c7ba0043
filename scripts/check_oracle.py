"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 (or --sf-dir) against its
``oracle_sql()`` DuckDB twin: row count, column names, and order-insensitive
value comparison. Rows-only entries (no oracle) just report row counts.

Usage: python scripts/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(x):
    if isinstance(x, float):
        return round(x, 6)
    return x


def compare(name, sdf, con, sql):
    spark_rows = [tuple(norm_cell(c) for c in r) for r in sdf.collect()]
    spark_cols = sorted(sdf.columns)
    idx = [sdf.columns.index(c) for c in spark_cols]
    spark_sorted = sorted(tuple(r[i] for i in idx) for r in spark_rows)

    res = con.sql(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows = [tuple(norm_cell(c) for c in r) for r in res.fetchall()]
    duck_cols = sorted(duck_cols_raw)
    didx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_sorted = sorted(tuple(r[i] for i in didx) for r in duck_rows)

    problems = []
    if spark_cols != duck_cols:
        problems.append(f"schema: spark={spark_cols} duck={duck_cols}")
    if len(spark_sorted) != len(duck_sorted):
        problems.append(f"rows: spark={len(spark_sorted)} duck={len(duck_sorted)}")
    if not problems and spark_sorted != duck_sorted:
        diffs = [
            (a, b) for a, b in zip(spark_sorted, duck_sorted) if a != b
        ][:3]
        problems.append(f"values differ, first diffs: {diffs}")
    return problems, len(spark_sorted)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from grappolo_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir)
            if name in oracles:
                problems, n = compare(name, sdf, con, oracles[name])
                status = "OK" if not problems else "FAIL"
                print(f"{status:4} {name:24} rows={n:<8} {time.time()-t0:6.1f}s "
                      + ("; ".join(problems) if problems else ""), flush=True)
                if problems:
                    failed.append(name)
            else:
                n = sdf.count()
                print(f"ROWS {name:24} rows={n:<8} {time.time()-t0:6.1f}s (no oracle)",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name:24} {time.time()-t0:6.1f}s {type(e).__name__}: {e}",
                  flush=True)
            failed.append(name)
    # orphan oracles (oracle without query) are contract bugs too
    for name in oracles:
        if name not in qs:
            print(f"FAIL {name:24} oracle has no matching query", flush=True)
            failed.append(name)
    print(("ALL OK" if not failed else f"FAILED: {failed}"), flush=True)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
