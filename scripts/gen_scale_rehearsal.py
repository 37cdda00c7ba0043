"""Deterministic 10x upscale of sf0.1 by replication with key offsets —
scale-rehearsal data (NOT driver testdata; /root/testdata stays untouched)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from grappolo_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1ish"
N = 10
spark = get_spark(app_name="gen", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

offsets = {
    "l_orderkey": 10_000_000, "o_orderkey": 10_000_000,
    "o_custkey": 20_000, "c_custkey": 20_000,
    "l_suppkey": 2_000, "s_suppkey": 2_000,
    "l_partkey": 30_000, "p_partkey": 30_000,
    "doc_id": 10_000, "vec_id": 10_000,
}
for t in ["lineitem", "orders", "customer", "supplier", "part",
          "documents", "embeddings"]:
    df = spark.read.parquet(f"{SRC}/{t}.parquet")
    parts = []
    for i in range(N):
        sel = [
            (F.col(c) + F.lit(i * offsets[c])).alias(c) if c in offsets
            else F.col(c)
            for c in df.columns
        ]
        parts.append(df.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    print(t, "done")
# unused-by-bench tables: straight copies so readers don't 404
for t in ["region", "nation", "events"]:
    spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    print(t, "copied")
spark.stop()
