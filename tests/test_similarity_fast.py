import numpy as np
from pyspark.sql import functions as F

from grappolo_spark.functions.similarity import cosine_topk
from grappolo_spark.functions.similarity_fast import cosine_topk_np


def test_numpy_topk_matches_hof_kernel(spark):
    rng = np.random.RandomState(11)
    vecs = rng.rand(40, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    q = df.filter(F.col("vec_id") % 4 == 0)
    a = sorted(map(tuple, cosine_topk(df, k=5, queries=q).collect()))
    b = sorted(map(tuple, cosine_topk_np(df, k=5, queries=q).collect()))
    assert a == b


def test_numpy_topk_on_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 10 == 0)
    a = sorted(map(tuple, cosine_topk(emb, k=5, queries=q).collect()))
    b = sorted(map(tuple, cosine_topk_np(emb, k=5, queries=q).collect()))
    assert a == b


def test_sharded_topk_matches_hof_kernel(spark):
    from grappolo_spark.functions.similarity_fast import cosine_topk_sharded

    rng = np.random.RandomState(23)
    vecs = rng.rand(60, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(60)],
        "vec_id long, embedding array<float>",
    ).repartition(7)  # several corpus shards so the merge path is exercised
    q = df.filter(F.col("vec_id") % 5 == 0)
    a = sorted(map(tuple, cosine_topk(df, k=5, queries=q).collect()))
    b = sorted(map(tuple, cosine_topk_sharded(df, k=5, queries=q).collect()))
    assert a == b


def test_lsh_multi_table_recall(spark):
    """OR-amplification recall oracle: recall@5 vs the exact kernel must be
    high with 6 tables and no worse than a single table."""
    from grappolo_spark.functions.similarity import lsh_cosine_topk

    rng = np.random.RandomState(3)
    # 10 planted clusters x 8 members: near-duplicates within a cluster
    base = rng.rand(10, 16)
    rows = []
    for c in range(10):
        for m in range(8):
            v = base[c] + 0.01 * rng.rand(16)
            rows.append((c * 8 + m, v.astype("float32").tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.query_id, r.neighbor_id) for r in cosine_topk(df, k=5).collect()
    }

    def recall(num_tables):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_cosine_topk(
                df, k=5, num_planes=8, num_tables=num_tables
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r6 = recall(1), recall(6)
    assert r6 >= r1
    assert r6 >= 0.9
