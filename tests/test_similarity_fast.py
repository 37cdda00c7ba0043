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
