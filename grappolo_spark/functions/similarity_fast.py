"""Vectorized (Arrow/numpy) brute-force cosine top-k.

The HOF-expression kernel in similarity.py is exact and oracle-friendly but
evaluates interpreted lambda expressions per pair — FLOP-starved at scale.
This variant broadcasts the (normalized) corpus matrix to executors and
scores each Arrow batch of queries with one numpy matmul (BLAS), returning
identical results (same rounding + tie-break). ~10-50x faster and scales
with cores, at the cost of requiring the corpus matrix to fit in executor
memory (fine up to ~10M x 128 float32 = 5 GB; shard the corpus and merge
top-k per shard beyond that).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine_topk_np(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine): exact top-k, numpy-batched.

    Matches similarity.cosine_topk bit-for-bit: double-precision dot/norms,
    cosine rounded to 6dp BEFORE ranking, ties by neighbor id.
    """
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    q = (queries if queries is not None else df).select(id_col, vec_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for b in batches:
            qids = b[id_col].to_numpy(dtype=np.int64)
            qmat = np.array(list(b[vec_col]), dtype=np.float64)
            qnorms = np.sqrt((qmat * qmat).sum(axis=1))
            cos = np.round(
                (qmat @ b_mat.T) / np.outer(qnorms, b_norms), 6
            )
            out_q, out_n, out_c = [], [], []
            for i, qid in enumerate(qids):
                row = cos[i]
                mask = b_ids != qid
                cand_ids = b_ids[mask]
                cand_cos = row[mask]
                # top-k by (cosine desc, id asc): lexsort on (-cos, id)
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(cand_ids[order])
                out_c.extend(cand_cos[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    return q.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
