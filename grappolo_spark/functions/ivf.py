"""IVF (inverted-file) approximate nearest neighbour over an embedding column.

The scale path the brief names alongside LSH: partition the corpus into k
coarse cells (k-means on cosine geometry), store each vector in its cell's
inverted list, and at query time score only the lists of the ``nprobe``
closest centroids — corpus work per query drops from O(N) to
O(N * nprobe / k) while the index build is a few Lloyd iterations of
groupBy-average.

Spark shape (all stages distributed):
- **train**: deterministic seeding (hash-ranked sample of k vectors — no
  RNG, reproducible across runs/executors), then ``lloyd_iters`` rounds of
  {broadcast centroids -> per-batch numpy argmax -> groupBy(cell) avg}.
- **index**: one pass assigning every vector to its cell (mapInPandas,
  broadcast centroids), persisted/bucketable by cell id.
- **query**: per query batch pick top-``nprobe`` cells (tiny k x dim numpy
  product), join against the inverted lists on cell id (an equi-join — the
  physical plan is a hash join on a low-cardinality key, never all-pairs),
  score with one BLAS matmul per (query-batch, cell) group, merge top-k.

Rounding/tie-break match the exact kernels (6dp, neighbor-id asc) so recall
is measured against ``cosine_topk`` apples-to-apples.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return mat / n


def train_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    lloyd_iters: int = 3,
    seed: int = 17,
) -> np.ndarray:
    """k x dim centroid matrix (unit-normalized — cosine k-means)."""
    spark = df.sparkSession
    # deterministic seeding: the k vectors with the smallest xxhash64(id)
    seeds = (
        df.select(id_col, vec_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("long"), F.lit(seed)))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    cents = _normalize(np.array([r[vec_col] for r in seeds], dtype=np.float64))
    for _ in range(lloyd_iters):
        bc = spark.sparkContext.broadcast(cents)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            for b in batches:
                mat = _normalize(np.array(list(b["_v"]), dtype=np.float64))
                cell = (mat @ c.T).argmax(axis=1)
                for j in np.unique(cell):
                    sub = mat[cell == j]
                    yield pd.DataFrame(
                        {
                            "cell": [int(j)],
                            "n": [len(sub)],
                            "vsum": [sub.sum(axis=0).tolist()],
                        }
                    )

        # Lloyd update as a NARROW plan: posexplode the per-partition
        # partial sums and aggregate per (cell, dim) — one hash-agg over
        # k*dim rows — instead of building dim-many F.sum(vsum[i]) columns
        # (the wide-plan shape gets pathological past ~1k dims: one
        # projection column + one aggregate buffer per dimension)
        dim_sums = (
            df.select(F.col(vec_col).alias("_v"))
            .mapInPandas(assign, schema="cell int, n long, vsum array<double>")
            .select("cell", "n", F.posexplode("vsum").alias("dim", "s"))
            # every exploded row carries its partial's n, so sum(n) per
            # (cell, dim) is the cell's total count (identical across dims)
            .groupBy("cell", "dim")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()
        )
        new = cents.copy()
        for c in {r["cell"] for r in dim_sums if r["n"]}:
            new[c] = 0.0
        for r in dim_sums:
            if r["n"]:
                new[r["cell"], r["dim"]] = r["s"] / r["n"]
        cents = _normalize(new)
    return cents


def ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, id, vec): the inverted lists — one scan, broadcast centroids."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for b in batches:
            mat = _normalize(np.array(list(b[vec_col]), dtype=np.float64))
            cell = (mat @ c.T).argmax(axis=1).astype("int32")
            yield pd.DataFrame(
                {"cell": cell, "id": b[id_col].to_numpy(), "vec": b[vec_col]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, schema="cell int, id long, vec array<float>"
    )


def ivf_cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 3,
    queries: DataFrame | None = None,
    centroids: np.ndarray | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine): IVF-approximate top-k.

    Pass a pre-trained ``centroids`` / pre-built ``index`` to amortize the
    build across query batches (the production pattern); otherwise both are
    derived from ``df``.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if centroids is None:
        centroids = train_centroids(df, id_col, vec_col, num_cells, lloyd_iters)
    if index is None:
        index = ivf_index(df, centroids, id_col, vec_col)
    bc = spark.sparkContext.broadcast(centroids)
    q = (queries if queries is not None else df).select(id_col, vec_col)

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        p = min(nprobe, len(c))
        for b in batches:
            mat = _normalize(np.array(list(b[vec_col]), dtype=np.float64))
            sims = mat @ c.T
            top = np.argsort(-sims, axis=1)[:, :p]
            n = len(b)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(b[id_col].to_numpy(), p),
                    "qvec": [v for v in b[vec_col] for _ in range(p)],
                    "cell": top.reshape(n * p).astype("int32"),
                }
            )

    probed = q.mapInPandas(
        probes, schema="query_id long, qvec array<float>, cell int"
    )
    # candidate generation: equi-join on cell id — never all-pairs
    cand = probed.join(index, "cell").filter(
        F.col("query_id") != F.col("id")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            qm = np.array(list(b["qvec"]), dtype=np.float64)
            cm = np.array(list(b["vec"]), dtype=np.float64)
            qn = np.sqrt((qm * qm).sum(axis=1))
            cn = np.sqrt((cm * cm).sum(axis=1))
            cos = np.round((qm * cm).sum(axis=1) / (qn * cn), 6)
            yield pd.DataFrame(
                {
                    "query_id": b["query_id"],
                    "neighbor_id": b["id"],
                    "cosine": cos,
                }
            )

    scored = cand.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )
