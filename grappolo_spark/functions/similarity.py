"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``      : brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``zip_with``/``aggregate`` HOFs in double
  precision (element order fixed → bit-reproducible, so a DuckDB oracle can
  match values exactly after rounding).
- ``lsh_cosine_topk``  : the scale path — sign-random-projection buckets
  (deterministic hash projections); only bucket-colliding pairs are scored.
  Trades recall for a candidate set ~linear in rows; at 100 TB the
  brute-force quadratic join is infeasible, the LSH one is a bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double)))"


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", F.expr(_NORM.format(a=vec_col)))


def cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine): exact top-k neighbors per query.

    ``queries`` defaults to the corpus itself (all-pairs top-k, self
    excluded). Ties and near-ties are broken by neighbor id for determinism.
    """
    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    q = with_norm(queries if queries is not None else df, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"),
    )
    scored = (
        q.crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            # round BEFORE ranking: keeps the ordering reproducible across
            # engines whose sum order differs by ~1e-15 (oracle match)
            F.round(
                F.expr(_DOT.format(a="_va", b="_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def srp_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 5,
) -> DataFrame:
    """(id, bucket): sign-random-projection bucket key.

    Plane p's normal vector component j = a deterministic pseudo-random in
    [-1,1) derived from xxhash64(j, seed+p) — reproducible across runs and
    executors, no stored model. sign(dot) per plane packs into an int key.
    """
    bits = []
    for p in range(num_planes):
        dot = F.expr(
            f"""
            aggregate(
              zip_with({vec_col}, sequence(0, size({vec_col}) - 1),
                       (x, j) -> cast(x as double) *
                         (cast(xxhash64(j, {seed + p}) % 1000000 as double) / 1000000.0)),
              cast(0.0 as double), (acc, v) -> acc + v)
            """
        )
        bits.append(F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(F.col(id_col).alias("id"), bucket.cast("int").alias("bucket"))


def lsh_cosine_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    *,
    num_planes: int = 8,
    seed: int = 5,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an SRP bucket in at
    least one of ``num_tables`` independent hash tables (OR-amplification).

    ``num_planes``/``seed``/``num_tables`` are keyword-only: the trio has
    been reordered across revisions, and a positional call that silently
    rebinds (e.g. a 6th positional arg landing on ``seed`` instead of
    ``num_tables``) changes results without any error — a ``TypeError`` at
    the call site is the safe failure. The default of 4 tables (vs the
    original single table) is intentional: same seed, higher recall,
    different candidate sets — callers needing the old behavior pass
    ``num_tables=1``.

    A single table's recall sags as the corpus grows (true neighbors split
    across bucket boundaries); unioning candidates over T independent
    plane sets raises recall to 1 − (1 − p^b)^T while candidate generation
    stays a bucket equi-join per table — never all-pairs. Candidates are
    deduped before scoring so each pair is scored once.
    """
    base_v = with_norm(df, vec_col).select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    cand = None
    for t in range(num_tables):
        b = srp_buckets(df, id_col, vec_col, num_planes, seed + 101 * t)
        a = b.select(F.col("id").alias("qid"), "bucket")
        c = (
            a.join(b.select(F.col("id").alias("nid"), "bucket"), "bucket")
            .filter(F.col("qid") != F.col("nid"))
            .select("qid", "nid")
        )
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    scored = (
        cand.join(base_v.select(F.col("nid").alias("qid"),
                                F.col("_vb").alias("_va"),
                                F.col("_nb").alias("_na")), "qid")
        .join(base_v, "nid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            (
                F.expr(_DOT.format(a="_va", b="_vb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )
