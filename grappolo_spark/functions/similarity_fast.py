"""Vectorized (Arrow/numpy) brute-force cosine top-k.

The HOF-expression kernel in similarity.py is exact and oracle-friendly but
evaluates interpreted lambda expressions per pair — FLOP-starved at scale.
Two numpy kernels, both bit-identical to ``similarity.cosine_topk`` (same
6dp rounding before ranking, same id tie-break):

- ``cosine_topk_np``      : broadcasts the CORPUS matrix, maps over query
  batches. Fine while the corpus fits in executor memory (~10M x 128);
  the full-corpus ``collect`` makes it a small/medium-scale tool.
- ``cosine_topk_sharded`` : the 100 TB orientation — broadcasts the
  (small) QUERY matrix, streams the corpus through ``mapInPandas``
  (query-blocked BLAS matmuls + vectorized top-k per Arrow batch, ~32 MB
  of temporaries per task no matter the query count), then merges the
  per-batch winners with a grouped top-k. The corpus is never collected;
  driver/executor memory is O(|queries| * dim), the scan is fully
  distributed and projection-pruned, and the merge input is only
  (#batches * k) rows per query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hard ceiling on rows collected to the driver for a broadcast side.
# 1M rows x 128 float64 dims ~= 1 GB broadcast — the upper edge of sane.
# Above it the caller must route to the bucketed paths (lsh_cosine_topk /
# ivf_cosine_topk), which never collect; a silent collect of the "small"
# side is exactly the 100 TB driver-OOM the round-2 review flagged.
MAX_COLLECT_ROWS = 1_000_000

# Score-matrix block budget, in float64 elements (~32 MB): per-task
# temporaries of the brute-force kernels stay near this bound no matter
# how many queries broadcast or how wide an Arrow batch arrives. Tests
# shrink it to force the multi-chunk merge path on tiny data.
BLOCK_ELEMS = 4_000_000


def _batch_topk(
    cos: np.ndarray, row_ids: np.ndarray, col_ids: np.ndarray, k: int
) -> pd.DataFrame:
    """Exact per-row top-k of a ROUNDED cosine matrix under the total
    order (cosine desc, neighbor id asc), excluding self pairs.

    Replaces the original per-row ``mask + full-row lexsort`` loop, which
    was the kernel's real cost at scale (a 5000-query x 1500-candidate
    batch spends ~80% of its wall time in 5000 python-level full-row
    sorts, not in the BLAS matmul). Here selection is vectorized:

    - self pairs (col id == row id) are dropped by writing ``-inf``;
    - one ``argpartition`` per batch finds each row's k-th largest value;
    - every entry >= that threshold is a candidate — a superset of the
      true top-k, because under (cos desc, id asc) all of the top-k have
      cosine >= the k-th largest cosine value;
    - only the small candidate sets (k plus boundary ties) reach
      python-level lexsort for the id tie-break.

    Bit-identical output (``cos`` is already rounded, so selection and
    tie-break see exactly the values the original loop saw); the one
    deliberate divergence is degenerate NaN cosines (zero-norm vectors),
    which are mapped to ``-inf`` — both variants keep them out of any
    full top-k, they differ only in the padding of under-full rows.

    Mutates ``cos`` in place (self-mask / NaN rewrite). Returns the flat
    (query_id, neighbor_id, cosine) frame.
    """
    nq, n = cos.shape
    np.nan_to_num(cos, copy=False, nan=-np.inf)
    # self-mask: for every corpus column whose id appears among the query
    # rows, kill ALL matching rows — duplicate query ids in a block are
    # legal (a caller may score the same id twice), and a single-hit
    # searchsorted would leave the duplicates' self pairs at cosine 1.0.
    # left/right bracket the (contiguous) duplicate run in the sorted id
    # view; the range gather below is fully vectorized.
    order_r = np.argsort(row_ids)
    sorted_rids = row_ids[order_r]
    left = np.searchsorted(sorted_rids, col_ids, side="left")
    right = np.searchsorted(sorted_rids, col_ids, side="right")
    cnt = right - left
    total = int(cnt.sum())
    if total:
        cols_rep = np.repeat(np.arange(n), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(total) - np.repeat(offs, cnt)
        cos[order_r[np.repeat(left, cnt) + within], cols_rep] = -np.inf
    kk = min(k, n)
    if kk < n:
        part = np.argpartition(cos, n - kk, axis=1)[:, n - kk:]
        thr = cos[np.arange(nq)[:, None], part].min(axis=1)
    else:
        thr = cos.min(axis=1) if n else np.full(nq, -np.inf)
    ge = cos >= thr[:, None]
    rows, cols = np.nonzero(ge)
    cand_ids = col_ids[cols]
    cand_cos = cos[rows, cols]
    # one global lexsort of the (k + boundary ties) x nq candidate pool —
    # primary key row, then the (cos desc, id asc) tie-break — then keep
    # each row's first k by rank-within-segment; no python-level loop
    order = np.lexsort((cand_ids, -cand_cos, rows))
    counts = ge.sum(axis=1)
    rank = np.arange(len(rows)) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts
    )
    keep = order[rank < k]
    sel_cos = cand_cos[keep]
    real = sel_cos != -np.inf  # under-full rows: drop self/NaN padding
    keep = keep[real]
    return pd.DataFrame(
        {
            "query_id": row_ids[rows[keep]],
            "neighbor_id": cand_ids[keep],
            "cosine": cand_cos[keep],
        }
    )


def _np_dtype(dtype: str):
    """Scoring dtype for the brute-force kernels.

    ``"float64"`` (default) is the oracle path: bit-identical to the HOF
    kernel in similarity.py. ``"float32"`` halves DRAM traffic and
    broadcast size — the regime a shared memory bus actually scales in
    (the round-4 weak-scaling measurements were bandwidth-limited) — at
    the cost of ~1e-6-grade cosine drift: a 128-dim float32 dot carries
    relative error O(sqrt(dim))*eps_f32 ≈ 1e-6, so after the 6dp rounding
    most pairs are identical and near-tie pairs may differ by one 1e-6
    grid step (occasionally reordering neighbors whose true cosines tie
    at that grid). Parity/recall is pinned by
    tests/test_similarity_fast.py; keep float64 anywhere results feed an
    exact-match oracle.
    """
    if dtype == "float32":
        return np.float32
    if dtype == "float64":
        return np.float64
    raise ValueError(f"dtype must be 'float64' or 'float32', got {dtype!r}")


def _guard_collect_side(df: DataFrame, side: str, limit: int, alternatives: str) -> None:
    """Raise before collecting an unexpectedly large broadcast side.

    One count against the (usually already-pruned) side — cheap relative to
    the matmul work that follows, and it turns a driver OOM at scale into
    an actionable error."""
    n = df.count()
    if n > limit:
        raise ValueError(
            f"{side} has {n} rows, above the broadcast-collect bound "
            f"({limit}); this kernel collects the {side} to the driver. "
            f"Use {alternatives} for sides this large, or raise "
            f"max_collect_rows explicitly if the driver really has room."
        )


def cosine_topk_np(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
    max_collect_rows: int = MAX_COLLECT_ROWS,
    block_elems: int = BLOCK_ELEMS,
    dtype: str = "float64",
) -> DataFrame:
    """(query_id, neighbor_id, cosine): exact top-k, numpy-batched.

    Matches similarity.cosine_topk bit-for-bit: double-precision dot/norms,
    cosine rounded to 6dp BEFORE ranking, ties by neighbor id.
    ``dtype="float32"`` opts into the half-bandwidth scoring tier
    (:func:`_np_dtype` — ~1e-6 cosine drift, float64 stays the default
    and the oracle path).
    """
    ftype = _np_dtype(dtype)
    spark = df.sparkSession
    _guard_collect_side(
        df.select(id_col), "corpus", max_collect_rows,
        "cosine_topk_sharded (streams the corpus)",
    )
    rows = df.select(id_col, vec_col).collect()
    if not rows:  # empty corpus: no row can have a neighbor
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=ftype)
    norms = np.sqrt((mat * mat).sum(axis=1, dtype=ftype)).astype(ftype)
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    q = (queries if queries is not None else df).select(id_col, vec_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for b in batches:
            qids = b[id_col].to_numpy(dtype=np.int64)
            qmat = np.array(list(b[vec_col]), dtype=ftype)
            if qmat.size == 0:
                continue
            qnorms = np.sqrt((qmat * qmat).sum(axis=1, dtype=ftype)).astype(ftype)
            # block the CORPUS axis so the score matrix stays ~32 MB per
            # task (a 10k-query Arrow batch against the 1M-row broadcast
            # bound would otherwise materialize an 80 GB matrix); the
            # expression shape a/(|q|·|c|) — then round — is untouched, so
            # values stay bit-identical to the HOF kernel, and the global
            # top-k is contained in the union of per-chunk top-ks, merged
            # below under the same (cos desc, id asc) order
            cblk = max(1, block_elems // max(1, len(qids)))
            parts = []
            for lo in range(0, len(b_ids), cblk):
                hi = lo + cblk
                cos = qmat @ b_mat[lo:hi].T
                np.divide(
                    cos, np.outer(qnorms, b_norms[lo:hi]), out=cos
                )
                if cos.dtype != np.float64:
                    # float32 tier: score in f32 (the bandwidth win), but
                    # round/rank/emit on the f64 grid the schema declares
                    cos = cos.astype(np.float64)
                np.round(cos, 6, out=cos)
                parts.append(_batch_topk(cos, qids, b_ids[lo:hi], k))
            if not parts:  # empty corpus: no candidate rows for this batch
                continue
            if len(parts) == 1:
                yield parts[0]
                continue
            cand = pd.concat(parts, ignore_index=True)
            cand.sort_values(
                ["query_id", "cosine", "neighbor_id"],
                ascending=[True, False, True],
                inplace=True,
                kind="mergesort",
            )
            yield cand.groupby("query_id", sort=False).head(k)

    return q.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )


def cosine_topk_sharded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    queries: DataFrame | None = None,
    max_collect_rows: int = MAX_COLLECT_ROWS,
    block_elems: int = BLOCK_ELEMS,
    dtype: str = "float64",
) -> DataFrame:
    """(query_id, neighbor_id, cosine): exact top-k with a distributed
    corpus scan — the scale path. ``dtype="float32"`` opts into the
    half-bandwidth scoring tier (:func:`_np_dtype`; float64 stays the
    default and the oracle path).

    Queries are collected and broadcast — and that bound is ENFORCED: the
    query side is counted first and a query set above ``max_collect_rows``
    raises with a pointer to the bucketed paths (LSH / IVF) instead of
    OOMing the driver at scale. Each corpus Arrow batch contributes its
    local top-k per query, and a grouped window takes the global top-k of
    the union — exact, because the global top-k is contained in the union
    of per-batch top-ks. Matches ``similarity.cosine_topk`` bit-for-bit.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    q_side = (queries if queries is not None else df).select(id_col, vec_col)
    _guard_collect_side(
        q_side.select(id_col), "query side", max_collect_rows,
        "lsh_cosine_topk or ivf_cosine_topk (bucketed, no collect)",
    )
    q_rows = q_side.collect()
    if not q_rows:  # empty query set: empty result, same schema
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    ftype = _np_dtype(dtype)
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[1] for r in q_rows], dtype=ftype)
    qnorms = np.sqrt((qmat * qmat).sum(axis=1, dtype=ftype)).astype(ftype)
    bc = spark.sparkContext.broadcast((qids, qmat, qnorms))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_qnorms = bc.value
        for b in batches:
            cids = b[id_col].to_numpy(dtype=np.int64)
            cmat = np.array(list(b[vec_col]), dtype=ftype)
            if cmat.size == 0:
                continue
            cnorms = np.sqrt((cmat * cmat).sum(axis=1, dtype=ftype)).astype(ftype)
            # block the QUERY axis so per-task temporaries stay ~32 MB
            # (cos chunk + outer-norm chunk) no matter how many queries
            # broadcast: an unblocked |Q| x batch score matrix is
            # O(|Q| * rows) per task, and with every core running one, the
            # box hits the DRAM/allocator wall before it hits compute
            # (measured: 32 tasks x 250 MB temporaries ran 6x slower per
            # pair than 8 x 62 MB). Values are bit-identical — dot, outer
            # divide, and round are row-wise element-wise, so row blocks
            # see exactly the full-matrix arithmetic.
            blk = max(1, block_elems // max(1, len(cids)))
            for lo in range(0, len(b_qids), blk):
                hi = lo + blk
                cos = b_qmat[lo:hi] @ cmat.T
                np.divide(
                    cos, np.outer(b_qnorms[lo:hi], cnorms), out=cos
                )
                if cos.dtype != np.float64:
                    # float32 tier: f32 matmul/divide, f64 round/rank/emit
                    cos = cos.astype(np.float64)
                np.round(cos, 6, out=cos)
                yield _batch_topk(cos, b_qids[lo:hi], cids, k)

    cand = df.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    num_planes: int = 10,
    num_tables: int = 4,
    seed: int = 5,
    max_collect_rows: int = MAX_COLLECT_ROWS,
) -> DataFrame:
    """(id_a, id_b, cosine) with id_a < id_b and cosine >= threshold —
    the embedding-cosine near-duplicate tier of the dedup family.

    - ``method="exact"``: the oracle baseline. The normalized corpus
      broadcasts; every corpus Arrow batch scores itself against it with
      one BLAS matmul and emits only the >= threshold pairs, so the O(N^2)
      scoring is distributed and the OUTPUT (near-dup pairs, sparse by
      construction) is what shuffles. Bounded by the broadcast like
      ``cosine_topk_np`` — fine to ~10M x 128.
    - ``method="lsh"``: the scale path. Multi-table SRP buckets generate
      candidates (equi-join, never all-pairs), exact cosine verifies the
      threshold; recall follows the OR-amplified collision probability.
    """
    if method == "lsh":
        from grappolo_spark.functions.similarity import _DOT, _NORM, srp_buckets

        cand = None
        for t in range(num_tables):
            b = srp_buckets(df, id_col, vec_col, num_planes, seed + 101 * t)
            a = b.select(F.col("id").alias("id_a"), "bucket")
            c = (
                a.join(b.select(F.col("id").alias("id_b"), "bucket"), "bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
            )
            cand = c if cand is None else cand.unionByName(c)
        cand = cand.distinct()
        va = df.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("_va"),
            F.expr(_NORM.format(a=vec_col)).alias("_na"),
        )
        vb = df.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("_vb"),
            F.expr(_NORM.format(a=vec_col)).alias("_nb"),
        )
        return (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.expr(_DOT.format(a="_va", b="_vb"))
                    / (F.col("_na") * F.col("_nb")),
                    6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    spark = df.sparkSession
    _guard_collect_side(
        df.select(id_col), "corpus", max_collect_rows,
        'embedding_near_dup_pairs(method="lsh") (bucketed, no collect)',
    )
    rows = df.select(id_col, vec_col).collect()
    if not rows:  # empty corpus: no pairs
        return spark.createDataFrame(
            [], "id_a long, id_b long, cosine double"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat, c_norms = bc.value
        for b in batches:
            qids = b[id_col].to_numpy(dtype=np.int64)
            qmat = np.array(list(b[vec_col]), dtype=np.float64)
            if qmat.size == 0:
                continue
            qnorms = np.sqrt((qmat * qmat).sum(axis=1))
            cos = np.round((qmat @ c_mat.T) / np.outer(qnorms, c_norms), 6)
            qi, cj = np.nonzero((cos >= threshold) & (qids[:, None] < c_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": qids[qi],
                    "id_b": c_ids[cj],
                    "cosine": cos[qi, cj],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, schema="id_a long, id_b long, cosine double"
    )
