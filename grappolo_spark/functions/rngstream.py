"""Bit-parity MRG32k3a random vectors (L'Ecuyer RngStream).

The reference seeds every randomized kernel (distance-1 coloring
tie-breaks, vBase redistribution) from ``generateRandomNumbers()``
(`Utility/utilityFunctions.cpp:47-75`), which fills ``RandVec[i]`` with
draws from L'Ecuyer's RngStream package (`Utility/RngStream.cpp`): a
fixed package seed ``{1,2,3,4,5,6}``, one stream per OpenMP thread
(streams spaced 2^127 steps apart, in creation order), and a
``schedule(static)`` loop so thread ``t`` fills a contiguous chunk from
its own stream sequentially. Given ``(size, n_threads)`` the vector is
therefore fully deterministic — no data race touches it — and this
module reproduces it BIT-IDENTICALLY, distributed:

- driver side: exact integer matrix powers of the two published MRG32k3a
  companion matrices give each stream's start state (2^127-step jumps)
  and each worker block's offset state — O(streams + blocks) 3x3 modular
  matvecs, no sequential generation on the driver;
- worker side: blocks generate in float64 via ``mapInPandas``,
  vectorized ACROSS blocks (the recurrence is sequential within one).
  Every intermediate of the published double-precision recurrence is
  < 2^53 (max |a12*x| ≈ 6.03e15), so float64 arithmetic is exact and
  matches the C implementation bit for bit, including the
  truncate-toward-zero ``static_cast<long>(p1 / m1)`` reduction.

Constants and recurrence are from the published algorithm (P. L'Ecuyer,
"Good Parameters and Implementations for Combined Multiple Recursive
Random Number Generators", Oper. Res. 47(1), 1999; L'Ecuyer, Simard,
Chen, Kelton, "An Object-Oriented Random-Number Package with Many Long
Streams and Substreams", Oper. Res. 50(6), 2002). The jump matrices are
COMPUTED here by square-and-multiply rather than hard-coded, so the only
shared artifacts with any C implementation are the published constants.

Chunking note: OpenMP leaves ``schedule(static)``'s chunk split
implementation-defined up to "approximately equal"; this module uses the
libgomp/libomp convention (``q = size // nT``, ``r = size % nT``, the
first ``r`` threads take ``q + 1``), which is what the reference's gcc
builds execute. Parity claims are therefore per (size, n_threads) pair
under that convention.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

# published MRG32k3a constants
M1 = 4294967087  # 2^32 - 209
M2 = 4294944443  # 2^32 - 22853
A12, A13N = 1403580, 810728
A21, A23N = 527612, 1370589
NORM = 1.0 / (M1 + 1.0)

DEFAULT_PACKAGE_SEED = (1, 2, 3, 4, 5, 6)  # utilityFunctions.cpp:57

# companion matrices: state (x_n, x_{n+1}, x_{n+2}) -> one step forward
_MAT1 = ((0, 1, 0), (0, 0, 1), (M1 - A13N, A12, 0))
_MAT2 = ((0, 1, 0), (0, 0, 1), (M2 - A23N, 0, A21))


def _mat_mul(a, b, m: int):
    return tuple(
        tuple(sum(a[i][k] * b[k][j] for k in range(3)) % m for j in range(3))
        for i in range(3)
    )


def _mat_pow(mat, e: int, m: int):
    out = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    base = mat
    while e:
        if e & 1:
            out = _mat_mul(out, base, m)
        base = _mat_mul(base, base, m)
        e >>= 1
    return out


def _mat_vec(a, v: Sequence[int], m: int) -> Tuple[int, int, int]:
    return tuple(sum(a[i][k] * v[k] for k in range(3)) % m for i in range(3))


# the 2^127-step stream jump (computed once at import; ~130 3x3 modmuls)
_JUMP1 = _mat_pow(_MAT1, 1 << 127, M1)
_JUMP2 = _mat_pow(_MAT2, 1 << 127, M2)


def stream_starts(
    n_streams: int, seed: Sequence[int] = DEFAULT_PACKAGE_SEED
) -> list:
    """Start state of each RngStream in creation order.

    ``RngStream.cpp:303-322``: the package seed is the first stream's
    state; each constructor advances the package seed by 2^127 steps.
    Returns ``n_streams`` 6-tuples of ints.
    """
    s1, s2 = tuple(int(x) for x in seed[:3]), tuple(int(x) for x in seed[3:])
    out = []
    for _ in range(n_streams):
        out.append(s1 + s2)
        s1 = _mat_vec(_JUMP1, s1, M1)
        s2 = _mat_vec(_JUMP2, s2, M2)
    return out


def static_chunks(size: int, n_threads: int) -> list:
    """``schedule(static)`` contiguous chunk per thread (libgomp split):
    returns [(start, count), ...] of length n_threads (count may be 0)."""
    q, r = divmod(size, n_threads)
    out, pos = [], 0
    for t in range(n_threads):
        c = q + 1 if t < r else q
        out.append((pos, c))
        pos += c
    return out


def _advance(state: Sequence[int], steps: int):
    """Exact-integer jump: state after ``steps`` draws."""
    j1 = _mat_pow(_MAT1, steps, M1)
    j2 = _mat_pow(_MAT2, steps, M2)
    return _mat_vec(j1, state[:3], M1) + _mat_vec(j2, state[3:], M2)


def u01_sequence(state: Sequence[int], count: int) -> list:
    """Scalar exact-integer generator (oracle / tiny inputs): the next
    ``count`` U01 draws from ``state``. Integer arithmetic throughout —
    an independent code path from the workers' float64 kernel."""
    s = [int(x) for x in state]
    out = []
    for _ in range(count):
        p1 = (A12 * s[1] - A13N * s[0]) % M1
        s[0], s[1], s[2] = s[1], s[2], p1
        p2 = (A21 * s[5] - A23N * s[3]) % M2
        s[3], s[4], s[5] = s[4], s[5], p2
        out.append((p1 - p2) * NORM if p1 > p2 else (p1 - p2 + M1) * NORM)
    return out


def _gen_blocks(batches: Iterable) -> Iterator:
    """mapInPandas kernel: each input row is one block
    ``(start, count, s0..s5)``; generate all blocks of the batch in
    float64 LOCKSTEP (vectorized across blocks — the recurrence is
    sequential within a block, so the numpy axis is the block axis)."""
    import numpy as np
    import pandas as pd

    m1, m2 = float(M1), float(M2)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        counts = pdf["count"].to_numpy()
        n_blocks, width = len(pdf), int(counts.max())
        st = [pdf[f"s{i}"].to_numpy(dtype=np.float64).copy() for i in range(6)]
        out = np.empty((n_blocks, width), dtype=np.float64)
        for j in range(width):
            # component 1 (RngStream.cpp U01: exact in float64, trunc div)
            p1 = A12 * st[1] - A13N * st[0]
            p1 -= np.trunc(p1 / m1) * m1
            p1 += m1 * (p1 < 0.0)
            st[0], st[1] = st[1], st[2]
            st[2] = p1
            # component 2
            p2 = A21 * st[5] - A23N * st[3]
            p2 -= np.trunc(p2 / m2) * m2
            p2 += m2 * (p2 < 0.0)
            st[3], st[4] = st[4], st[5]
            st[5] = p2
            out[:, j] = np.where(p1 > p2, (p1 - p2) * NORM, (p1 - p2 + m1) * NORM)
        starts = pdf["start"].to_numpy()
        idx = np.concatenate([s + np.arange(c) for s, c in zip(starts, counts)])
        vals = np.concatenate([out[b, : counts[b]] for b in range(n_blocks)])
        yield pd.DataFrame({"i": idx.astype(np.int64), "rand": vals})


def rngstream_fill(
    spark: SparkSession,
    size: int,
    n_threads: int,
    seed: Sequence[int] = DEFAULT_PACKAGE_SEED,
    block: int = 1 << 16,
) -> DataFrame:
    """Distributed twin of ``generateRandomNumbers(RandVec, size)`` run
    with ``n_threads`` OpenMP threads: returns ``(i bigint, rand double)``
    with ``rand`` BIT-IDENTICAL to ``RandVec[i]``.

    Driver work is O(n_threads + size/block) small-int matrix ops; the
    draws happen in executors, ``block`` per task row, vectorized across
    blocks. ``block`` only shapes parallelism — the output is invariant
    to it (pinned by tests).
    """
    if size <= 0:
        raise ValueError("size must be positive")
    if n_threads <= 0:
        raise ValueError("n_threads must be positive")
    rows = []
    starts = stream_starts(n_threads, seed)
    step = _mat_pow(_MAT1, block, M1), _mat_pow(_MAT2, block, M2)
    for (chunk_start, chunk_len), s0 in zip(static_chunks(size, n_threads), starts):
        state, off = s0, 0
        while off < chunk_len:
            c = min(block, chunk_len - off)
            rows.append(
                (chunk_start + off, c) + tuple(float(x) for x in state)
            )
            state = _mat_vec(step[0], state[:3], M1) + _mat_vec(
                step[1], state[3:], M2
            )
            off += c
    schema = (
        "start long, count long, s0 double, s1 double, s2 double, "
        "s3 double, s4 double, s5 double"
    )
    blocks_df = spark.createDataFrame(rows, schema=schema)
    n_part = min(len(rows), spark.sparkContext.defaultParallelism)
    if n_part > 1:
        blocks_df = blocks_df.repartition(n_part)
    return blocks_df.mapInPandas(_gen_blocks, schema="i long, rand double")
