"""MRG32k3a / RngStream bit-parity (grappolo_spark.functions.rngstream).

The module claims BIT-IDENTICAL reproduction of the reference's
``generateRandomNumbers()`` vector for a given (size, n_threads). These
tests pin the claim through three independent code paths:

- the scalar exact-integer oracle (``u01_sequence``),
- the float64 lockstep worker kernel (``_gen_blocks``),
- the distributed composition (``rngstream_fill``),

plus an external anchor: the first draws of the package-default seed
(12345 x 6) published in L'Ecuyer et al. 2002 (Oper. Res. 50(6),
"An Object-Oriented Random-Number Package...", example output 0.127011).
Equality everywhere is ``==`` on doubles — bit parity, not approx.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from grappolo_spark.functions.rngstream import (
    DEFAULT_PACKAGE_SEED,
    _advance,
    _gen_blocks,
    rngstream_fill,
    static_chunks,
    stream_starts,
    u01_sequence,
)


def test_published_anchor_default_seed():
    # L'Ecuyer's package default seed is 12345 x 6; the 2002 paper's
    # example prints its first U01 as 0.127011
    u = u01_sequence((12345,) * 6, 1)[0]
    assert u == pytest.approx(0.127011, abs=5e-7)


def test_jump_matrix_equals_sequential_recurrence():
    s = tuple(int(x) for x in DEFAULT_PACKAGE_SEED)
    k = 137
    # draws k..k+4 from the jumped state == draws k..k+4 of the stream
    assert u01_sequence(_advance(s, k), 5) == u01_sequence(s, k + 5)[k:]


def test_stream_spacing_is_2_pow_127():
    s0, s1 = stream_starts(2)
    assert tuple(s1) == tuple(_advance(s0, 1 << 127))


def test_static_chunks_libgomp_split():
    assert static_chunks(10, 4) == [(0, 3), (3, 3), (6, 2), (8, 2)]
    assert static_chunks(8, 4) == [(0, 2), (2, 2), (4, 2), (6, 2)]
    assert static_chunks(3, 5) == [(0, 1), (1, 1), (2, 1), (3, 0), (3, 0)]


def test_float64_kernel_bit_equals_integer_oracle():
    # 3 blocks from 3 different stream offsets, straight through the
    # worker kernel (no Spark): float64 lockstep == exact-int scalar
    starts = stream_starts(2)
    blocks = [
        (0, 1000, starts[0]),
        (1000, 777, _advance(starts[0], 1000)),
        (1777, 1500, starts[1]),
    ]
    pdf = pd.DataFrame(
        [
            {"start": s, "count": c, **{f"s{i}": float(st[i]) for i in range(6)}}
            for s, c, st in blocks
        ]
    )
    out = pd.concat(list(_gen_blocks([pdf])), ignore_index=True)
    out = out.sort_values("i").reset_index(drop=True)
    expected = np.concatenate(
        [np.array(u01_sequence(st, c)) for _, c, st in blocks]
    )
    assert len(out) == len(expected)
    assert (out["rand"].to_numpy() == expected).all()  # bit parity
    assert (
        out["i"].to_numpy()
        == np.concatenate([s + np.arange(c) for s, c, _ in blocks])
    ).all()


def _reference_vector(size: int, n_threads: int) -> np.ndarray:
    """Scalar-oracle twin of generateRandomNumbers(RandVec, size) at
    n_threads OpenMP threads (utilityFunctions.cpp:47-75)."""
    out = np.empty(size)
    for (start, count), st in zip(
        static_chunks(size, n_threads), stream_starts(n_threads)
    ):
        out[start : start + count] = u01_sequence(st, count)
    return out


def test_rngstream_fill_matches_reference_vector(spark):
    size, n_threads = 10_007, 5
    got = (
        rngstream_fill(spark, size, n_threads, block=1 << 10)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert got["i"].tolist() == list(range(size))
    assert (got["rand"].to_numpy() == _reference_vector(size, n_threads)).all()


def test_rngstream_fill_block_invariance(spark):
    a = rngstream_fill(spark, 2_001, 3, block=64).toPandas().sort_values("i")
    b = rngstream_fill(spark, 2_001, 3, block=1 << 14).toPandas().sort_values("i")
    assert (a["rand"].to_numpy() == b["rand"].to_numpy()).all()


def test_d1_coloring_with_reference_tiebreak(spark):
    """distance_one_coloring(rand_df=rngstream_fill(...)) stays a proper
    coloring and is deterministic — the reference-parity tie-break path."""
    from grappolo_spark.operators.coloring import distance_one_coloring
    from grappolo_spark.sources import fixtures

    g = fixtures.karate(spark)
    nv = g.num_vertices()

    def run():
        rnd = rngstream_fill(spark, nv, 4).withColumnRenamed("i", "v")
        return {
            r["v"]: r["color"]
            for r in distance_one_coloring(g, rand_df=rnd).collect()
        }

    c = run()
    assert None not in c.values()
    for e in g.edges.select("src", "dst").collect():
        if e.src != e.dst:
            assert c[e.src] != c[e.dst]
    assert run() == c  # deterministic under the parity tie-break


def test_rngstream_fill_thread_count_changes_vector(spark):
    a = rngstream_fill(spark, 512, 2).toPandas().sort_values("i")
    b = rngstream_fill(spark, 512, 8).toPandas().sort_values("i")
    # same first chunk prefix cannot cover the whole vector
    assert (a["rand"].to_numpy() != b["rand"].to_numpy()).any()
