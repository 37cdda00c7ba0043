"""Deterministic graph fixtures mirroring the reference's test protocol.

- karate: Zachary's karate club (public dataset; the reference bundles it as
  `/root/reference/karate.graph`, METIS header ``34 78 0``). Known Louvain
  modularity optimum ~0.41-0.42.
- grid2d / torus2d / grid3d: per the generator spec
  `/root/reference/driverForGenerating3DGrids.cpp:47-190`.
- planted_partition: SBM with ground-truth blocks (SNAP ground-truth
  protocol, `convertSNAPGroundTruthInformation.cpp:47-60`).
- star_hub: skew fixture (1 hub, many leaves) for salting/vertex-following.

All seeded; no wall-clock, no external data.
"""

from __future__ import annotations

import random

from pyspark.sql import SparkSession

from grappolo_spark.graph import Graph

# Zachary karate club, 0-based undirected edge list (public data; identical
# content to /root/reference/karate.graph after 1-based METIS decode).
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]


def karate(spark: SparkSession) -> Graph:
    return Graph.from_pairs(spark, KARATE_EDGES)


def grid2d_edges(d1: int, d2: int, torus: bool = False) -> list[tuple[int, int]]:
    """D1 x D2 mesh (optionally with wraparound), vertex id = i*d2 + j —
    semantics of `driverForGenerating3DGrids.cpp:55-130`."""
    edges = []
    for i in range(d1):
        for j in range(d2):
            v = i * d2 + j
            if j + 1 < d2:
                edges.append((v, i * d2 + j + 1))
            elif torus and d2 > 2:
                edges.append((i * d2, v))
            if i + 1 < d1:
                edges.append((v, (i + 1) * d2 + j))
            elif torus and d1 > 2:
                edges.append((j, v))
    return edges


def grid3d_edges(d1: int, d2: int, d3: int) -> list[tuple[int, int]]:
    """3-D grid per `driverForGenerating3DGrids.cpp:134-190`."""
    edges = []

    def vid(i, j, k):
        return (i * d2 + j) * d3 + k

    for i in range(d1):
        for j in range(d2):
            for k in range(d3):
                if k + 1 < d3:
                    edges.append((vid(i, j, k), vid(i, j, k + 1)))
                if j + 1 < d2:
                    edges.append((vid(i, j, k), vid(i, j + 1, k)))
                if i + 1 < d1:
                    edges.append((vid(i, j, k), vid(i + 1, j, k)))
    return edges


def grid2d(spark: SparkSession, d1: int = 8, d2: int = 9) -> Graph:
    return Graph.from_pairs(spark, grid2d_edges(d1, d2))


def torus2d(spark: SparkSession, d1: int = 8, d2: int = 9) -> Graph:
    return Graph.from_pairs(spark, grid2d_edges(d1, d2, torus=True))


def grid3d(spark: SparkSession, d1: int = 4, d2: int = 4, d3: int = 5) -> Graph:
    return Graph.from_pairs(spark, grid3d_edges(d1, d2, d3))


def planted_partition(
    spark: SparkSession,
    blocks: int = 4,
    block_size: int = 50,
    p_in: float = 0.3,
    p_out: float = 0.01,
    seed: int = 42,
) -> tuple[Graph, dict[int, int]]:
    """SBM with planted communities; returns (graph, ground_truth v->block)."""
    rng = random.Random(seed)
    n = blocks * block_size
    truth = {v: v // block_size for v in range(n)}
    edges = []
    for u in range(n):
        for v in range(u + 1, n):
            p = p_in if truth[u] == truth[v] else p_out
            if rng.random() < p:
                edges.append((u, v))
    # guarantee no isolated vertex so labels are defined everywhere
    deg = {v: 0 for v in range(n)}
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    for v, d in deg.items():
        if d == 0:
            other = (v + 1) % n
            edges.append((min(v, other), max(v, other)))
    return Graph.from_pairs(spark, edges), truth


def star_hub(
    spark: SparkSession, leaves: int = 1000, chords: int = 50, seed: int = 42
) -> Graph:
    """1 hub (vertex 0) + leaves + random chords — skew-salting fixture."""
    rng = random.Random(seed)
    edges = [(0, i) for i in range(1, leaves + 1)]
    for _ in range(chords):
        u = rng.randrange(1, leaves + 1)
        v = rng.randrange(1, leaves + 1)
        if u != v:
            edges.append((min(u, v), max(u, v)))
    return Graph.from_pairs(spark, edges)
