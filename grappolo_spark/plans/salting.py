"""Two-stage salted aggregation for power-law hub keys.

``groupBy(key).sum(value)`` on a graph edge table skews when a hub vertex
owns millions of rows. Spark's map-side partial aggregation usually absorbs
sum-like skew, but when the grouping key is composite and high-cardinality
(e.g. Louvain's (vertex, neighbor_community)) a single reducer can still
drown. ``salted_sum`` splits each key into ``salt`` sub-keys, pre-aggregates,
then merges — the DataFrame analogue of the reference's per-thread partial
maps (`BasicCommunitiesDetection/parallelLouvainMethodScale.cpp:86-90`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: str,
    salt: int = 16,
    out: str | None = None,
) -> DataFrame:
    """sum(value) grouped by keys, skew-safe via a random salt pre-aggregate."""
    out = out or value
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value).alias("_psum"))
    return partial.groupBy(*keys).agg(F.sum("_psum").alias(out))
