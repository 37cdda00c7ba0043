"""grappolo_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of ECP-ExaGraph/Grappolo (C++/OpenMP parallel
Louvain community detection, `/root/reference`) as idiomatic Spark DataFrame
programs: iterative join/groupBy supersteps over a symmetrized edge table,
multi-phase Louvain with coloring / vertex-following / min-label heuristics,
plus PageRank, connected components, label propagation and triangle counting,
and the training-data-pipeline operators (dedup, ANN, text analysis) a
100 TB corpus job needs.

This is NOT a port: no CSR, no shared-memory arrays — adjacency is recovered
by joins, per-vertex state lives in DataFrames, convergence loops run on the
driver with checkpointed lineage.
"""

from grappolo_spark.graph import Graph
from grappolo_spark.session import get_spark

__all__ = ["Graph", "get_spark"]
__version__ = "0.1.0"
