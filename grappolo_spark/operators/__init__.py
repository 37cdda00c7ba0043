"""Graph analytics operators (the engine's "queries")."""

from grappolo_spark.operators.components import connected_components
from grappolo_spark.operators.labelprop import label_propagation
from grappolo_spark.operators.pagerank import pagerank
from grappolo_spark.operators.triangles import triangle_count

__all__ = [
    "connected_components",
    "label_propagation",
    "pagerank",
    "triangle_count",
]
