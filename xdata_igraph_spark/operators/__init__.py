from xdata_igraph_spark.operators.pagerank import pagerank
from xdata_igraph_spark.operators.components import wcc, scc, is_connected
from xdata_igraph_spark.operators.triangles import (
    adjacent_triangles,
    list_triangles,
    count_triangles,
    transitivity_undirected,
    transitivity_local_undirected,
)
from xdata_igraph_spark.operators.lpa import label_propagation, modularity
from xdata_igraph_spark.operators.kcore import coreness

__all__ = [
    "pagerank",
    "wcc",
    "scc",
    "is_connected",
    "adjacent_triangles",
    "list_triangles",
    "count_triangles",
    "transitivity_undirected",
    "transitivity_local_undirected",
    "label_propagation",
    "modularity",
    "coreness",
]
