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
from xdata_igraph_spark.operators.centrality import hits, eigenvector_centrality
from xdata_igraph_spark.operators.paths import (
    shortest_paths,
    distances_from,
    average_path_length,
    diameter,
    eccentricity,
    radius,
    topological_sorting,
    is_dag,
)
from xdata_igraph_spark.operators.structure import (
    neighborhood_size,
    neighborhood,
    neighborhood_graphs,
    avg_nearest_neighbor_degree,
    dyad_census,
    linegraph,
    permute_vertices,
)
from xdata_igraph_spark.operators.community_cmp import (
    compare_communities,
    comparison_metrics,
    split_join_distance,
)
from xdata_igraph_spark.operators.bipartite import (
    bipartite_projection,
    maximum_bipartite_matching,
)
from xdata_igraph_spark.operators.leading_eigenvector import (
    leading_eigenvector_communities,
)
from xdata_igraph_spark.operators.flow import (
    maxflow_value,
    st_mincut,
    mincut_value,
    gomory_hu_tree,
    edge_connectivity,
    vertex_connectivity,
)

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
    "hits",
    "eigenvector_centrality",
    "shortest_paths",
    "distances_from",
    "average_path_length",
    "diameter",
    "eccentricity",
    "radius",
    "topological_sorting",
    "is_dag",
    "neighborhood_size",
    "neighborhood",
    "neighborhood_graphs",
    "avg_nearest_neighbor_degree",
    "dyad_census",
    "linegraph",
    "permute_vertices",
    "compare_communities",
    "comparison_metrics",
    "split_join_distance",
    "bipartite_projection",
    "maximum_bipartite_matching",
    "leading_eigenvector_communities",
    "maxflow_value",
    "st_mincut",
    "mincut_value",
    "gomory_hu_tree",
    "edge_connectivity",
    "vertex_connectivity",
]
