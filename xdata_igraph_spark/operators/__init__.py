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
    convergence_degree,
    diversity,
    dyad_census,
    get_laplacian,
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
from xdata_igraph_spark.operators.infomap import (
    codelength,
    codelength_directed,
    infomap_communities,
    infomap_communities_directed,
)
from xdata_igraph_spark.operators.leading_eigenvector import (
    leading_eigenvector_communities,
)
from xdata_igraph_spark.operators.spinglass import spinglass_communities
from xdata_igraph_spark.operators.hrg import (
    hrg_create,
    hrg_dendrogram,
    hrg_fit,
    hrg_game,
    hrg_pair_probs,
    hrg_predict,
    hrg_sample,
)
from xdata_igraph_spark.operators.scg import (
    scg_adjacency,
    scg_grouping,
    scg_laplacian,
    scg_stochastic,
)
from xdata_igraph_spark.operators.flow import (
    maxflow_value,
    st_mincut,
    mincut_value,
    gomory_hu_tree,
    edge_connectivity,
    vertex_connectivity,
    edge_disjoint_paths,
    vertex_disjoint_paths,
    st_edge_connectivity,
    st_vertex_connectivity,
    adhesion,
    cohesion,
    dominator_tree,
)
from xdata_igraph_spark.operators.subiso import (
    subisomorphisms,
    count_subisomorphisms,
    subisomorphic,
    isomorphic,
    count_isomorphisms,
    count_automorphisms,
)
from xdata_igraph_spark.operators.feedback import feedback_arc_set
from xdata_igraph_spark.operators.epidemics import sir
from xdata_igraph_spark.operators.walks import random_walks, walk_sentences
from xdata_igraph_spark.operators.mst import minimum_spanning_tree, mst_total_weight
from xdata_igraph_spark.operators.chordal import (
    maximum_cardinality_search,
    is_chordal,
)
from xdata_igraph_spark.operators.paths import (
    get_all_simple_paths,
    transitive_closure_dag,
)
from xdata_igraph_spark.operators.biconnected import (
    articulation_points,
    bridges,
    biconnected_components,
)
from xdata_igraph_spark.operators.layouts import (
    layout_random,
    layout_circle,
    layout_star,
    layout_grid,
    layout_bipartite,
    layout_fruchterman_reingold,
    layout_kamada_kawai,
    layout_reingold_tilford,
)

__all__ = [
    "pagerank",
    "wcc",
    "scc",
    "scg_adjacency",
    "scg_grouping",
    "scg_laplacian",
    "scg_stochastic",
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
    "hrg_create",
    "hrg_dendrogram",
    "hrg_fit",
    "hrg_game",
    "hrg_pair_probs",
    "hrg_predict",
    "hrg_sample",
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
    "convergence_degree",
    "diversity",
    "dyad_census",
    "linegraph",
    "permute_vertices",
    "compare_communities",
    "comparison_metrics",
    "split_join_distance",
    "bipartite_projection",
    "maximum_bipartite_matching",
    "codelength",
    "codelength_directed",
    "infomap_communities",
    "infomap_communities_directed",
    "leading_eigenvector_communities",
    "spinglass_communities",
    "maxflow_value",
    "st_mincut",
    "mincut_value",
    "gomory_hu_tree",
    "edge_connectivity",
    "vertex_connectivity",
    "edge_disjoint_paths",
    "vertex_disjoint_paths",
    "st_edge_connectivity",
    "st_vertex_connectivity",
    "adhesion",
    "cohesion",
    "dominator_tree",
    "feedback_arc_set",
    "subisomorphisms",
    "count_subisomorphisms",
    "subisomorphic",
    "isomorphic",
    "count_isomorphisms",
    "count_automorphisms",
    "sir",
    "random_walks",
    "walk_sentences",
    "minimum_spanning_tree",
    "mst_total_weight",
    "maximum_cardinality_search",
    "is_chordal",
    "get_all_simple_paths",
    "transitive_closure_dag",
    "get_laplacian",
    "articulation_points",
    "bridges",
    "biconnected_components",
    "layout_random",
    "layout_circle",
    "layout_star",
    "layout_grid",
    "layout_bipartite",
    "layout_fruchterman_reingold",
    "layout_kamada_kawai",
    "layout_reingold_tilford",
]
