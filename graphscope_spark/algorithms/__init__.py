"""Algorithm library — each module is a driver-side BSP loop of Spark SQL
joins/aggregations implementing one GAE built-in app's exact semantics
(SURVEY.md §2.3). All return per-vertex result DataFrames (the reference's
"vertex_data context" shape, `core/context/vertex_data_context.h`)."""

from graphscope_spark.algorithms.pagerank import pagerank
from graphscope_spark.algorithms.wcc import wcc
from graphscope_spark.algorithms.cdlp import cdlp
from graphscope_spark.algorithms.triangles import triangles, lcc, total_triangles
from graphscope_spark.algorithms.traversal import (
    bfs,
    sssp,
    bfs_tree,
    bfs_edges,
    bfs_predecessors,
    bfs_successors,
)
from graphscope_spark.algorithms.centrality import (
    degree_centrality,
    hits,
    katz,
    eigenvector_centrality,
)
from graphscope_spark.algorithms.kcore import kcore, coreness
from graphscope_spark.algorithms.closeness import (
    closeness_centrality,
    harmonic_centrality,
    multi_source_bfs,
)
from graphscope_spark.algorithms.nxmetrics import (
    constraint,
    dag_longest_path_length,
    topological_generations,
    degree_histogram,
    powerlaw_alpha,
    distance_measures,
    effective_size,
    flow_hierarchy,
    global_efficiency,
    isolates,
    overall_reciprocity,
    reciprocity,
    rich_club_coefficient,
    s_metric,
    voronoi_cells,
    wiener_index,
)
from graphscope_spark.algorithms.hyperanf import (
    effective_diameter,
    neighborhood_function,
)
from graphscope_spark.algorithms.centrality import trustrank
from graphscope_spark.algorithms.louvain import louvain, modularity
from graphscope_spark.algorithms.voterank import voterank
from graphscope_spark.algorithms.paths import is_simple_path, all_simple_edge_paths
from graphscope_spark.algorithms.clustering import (
    avg_clustering,
    transitivity,
    node_boundary,
    edge_boundary,
    degree_assortativity,
    numeric_assortativity,
)

__all__ = [
    "closeness_centrality",
    "effective_diameter",
    "harmonic_centrality",
    "multi_source_bfs",
    "neighborhood_function",
    "constraint",
    "dag_longest_path_length",
    "topological_generations",
    "degree_histogram",
    "powerlaw_alpha",
    "distance_measures",
    "effective_size",
    "flow_hierarchy",
    "global_efficiency",
    "isolates",
    "overall_reciprocity",
    "reciprocity",
    "rich_club_coefficient",
    "s_metric",
    "voronoi_cells",
    "wiener_index",
    "trustrank",
    "louvain",
    "modularity",
    "voterank",
    "is_simple_path",
    "avg_clustering",
    "transitivity",
    "node_boundary",
    "edge_boundary",
    "degree_assortativity",
    "pagerank",
    "wcc",
    "cdlp",
    "triangles",
    "lcc",
    "total_triangles",
    "bfs",
    "sssp",
    "bfs_tree",
    "bfs_edges",
    "bfs_predecessors",
    "bfs_successors",
    "all_simple_edge_paths",
    "numeric_assortativity",
    "degree_centrality",
    "hits",
    "katz",
    "eigenvector_centrality",
    "kcore",
    "coreness",
]
