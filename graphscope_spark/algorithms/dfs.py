"""DFS preorder ranks.

Reference semantics: `apps/dfs/dfs.h`
(`/root/reference/analytical_engine/apps/dfs/dfs.h:49-180`) — a single
token walks the graph depth-first from a source; `rank[v]` is the visit
(preorder) number. The reference is *inherently sequential*: one vertex
holds the token per superstep, so its distributed execution is O(n)
supersteps of one message each (lexicographic DFS order is P-complete — no
shuffle-parallel formulation exists).

Spark shape: honesty over theatre. This operator computes the same ranks
with the out-adjacency gathered to the driver (grouped, sorted, Arrow-
batched) and an iterative DFS — guarded by ``max_vertices`` exactly like
``datapipe/similarity.py::cosine_topk`` guards its broadcast GEMM: above
the bound it REFUSES with a pointer to `bfs`/`sampling_path`, because a
"distributed" token walk would be strictly slower than this and no faster
path exists. Two deviations from the reference, both documented: children
are visited in ascending vid order (the reference follows CSR adjacency
order, which depends on fragment layout and is not portable), and only
vertices reachable from ``source`` get a rank (the reference leaves
``rank = -1`` elsewhere; those rows are omitted here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def dfs_preorder(
    graph: LinkGraph, source: int, max_vertices: int = 2_000_000
) -> DataFrame:
    """(vid, rank) — preorder visit numbers of the depth-first walk from
    ``source`` over out-edges, children in ascending vid order."""
    n = graph.vertices.count()
    if n > max_vertices:
        raise ValueError(
            f"dfs_preorder: {n} vertices > max_vertices={max_vertices}; "
            "lexicographic DFS is inherently sequential (reference "
            "apps/dfs/dfs.h walks one token). Use bfs/sampling_path for "
            "scalable traversals, or raise max_vertices knowingly."
        )
    adj_rows = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .distinct()
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .collect()
    )
    adj = {r["src"]: r["nbrs"] for r in adj_rows}
    rank: dict[int, int] = {}
    if source in adj or graph.vertices.where(F.col("vid") == source).count():
        stack = [(source, iter(adj.get(source, ())))]
        rank[source] = 0
        nxt = 1
        while stack:
            v, it = stack[-1]
            for w in it:
                if w not in rank:
                    rank[w] = nxt
                    nxt += 1
                    stack.append((w, iter(adj.get(w, ()))))
                    break
            else:
                stack.pop()
    spark = graph.vertices.sparkSession
    return spark.createDataFrame(
        [(v, r) for v, r in sorted(rank.items())], "vid long, rank long"
    )
