"""Strongly connected components — parallel-pivot forward-backward
reachability with trimming.

Reference semantics: `apps/flash/connectivity/scc.h`
(`/root/reference/analytical_engine/apps/flash/connectivity/scc.h`) — the
FLASH SCC repeatedly (a) trims trivial SCCs, (b) picks a pivot PER
remaining weakly connected component, intersects forward and backward
reachability, and removes the found SCCs. Component id = smallest vid in
the component (deterministic, oracle-checkable).

Spark shape (FW-BW-Trim, the standard distributed SCC):

1. **Trim to fixpoint** — a vertex with zero in- or out-degree in the
   remaining subgraph is its own SCC; removing those exposes more. On web
   graphs this strips the bow-tie's IN/OUT tendrils cheaply.
2. **Parallel pivots** — WCC over the remaining subgraph (min-label, so
   each component's label IS its min vid = the pivot); ALL pivots' forward
   and backward BFS run together as one frontier (components are disjoint,
   so a plain vertex-set frontier suffices — no per-root state). Every
   remaining component sheds its pivot's SCC every outer round.

Outer rounds = the deepest chain of SCCs inside any single weak component
(not the total SCC count); each inner step is a frontier join. The
worst case — one long path of SCCs — is inherent to FW-BW; Tarjan would be
sequential DFS, which doesn't distribute at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def _reach(edges: DataFrame, start: DataFrame, reverse: bool = False) -> DataFrame:
    """(vid) reachable from any start vertex over ``edges`` (inclusive)."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    seen = start.select("vid").transform(truncate_plan)
    frontier = seen
    while True:
        nxt = (
            frontier.join(edges, frontier["vid"] == edges[src])
            .select(F.col(dst).alias("vid"))
            .distinct()
            .join(seen, "vid", "anti")
            .transform(truncate_plan)
        )
        if nxt.count() == 0:
            return seen
        seen = seen.unionByName(nxt).transform(truncate_plan)
        frontier = nxt


def scc(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """(vid, comp) with comp = min vid of the strongly connected component."""
    from graphscope_spark.algorithms.wcc import wcc
    from graphscope_spark.graph import LinkGraph as _LG

    spark = graph.vertices.sparkSession
    all_edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    all_edges.count()
    remaining = graph.vertices.select("vid").transform(truncate_plan)
    assigned = spark.createDataFrame([], "vid long, comp long")

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # -- trim: zero in- or out-degree within `remaining` → singleton SCC
        while True:
            e_r = all_edges.join(
                remaining.withColumnRenamed("vid", "src"), "src"
            ).join(remaining.withColumnRenamed("vid", "dst"), "dst")
            has_out = e_r.select(F.col("src").alias("vid")).distinct()
            has_in = e_r.select(F.col("dst").alias("vid")).distinct()
            keep = (
                remaining.join(has_out, "vid", "semi")
                .join(has_in, "vid", "semi")
                .transform(truncate_plan)
            )
            n_keep = keep.count()
            trimmed = remaining.join(keep, "vid", "anti")
            if trimmed.count() == 0:
                break
            assigned = assigned.unionByName(
                trimmed.select("vid", F.col("vid").alias("comp"))
            ).transform(truncate_plan)
            remaining = keep
            if n_keep == 0:
                break
        if remaining.count() == 0:
            break
        # -- parallel pivot round over the remaining subgraph ---------------
        e_r = (
            all_edges.join(remaining.withColumnRenamed("vid", "src"), "src")
            .join(remaining.withColumnRenamed("vid", "dst"), "dst")
            .transform(truncate_plan)
        )
        sub = _LG(vertices=remaining, edges=e_r, num_partitions=graph.num_partitions)
        comp = wcc(sub).state  # (vid, comp) — comp = min vid = the pivot
        pivots = comp.select(F.col("comp").alias("vid")).distinct()
        fw = _reach(e_r, pivots, reverse=False)
        bw = _reach(e_r, pivots, reverse=True)
        found = fw.join(bw, "vid", "semi").transform(truncate_plan)
        assigned = assigned.unionByName(
            found.join(comp, "vid").select("vid", "comp")
        ).transform(truncate_plan)
        remaining = remaining.join(found, "vid", "anti").transform(truncate_plan)

    all_edges.unpersist()
    return assigned
