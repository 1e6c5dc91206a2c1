"""Strongly connected components — forward-backward reachability with
trimming.

Reference semantics: `apps/flash/connectivity/scc.h`
(`/root/reference/analytical_engine/apps/flash/connectivity/scc.h`) — the
FLASH SCC computes, per round, forward and backward reachability from a
pivot and intersects them; trivial SCCs are trimmed eagerly. Component id =
smallest vid in the component (deterministic, oracle-checkable).

Spark shape (FW-BW-Trim, the standard distributed SCC):

1. **Trim to fixpoint**: a vertex with zero in-degree or zero out-degree in
   the remaining subgraph is its own SCC; removing those exposes more —
   iterate until stable. On web graphs this strips the huge IN/OUT tendrils
   of the bow-tie cheaply (one semi-join + two distinct projections per
   round).
2. **Pivot FW∩BW**: BFS forward and backward from the smallest remaining
   vid; the intersection is that pivot's SCC. Remove and repeat.

Driver iterations = O(#nontrivial SCCs) — on web crawls the giant SCC falls
out in the first pivot round and trimming absorbs the tail, which is why
FW-BW (not Tarjan, which is inherently sequential DFS) is the scalable
choice. Worst case (many small cycles) degrades to one pivot per SCC;
callers needing that regime should pre-partition by WCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def _reachable(
    edges: DataFrame, start: DataFrame, members: DataFrame, reverse: bool = False
) -> DataFrame:
    """(vid) reachable from ``start`` inside ``members`` (inclusive)."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    e = (
        edges.join(members.withColumnRenamed("vid", src), src)
        .join(members.withColumnRenamed("vid", dst), dst)
        .select(F.col(src).alias("from"), F.col(dst).alias("to"))
        .transform(truncate_plan)
    )
    seen = start.select("vid").transform(truncate_plan)
    frontier = seen
    while True:
        nxt = (
            frontier.join(e, frontier["vid"] == e["from"])
            .select(F.col("to").alias("vid"))
            .distinct()
            .join(seen, "vid", "anti")
            .transform(truncate_plan)
        )
        if nxt.count() == 0:
            return seen
        seen = seen.unionByName(nxt).transform(truncate_plan)
        frontier = nxt


def scc(graph: LinkGraph, max_pivots: int = 10_000) -> DataFrame:
    """(vid, comp) with comp = min vid of the strongly connected component."""
    spark = graph.vertices.sparkSession
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    edges.count()
    remaining = graph.vertices.select("vid").transform(truncate_plan)
    assigned = spark.createDataFrame([], "vid long, comp long")

    pivots = 0
    while pivots < max_pivots:
        # -- trim: zero in- or out-degree within `remaining` → singleton SCC
        while True:
            e_r = edges.join(
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
            n_trim = trimmed.count()
            if n_trim == 0:
                break
            assigned = assigned.unionByName(
                trimmed.select("vid", F.col("vid").alias("comp"))
            ).transform(truncate_plan)
            remaining = keep
            if n_keep == 0:
                break
        if remaining.count() == 0:
            break
        # -- pivot round: SCC(pivot) = FW(pivot) ∩ BW(pivot)
        pivots += 1
        pivot = remaining.agg(F.min("vid")).collect()[0][0]
        start = spark.createDataFrame([(int(pivot),)], "vid long")
        fw = _reachable(edges, start, remaining, reverse=False)
        bw = _reachable(edges, start, remaining, reverse=True)
        comp = fw.join(bw, "vid", "semi").transform(truncate_plan)
        assigned = assigned.unionByName(
            comp.select("vid", F.lit(int(pivot)).alias("comp"))
        ).transform(truncate_plan)
        remaining = remaining.join(comp, "vid", "anti").transform(truncate_plan)

    edges.unpersist()
    return assigned
