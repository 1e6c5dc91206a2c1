"""Greedy k-center — farthest-point traversal with hop distances.

Reference semantics: `apps/flash/measurement/k-center.h`
(`/root/reference/analytical_engine/apps/flash/measurement/k-center.h:
44-76`) — the first center is the maximum-(degree, id) vertex; each
subsequent center is the vertex maximizing (current distance-to-centers,
id); after each pick a BFS relaxes the global distance map (distances only
decrease). Unreached vertices rank as infinitely far, so each new center
lands in an untouched component first — exactly the reference's INT_MAX
initialisation.

Spark shape: the global state is one (vid, dis) DataFrame; each pick is an
``F.max(struct(dis, vid))`` partial aggregate (no collect of the vertex
set), and each BFS level is the standard frontier join + min aggregate over
the undirected edge table, improving ``dis`` monotonically. Rounds =
k × eccentricity of the picked centers. The argmax tie-break (larger vid)
mirrors the reference's ``std::pair`` max."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph

_INF = (1 << 62)


def k_center(graph: LinkGraph, k: int = 4, max_rounds: int = 500) -> DataFrame:
    """(vid, dis) — hop distance from every vertex to its nearest of the k
    greedily chosen centers (reference semantics; unreached stay at the
    INT_MAX-analog sentinel 2⁶²)."""
    und = graph.undirected_edges(drop_self_loops=True).repartition(
        F.col("src")
    ).persist()
    und.count()
    deg = graph.degrees()
    dis = (
        graph.vertices.select("vid", F.lit(_INF).cast("long").alias("dis"))
        .transform(truncate_plan)
    )
    # first center: max (deg, vid); isolated vertices have deg 0 rows absent,
    # mirror the reference (every vertex scanned, Deg==0 for isolated)
    first = (
        graph.vertices.join(deg, "vid", "left")
        .select("vid", F.coalesce("deg", F.lit(0)).alias("deg"))
        .agg(F.max(F.struct(F.col("deg"), F.col("vid"))).alias("m"))
        .collect()[0][0]
    )
    center = first["vid"]
    for i in range(k):
        frontier = dis.sparkSession.createDataFrame(
            [(center, 0)], "vid long, dis long"
        )
        dis = (
            dis.join(frontier.select("vid", F.col("dis").alias("nd")), "vid", "left")
            .select("vid", F.least("dis", F.coalesce("nd", F.lit(_INF))).alias("dis"))
            .transform(truncate_plan)
        )
        j = 0
        while j < max_rounds:
            j += 1
            cand = (
                frontier.join(und, frontier["vid"] == und["src"])
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.lit(j).cast("long").alias("nd"))
            )
            improved = (
                cand.join(dis, "vid")
                .where(F.col("dis") > F.col("nd"))
                .select("vid", F.col("nd").alias("dis"))
                .transform(truncate_plan)
            )
            if improved.isEmpty():
                break
            dis = (
                dis.join(improved.select("vid", F.col("dis").alias("nd")), "vid", "left")
                .select("vid", F.least("dis", F.coalesce("nd", F.lit(_INF))).alias("dis"))
                .transform(truncate_plan)
            )
            frontier = improved
        if i < k - 1:
            # pick the farthest vertex as the next center; skipped on the
            # final iteration — a (k+1)-th center would never be used
            nxt = dis.agg(F.max(F.struct(F.col("dis"), F.col("vid"))).alias("m")).collect()[0][0]
            center = nxt["vid"]
    und.unpersist()
    return dis
