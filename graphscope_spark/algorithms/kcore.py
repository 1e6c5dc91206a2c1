"""k-core / k-shell — iterative degree peeling.

Reference semantics: `gs::KCore` (`/root/reference/analytical_engine/apps/
kcore/kcore.h`, registered `.gs_conf.yaml:156-161`) — repeatedly remove
vertices whose degree in the remaining subgraph is < k; the k-core is the
fixpoint. `gs::KShell` (`apps/kcore/kshell.h`, `.gs_conf.yaml:162-167`)
assigns each vertex the largest k for which it survives (coreness).

Spark shape: the peel loop filters the vertex set and recomputes subgraph
degrees with one semi-join + groupBy per round; each round removes at least
one vertex or terminates, and in practice whole "layers" drop per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def kcore(graph: LinkGraph, k: int, max_rounds: int = 500) -> DataFrame:
    """Vertices of the k-core of the undirected simple graph: (vid)."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    alive = graph.vertices.select("vid")
    n_alive = alive.count()
    for _ in range(max_rounds):
        # degree within the alive-induced subgraph
        sub = und.join(alive.withColumnRenamed("vid", "src"), "src").join(
            alive.withColumnRenamed("vid", "dst"), "dst"
        )
        deg = sub.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
        nxt = (
            alive.join(deg, "vid", "left")
            .where(F.coalesce(F.col("deg"), F.lit(0)) >= k)
            .select("vid")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        alive = nxt
        if n_next == n_alive or n_next == 0:
            n_alive = n_next
            break
        n_alive = n_next
    und.unpersist()
    return alive


def coreness(graph: LinkGraph, k_max: int = 64) -> DataFrame:
    """(vid, core) — largest k such that vid is in the k-core (k-shell index).
    Peels shells k=1,2,... until the core empties; each shell reuses the
    previous core as its starting vertex set so total work is the classic
    O(Σ|core_k|) peel."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    spark = graph.vertices.sparkSession
    result = graph.vertices.select("vid", F.lit(0).alias("core"))
    alive = graph.vertices.select("vid")
    for k in range(1, k_max + 1):
        # peel to the k-core starting from the (k-1)-core
        while True:
            sub = und.join(alive.withColumnRenamed("vid", "src"), "src").join(
                alive.withColumnRenamed("vid", "dst"), "dst"
            )
            deg = sub.groupBy(F.col("src").alias("vid")).agg(
                F.count("*").alias("deg")
            )
            nxt = (
                alive.join(deg, "vid", "left")
                .where(F.coalesce(F.col("deg"), F.lit(0)) >= k)
                .select("vid")
                .localCheckpoint(eager=True)
            )
            n_before, n_after = alive.count(), nxt.count()
            alive = nxt
            if n_after == n_before or n_after == 0:
                break
        if alive.count() == 0:
            break
        result = (
            result.join(alive.withColumn("ink", F.lit(k)), "vid", "left")
            .select(
                "vid", F.coalesce(F.col("ink"), F.col("core")).alias("core")
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    return result
