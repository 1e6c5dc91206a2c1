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

from graphscope_spark.bsp import truncate_plan, truncate_plan_lazy
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
            .transform(truncate_plan_lazy)
        )
        n_next = nxt.count()
        alive = nxt
        if n_next == n_alive or n_next == 0:
            n_alive = n_next
            break
        n_alive = n_next
    und.unpersist()
    return alive


def k_core_search(graph: LinkGraph, k: int, max_rounds: int = 500) -> DataFrame:
    """One row (core_size bigint) — size of the k-core, per reference
    `apps/flash/core/k-core-search.h:42-65` (peel `d < k` vertices with
    cascading degree decrements until fixpoint, then count survivors).
    The peel itself is `kcore` above; this is its global-result form."""
    members = kcore(graph, k, max_rounds=max_rounds)
    return members.agg(F.count("*").cast("long").alias("core_size"))


def coreness(
    graph: LinkGraph, max_rounds: int = 200, fused_rounds: int = 4
) -> DataFrame:
    """(vid, core) — largest k such that vid is in the k-core (k-shell
    index), via the distributed **h-index iteration** (Lü et al.): start
    ``core(v) = deg(v)``; each round set ``core(v)`` to the H-index of its
    neighbors' current core values; the fixpoint is exactly the coreness.

    Scale shape: the per-vertex H-index is computed WITHOUT gathering
    neighbor arrays — a (vid, core-value) histogram, a cumulative count
    window ordered by value descending, then ``max(min(value, cum))`` per
    vertex. Two shuffles per round, both partial-aggregated; a mega-degree
    hub costs a histogram of distinct values, not a 10^8-element array.

    ``fused_rounds=k`` runs k h-index rounds per Spark job (lazy plan-cut
    chain, changed-count checked once per block) — the H-operator is a
    monotone non-increasing fixpoint, so rounds past convergence are no-ops
    and the block check is exact; at most k-1 redundant rounds of work."""
    from pyspark.sql.window import Window

    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    cores = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("core"))
    cores = (
        graph.vertices.select("vid")
        .join(cores, "vid", "left")
        .select("vid", F.coalesce("core", F.lit(0)).cast("long").alias("core"))
        .transform(truncate_plan_lazy)
    )
    for rnd in range(1, max_rounds + 1):
        nbr = und.join(
            cores.select(F.col("vid").alias("src"), "core"), "src"
        ).select(F.col("dst").alias("vid"), "core")
        hist = nbr.groupBy("vid", "core").agg(F.count("*").alias("c"))
        w = (
            Window.partitionBy("vid")
            .orderBy(F.col("core").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        h = (
            hist.withColumn("cum", F.sum("c").over(w))
            .select("vid", F.least(F.col("core"), F.col("cum")).alias("m"))
            .groupBy("vid")
            .agg(F.max("m").alias("h"))
        )
        nxt = (
            cores.join(h, "vid", "left")
            .select(
                "vid",
                F.least(F.col("core"), F.coalesce(F.col("h"), F.lit(0))).alias("core"),
                (F.least(F.col("core"), F.coalesce(F.col("h"), F.lit(0))) < F.col("core")).alias(
                    "chg"
                ),
            )
            .transform(truncate_plan_lazy)
        )
        cores = nxt.select("vid", "core")
        if rnd % max(1, fused_rounds) == 0 or rnd == max_rounds:
            if nxt.where("chg").count() == 0:
                break
    und.unpersist()
    return cores
