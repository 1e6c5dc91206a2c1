"""Maximal independent set — deterministic Luby rounds.

Reference semantics: `apps/flash/matching/mis.h`
(`/root/reference/analytical_engine/apps/flash/matching/mis.h`) — classic
Luby: each round every remaining vertex whose priority is a strict local
minimum among its remaining neighbors joins the MIS; winners and their
neighbors leave. O(log n) rounds w.h.p. for (pseudo)random priorities.

Priorities here are the portable 60-bit md5 hash of the vid (unique per
vertex by folding the vid into the low bits), so the result is
deterministic AND reproducible in the DuckDB gate oracle, while still
behaving like a random permutation — vid-ordered priorities would serialize
chains into O(n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan_lazy
from graphscope_spark.datapipe.hashing import portable_hash60
from graphscope_spark.graph import LinkGraph

# priority = struct(hash mod 2^40, vid) compared lexicographically — unique
# for ANY 64-bit vid with no arithmetic (the former (h·2²⁰ + vid) BIGINT
# packing overflows under ANSI mode once vids are full-range xxhash64).
# The gate oracle keeps the packed SQL expression: for 0 ≤ vid < 2^20 the
# packed order and this struct order are identical, and gate doc_ids are
# exactly that range.
_PRI_MOD = 1 << 40


def _priority(vid_col):
    return F.struct(
        F.pmod(portable_hash60(vid_col.cast("string")), F.lit(_PRI_MOD)).alias("h"),
        vid_col.alias("v"),
    )


def maximal_independent_set(graph: LinkGraph, max_rounds: int = 100) -> DataFrame:
    """(vid) — a maximal independent set of the undirected simple graph."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    alive = graph.vertices.select(
        "vid", _priority(F.col("vid")).alias("pri")
    ).transform(truncate_plan_lazy)
    spark = graph.vertices.sparkSession
    mis = spark.createDataFrame([], "vid long")
    for _ in range(max_rounds):
        if alive.count() == 0:
            break
        # min neighbor priority within the alive subgraph
        e_a = und.join(
            alive.select(F.col("vid").alias("src"), F.col("pri").alias("spri")), "src"
        ).join(alive.select(F.col("vid").alias("dst")), "dst")
        nbr_min = e_a.groupBy(F.col("dst").alias("vid")).agg(F.min("spri").alias("nmin"))
        winners = (
            alive.join(nbr_min, "vid", "left")
            .where(F.col("nmin").isNull() | (F.col("pri") < F.col("nmin")))
            .select("vid")
            .transform(truncate_plan_lazy)
        )
        mis = mis.unionByName(winners).transform(truncate_plan_lazy)
        # remove winners and their neighbors
        nbrs = und.join(
            winners.withColumnRenamed("vid", "src"), "src"
        ).select(F.col("dst").alias("vid")).distinct()
        alive = (
            alive.join(winners, "vid", "anti")
            .join(nbrs, "vid", "anti")
            .transform(truncate_plan_lazy)
        )
    und.unpersist()
    return mis
