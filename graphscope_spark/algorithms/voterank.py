"""VoteRank — iterative influential-vertex selection.

Reference: `gs::VoteRank` (`/root/reference/analytical_engine/apps/voterank/
voterank.h`, registered `.gs_conf.yaml:299-306`; NetworkX-compatible
semantics): every vertex starts with voting ability 1; each round every
vertex's score is the sum of its (undirected) neighbors' voting abilities;
the highest-scoring vertex (ties → smallest id) is elected, its ability is
zeroed, and each of its neighbors loses 1/⟨k⟩ ability (floored at 0), where
⟨k⟩ is the graph's average degree. Repeat ``num_vertices`` times.

Spark shape: one join-agg per round for scores, a driver-side top-1 collect
(the reference's repeated arg-max, SURVEY.md §2.4 "sort/limit/top-k"), and a
broadcast-condition ability update. O(rounds) supersteps — VoteRank is
inherently sequential in its elections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def voterank(graph: LinkGraph, num_vertices: int = 10) -> DataFrame:
    """Returns (rank, vid) — the first ``num_vertices`` elected vertices in
    election order (rank starts at 1)."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    n_edges_sym = und.count()
    n = graph.vertices.count()
    avg_k = n_edges_sym / n if n else 1.0  # sym table counts each edge twice → avg degree
    penalty = 1.0 / avg_k if avg_k else 1.0

    spark = graph.vertices.sparkSession
    ability = graph.vertices.select("vid", F.lit(1.0).alias("ab"))
    elected: list[tuple[int, int]] = []
    excluded: set[int] = set()
    for rnd in range(1, num_vertices + 1):
        scores = (
            ability.select(F.col("vid").alias("src"), "ab")
            .join(und, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("ab").alias("s"))
        )
        cand = scores
        if excluded:
            # anti-join against a small DataFrame, not a growing `isin`
            # literal list — at 10^4 elections the literal plan is O(k²)
            ex_df = spark.createDataFrame(
                [(int(v),) for v in excluded], "vid long"
            )
            cand = scores.join(F.broadcast(ex_df), "vid", "anti")
        # round before argmax: scores are float sums whose last bits depend
        # on reduction order; ties must resolve by vid identically on any
        # partitioning (and in the DuckDB oracle)
        top = (
            cand.orderBy(F.round(F.col("s"), 9).desc(), F.col("vid").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        winner = int(top[0]["vid"])
        elected.append((rnd, winner))
        excluded.add(winner)
        nbrs = und.where(F.col("src") == winner).select(F.col("dst").alias("vid"))
        ability = (
            ability.join(nbrs.withColumn("_n", F.lit(1)), "vid", "left")
            .select(
                "vid",
                F.when(F.col("vid") == winner, 0.0)
                .when(F.col("_n").isNotNull(), F.greatest(F.col("ab") - penalty, F.lit(0.0)))
                .otherwise(F.col("ab"))
                .alias("ab"),
            )
            .transform(truncate_plan)
        )
    und.unpersist()
    return spark.createDataFrame(elected, "rank long, vid long")
