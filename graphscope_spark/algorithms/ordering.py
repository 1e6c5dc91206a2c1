"""Core-based vertex orderings — degeneracy ordering and onion layers.

Reference semantics: `apps/flash/core/degeneracy-ordering.h`
(`/root/reference/analytical_engine/apps/flash/core/degeneracy-ordering.h:
90-110`) and `onion-layer-ordering.h` (same dir) — after computing
coreness, rank vertices by iterated parallel peel rounds:

* **degeneracy order**: rank(v) = the round at which v is removed when each
  round removes every vertex whose residual degree ≤ the graph's
  degeneracy (the max coreness). The removal sequence read rank-by-rank is
  a degeneracy ordering: when v is removed it has ≤ degeneracy remaining
  neighbours.
* **onion layers**: layer(v) = the round at which v is removed when each
  round removes every vertex whose count of remaining neighbours w with
  core(w) ≥ core(v) is ≤ core(v). Layers refine the k-shell decomposition
  (Hébert-Dufresne et al., "Multi-scale structure… onion decomposition").

The reference decrements cached residual degrees incrementally from the
removed frontier; the DataFrame shape recomputes the residual count with
one semi-join + partial aggregate per round over the shrinking remainder —
same fixpoint, deterministic, and exactly mirrored by the unrolled DuckDB
oracles in `__spark_entry__.py`. Progress per round is guaranteed (an empty
removal set would exhibit a (c*+1)-core inside the c*-shell, contradicting
coreness), so rounds ≤ peel-cascade depth, the same bound the `coreness`
h-index iteration already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def degeneracy_order(graph: LinkGraph, max_rounds: int = 500) -> DataFrame:
    """(vid, rank) — 1-based parallel-peel round at which v leaves when
    peeling at the global degeneracy."""
    from graphscope_spark.algorithms.kcore import coreness

    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    dg = coreness(graph).agg(F.max("core")).collect()[0][0] or 0
    spark = graph.vertices.sparkSession
    out = spark.createDataFrame([], "vid long, rank long")
    remaining = graph.vertices.select("vid").transform(truncate_plan)
    for rnd in range(1, max_rounds + 1):
        if remaining.count() == 0:
            break
        e_r = und.join(remaining.withColumnRenamed("vid", "src"), "src").join(
            remaining.withColumnRenamed("vid", "dst"), "dst"
        )
        deg = e_r.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("deg"))
        removed = (
            remaining.join(deg, "vid", "left")
            .where(F.coalesce(F.col("deg"), F.lit(0)) <= dg)
            .select("vid")
            .transform(truncate_plan)
        )
        out = out.unionByName(
            removed.select("vid", F.lit(rnd).cast("long").alias("rank"))
        ).transform(truncate_plan)
        remaining = remaining.join(removed, "vid", "anti").transform(truncate_plan)
    und.unpersist()
    return out


def onion_layers(graph: LinkGraph, max_rounds: int = 500) -> DataFrame:
    """(vid, layer) — 1-based onion layer: round at which v is removed when
    each round removes v iff #{remaining nbrs w : core(w) ≥ core(v)} ≤
    core(v)."""
    from graphscope_spark.algorithms.kcore import coreness

    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    core = coreness(graph).persist()
    core.count()
    spark = graph.vertices.sparkSession
    out = spark.createDataFrame([], "vid long, layer long")
    remaining = core.transform(truncate_plan)  # (vid, core)
    for rnd in range(1, max_rounds + 1):
        if remaining.count() == 0:
            break
        # qualifying residual degree: remaining neighbours with core ≥ own
        e_r = (
            und.join(
                remaining.select(F.col("vid").alias("src"), F.col("core").alias("score")),
                "src",
            )
            .join(
                remaining.select(F.col("vid").alias("dst"), F.col("core").alias("dcore")),
                "dst",
            )
            .where(F.col("score") >= F.col("dcore"))
        )
        qdeg = e_r.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("qdeg"))
        removed = (
            remaining.join(qdeg, "vid", "left")
            .where(F.coalesce(F.col("qdeg"), F.lit(0)) <= F.col("core"))
            .select("vid")
            .transform(truncate_plan)
        )
        out = out.unionByName(
            removed.select("vid", F.lit(rnd).cast("long").alias("layer"))
        ).transform(truncate_plan)
        remaining = remaining.join(removed, "vid", "anti").transform(truncate_plan)
    core.unpersist()
    und.unpersist()
    return out
