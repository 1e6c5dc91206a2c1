"""Bridge detection — BFS spanning forest + XOR non-tree-edge covering.

Reference semantics: `apps/flash/connectivity/bridge.h`
(`/root/reference/analytical_engine/apps/flash/connectivity/bridge.h`) — an
undirected edge is a bridge iff it lies on no cycle.

Spark shape (the classic distributed bridge test; DFS low-link is
inherently sequential so the reference's FLASH variant also avoids it):

1. **BFS spanning forest** — multi-root level-synchronous BFS from each
   component's minimum vid (components via WCC), keeping the minimum-vid
   parent per vertex. Non-tree edges are exactly the cycle-closers.
2. **XOR covering** — give every non-tree edge a 60-bit hash; let
   ``val(v)`` = XOR of hashes of non-tree edges incident to v. A bottom-up
   sweep by BFS level computes ``sub(v)`` = XOR of ``val`` over v's
   subtree, which telescopes to the XOR of the hashes of exactly the
   non-tree edges COVERING tree edge (parent(v), v). A tree edge is a
   bridge iff no non-tree edge covers it — iff ``sub(v) = 0`` (w.h.p.: a
   false zero needs a nonempty hash subset XOR-ing to 0, probability ~2⁻⁶⁰
   per edge). Non-tree edges are never bridges.

Supersteps: 2 × BFS depth + WCC rounds — diameter-bounded, independent of
edge count; every step is a join + partial aggregate (bit_xor), so hub
vertices cost a map-side combine, never an array build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan, truncate_plan_lazy
from graphscope_spark.datapipe.hashing import portable_hash60
from graphscope_spark.graph import LinkGraph


def bridges(graph: LinkGraph, max_rounds: int = 500) -> DataFrame:
    """(a, b) with a<b — the bridge edges of the undirected simple graph."""
    from graphscope_spark.algorithms.wcc import wcc

    sym = graph.undirected_edges(drop_self_loops=True).repartition(F.col("src")).persist()
    sym.count()
    und = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )

    # -- spanning forest: multi-root BFS, min-vid parent --------------------
    comp = wcc(graph).state  # (vid, comp); comp = min vid of the component
    settled = (
        comp.where(F.col("vid") == F.col("comp"))
        .select(
            "vid",
            F.lit(0).cast("long").alias("dist"),
            F.lit(None).cast("long").alias("parent"),
        )
        .transform(truncate_plan_lazy)
    )
    frontier = settled
    depth = 0
    while depth < max_rounds:
        depth += 1
        cand = (
            frontier.join(sym, frontier["vid"] == sym["src"])
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min("src").alias("parent"))
        )
        new = (
            cand.join(settled.select("vid"), "vid", "anti")
            .select("vid", F.lit(depth).cast("long").alias("dist"), "parent")
            .transform(truncate_plan_lazy)
        )
        if new.count() == 0:
            depth -= 1
            break
        settled = settled.unionByName(new).transform(truncate_plan_lazy)
        frontier = new

    tree = settled.where(F.col("parent").isNotNull())
    tree_canon = tree.select(
        F.least("parent", "vid").alias("a"), F.greatest("parent", "vid").alias("b")
    )
    nontree = und.join(tree_canon, ["a", "b"], "anti")

    # -- XOR covering -------------------------------------------------------
    h = portable_hash60(
        F.concat_ws("_", F.col("a").cast("string"), F.col("b").cast("string"))
    )
    nt = nontree.select("a", "b", h.alias("h"))
    ends = nt.select(F.col("a").alias("vid"), "h").unionByName(
        nt.select(F.col("b").alias("vid"), "h")
    )
    val = ends.groupBy("vid").agg(F.expr("bit_xor(h)").alias("val"))

    # bottom-up by level: sub(v) = val(v) XOR xor(sub(children))
    levels = (
        settled.join(val, "vid", "left")
        .select("vid", "dist", "parent", F.coalesce("val", F.lit(0)).alias("val"))
        .transform(truncate_plan)
    )
    spark = graph.vertices.sparkSession
    subs = spark.createDataFrame([], "vid long, dist long, parent long, sub long")
    for d in range(depth, 0, -1):
        child_xor = (
            subs.where(F.col("dist") == d + 1)
            .groupBy(F.col("parent").alias("vid"))
            .agg(F.expr("bit_xor(sub)").alias("cx"))
        )
        lvl = (
            levels.where(F.col("dist") == d)
            .join(child_xor, "vid", "left")
            .select(
                "vid",
                "dist",
                "parent",
                F.when(F.col("cx").isNotNull(), F.expr("val ^ cx"))
                .otherwise(F.col("val"))
                .alias("sub"),
            )
        )
        subs = subs.unionByName(lvl).transform(truncate_plan)

    out = subs.where(F.col("sub") == 0).select(
        F.least("parent", "vid").alias("a"), F.greatest("parent", "vid").alias("b")
    )
    sym.unpersist()
    return out
