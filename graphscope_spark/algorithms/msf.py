"""Minimum spanning forest — Boruvka rounds.

Reference semantics: `apps/flash/spanning-tree/msf.h`
(`/root/reference/analytical_engine/apps/flash/` spanning-tree family) —
classic Boruvka: every component picks its lightest outgoing edge, chosen
edges merge components, repeat; O(log n) rounds.

Determinism: edges are ordered by the lexicographic key (w, a, b), which
makes weights effectively unique, so THE minimum spanning forest is unique
and oracle-checkable (the gate pins an independent Python Kruskal's
output).

Spark shape per round: one join to label edge endpoints with their
component, one min_by aggregate per component (partial-aggregated — a
mega-component costs a map-side combine), then a small label-contraction
fixpoint over the chosen-edge component graph (size = #components, shrinks
geometrically)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan_lazy
from graphscope_spark.graph import LinkGraph


def minimum_spanning_forest(
    graph: LinkGraph, weight: Column | None = None, max_rounds: int = 64
) -> DataFrame:
    """(a, b, w) — edges of the canonical minimum spanning forest of the
    undirected simple graph. ``weight`` is a Column over (a, b); default
    deterministic ``(a + b) % 10 + 1`` (mirrored in the gate oracle)."""
    if weight is None:
        weight = (F.pmod(F.col("a") + F.col("b"), F.lit(10)) + 1).cast("double")
    und = (
        graph.undirected_edges(drop_self_loops=True)
        .where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .select("a", "b", weight.alias("w"))
        .persist()
    )
    und.count()
    spark = graph.vertices.sparkSession
    comp = graph.vertices.select("vid", F.col("vid").alias("c")).transform(truncate_plan_lazy)
    forest = spark.createDataFrame([], "a long, b long, w double")

    for _ in range(max_rounds):
        lab = (
            und.join(comp.select(F.col("vid").alias("a"), F.col("c").alias("ca")), "a")
            .join(comp.select(F.col("vid").alias("b"), F.col("c").alias("cb")), "b")
            .where(F.col("ca") != F.col("cb"))
        )
        # each component's lightest outgoing edge, (w, a, b) tie-break
        sides = lab.select(F.col("ca").alias("c"), "a", "b", "w", "ca", "cb").unionByName(
            lab.select(F.col("cb").alias("c"), "a", "b", "w", "ca", "cb")
        )
        chosen = (
            sides.groupBy("c")
            .agg(
                F.min_by(
                    F.struct("a", "b", "w", "ca", "cb"), F.struct("w", "a", "b")
                ).alias("e")
            )
            .select("e.a", "e.b", "e.w", "e.ca", "e.cb")
            .distinct()
            .transform(truncate_plan_lazy)
        )
        if chosen.count() == 0:
            break
        forest = forest.unionByName(chosen.select("a", "b", "w")).transform(truncate_plan_lazy)
        # contract: min-label fixpoint over the chosen component-pairs
        pairs = chosen.select(F.col("ca").alias("x"), F.col("cb").alias("y"))
        mapping = (
            pairs.select(F.col("x").alias("c"))
            .unionByName(pairs.select(F.col("y").alias("c")))
            .distinct()
            .select("c", F.col("c").alias("root"))
            .transform(truncate_plan_lazy)
        )
        sym = pairs.unionByName(pairs.select(F.col("y").alias("x"), F.col("x").alias("y")))
        while True:
            m = (
                sym.join(mapping.select(F.col("c").alias("x"), F.col("root").alias("rx")), "x")
                .groupBy(F.col("y").alias("c"))
                .agg(F.min("rx").alias("nroot"))
            )
            # fused pointer-doubling jump root(c) ← root(root(c)): sound
            # because root chains stay within one merged component; makes
            # the fixpoint O(log chain) rounds instead of O(chain) (hook
            # chains of chosen edges can be long in early Boruvka rounds)
            jump = mapping.select(
                F.col("c").alias("root"), F.col("root").alias("rr")
            )
            nroot = F.least(
                F.col("root"),
                F.coalesce("nroot", F.col("root")),
                F.coalesce("rr", F.col("root")),
            )
            upd = (
                mapping.join(m, "c", "left")
                .join(jump, "root", "left")
                .select(
                    "c",
                    nroot.alias("root"),
                    (nroot < F.col("root")).alias("chg"),
                )
                .transform(truncate_plan_lazy)
            )
            changed = upd.where("chg").count()
            mapping = upd.select("c", "root")
            if changed == 0:
                break
        comp = (
            comp.join(mapping, "c", "left")
            .select("vid", F.coalesce("root", F.col("c")).alias("c"))
            .transform(truncate_plan_lazy)
        )
    und.unpersist()
    return forest
