"""Seeded label spreading — semi-supervised node classification.

Reference semantics: the clamped-seed variant of the reference's CDLP
kernel family (`apps/cdlp/`, mode-with-min-tie-break voting) — Zhu &
Ghahramani (2002) label propagation with known labels held fixed: a small
seed set carries ground-truth classes; every synchronous round, each
UNLABELED vertex adopts the majority label among its labeled neighbours
(ties → smallest label id); seeds never change. This is the node-
classification primitive GLE's supervised pipelines assume, runnable
before any GNN exists.

Spark shape: identical to cdlp — one symmetric-edge join + one
(vid, label) count aggregate + one argmax per round; the clamp is a
``when(is_seed, seed_label)`` branch, free in codegen. The frontier is
naturally monotone (labels only ever appear, never disappear), so round
count is bounded by the graph's unlabeled eccentricity from the seed set.
Deterministic throughout → exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import release_truncated, truncate_plan
from graphscope_spark.graph import LinkGraph


def label_spreading(
    graph: LinkGraph,
    seeds: DataFrame,
    rounds: int = 4,
) -> DataFrame:
    """(vid, label) — clamped-seed majority propagation. ``seeds`` is a
    (vid, label) DataFrame of known classes; after ``rounds`` synchronous
    votes every vertex reachable within ``rounds`` hops of a seed carries
    a label, the rest stay NULL."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    sym = graph.undirected_edges(drop_self_loops=True).persist()
    sym.count()
    sd = seeds.select(
        "vid", F.col("label").cast("long").alias("seed_label")
    )
    state = truncate_plan(
        graph.vertices.select("vid")
        .join(sd, "vid", "left")
        .select("vid", F.col("seed_label").alias("label"))
    )
    clamp = graph.vertices.select("vid").join(sd, "vid", "left")
    spent = []
    for _ in range(rounds):
        votes = (
            sym.join(
                state.where(F.col("label").isNotNull()).select(
                    F.col("vid").alias("src"), F.col("label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vid"), "label")
            .agg(F.count("*").alias("n"))
        )
        winner = votes.groupBy("vid").agg(
            F.min_by(F.col("label"), F.struct((-F.col("n")).alias("nn"), F.col("label"))).alias("win")
        )
        spent.append(state)
        state = truncate_plan(
            clamp.join(
                state.select(F.col("vid"), F.col("label").alias("cur")), "vid"
            )
            .join(winner, "vid", "left")
            .select(
                "vid",
                F.coalesce("seed_label", "win", "cur").alias("label"),
            )
        )
    for st in spent:
        release_truncated(st)
    sym.unpersist()
    return state
