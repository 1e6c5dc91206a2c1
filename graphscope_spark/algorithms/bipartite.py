"""Bipartite projection — co-occurrence graphs from two-mode edge tables.

Reference semantics: the NetworkX-compatible layer's bipartite projections
(`networkx/algorithms/bipartite/projection.py` — `projected_graph` /
`weighted_projected_graph` / `overlap_weighted_projected_graph`; the
reference exposes NetworkX algorithm parity as its nx surface, SURVEY
§2.6), and the same two-mode → one-mode step `lpa_u2i`'s user↔item graph
implies. On a web corpus this is host↔token, doc↔entity, order↔part:
"connect two left vertices by how many right vertices they share".

Spark shape: group by the right-side vertex and emit within-group pairs —
ONE self-join of the deduplicated edge table on the right key, never an
all-pairs product. The blow-up is Σ_r deg(r)², so hot right vertices are
the skew risk; ``max_degree`` drops right vertices above the cap (the
``ngram_jaccard`` max_df contract: a documented approximation — a right
vertex shared by thousands of left vertices carries no similarity signal,
exactly the stop-word argument). Weights: raw co-occurrence count, or
Jaccard overlap w/(deg_a + deg_b − w) (the overlap-weighted projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_projection(
    edges: DataFrame,
    left_col: str = "src",
    right_col: str = "dst",
    weight: str = "count",
    max_degree: int = 10_000,
    min_weight: int = 1,
) -> DataFrame:
    """(a, b, w[, jaccard]) — one-mode projection onto the LEFT vertex
    set: a < b, w = #shared right vertices (after the ``max_degree`` hot
    cap), ``weight='jaccard'`` adds jaccard = w/(deg_a + deg_b − w) with
    degrees over the SAME capped edge set (so the ratio is internally
    consistent). Pairs below ``min_weight`` are dropped."""
    if weight not in ("count", "jaccard"):
        raise ValueError(f"weight must be 'count' or 'jaccard', got {weight!r}")
    if max_degree < 1:
        raise ValueError(f"max_degree must be >= 1, got {max_degree}")
    e = edges.select(
        F.col(left_col).alias("l"), F.col(right_col).alias("r")
    ).distinct()
    rdeg = e.groupBy("r").agg(F.count("*").alias("rd"))
    # the capped edge set feeds three branches (pair join twice + the
    # left-degree table) — persist it once instead of re-deriving the
    # distinct + cap subtree per branch
    kept = e.join(
        rdeg.where(F.col("rd") <= max_degree).select("r"), "r"
    ).persist()
    try:
        a = kept.select(F.col("l").alias("a"), "r")
        b = kept.select(F.col("l").alias("b"), "r")
        pairs = (
            a.join(b, "r")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("w"))
            .where(F.col("w") >= min_weight)
        )
        if weight == "count":
            from graphscope_spark.bsp import truncate_plan

            return truncate_plan(pairs)
        ldeg = kept.groupBy("l").agg(F.count("*").cast("long").alias("ld"))
        da = ldeg.select(F.col("l").alias("a"), F.col("ld").alias("da"))
        db = ldeg.select(F.col("l").alias("b"), F.col("ld").alias("db"))
        out = (
            pairs.join(da, "a")
            .join(db, "b")
            .select(
                "a",
                "b",
                "w",
                (
                    F.col("w")
                    / (F.col("da") + F.col("db") - F.col("w")).cast("double")
                ).alias("jaccard"),
            )
        )
        from graphscope_spark.bsp import truncate_plan

        return truncate_plan(out)
    finally:
        kept.unpersist()
