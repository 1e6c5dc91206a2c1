"""SimRank similarity via coupled reverse random walks.

Reference semantics: SimRank (Jeh & Widom, KDD 2002) — "two objects are
similar if they are referenced by similar objects":
``s(a,b) = c/(|I(a)||I(b)|) Σ_{i∈I(a), j∈I(b)} s(i,j)``, s(a,a) = 1. The
reference's app library carries the same link-graph similarity family its
`apps/` ranking kernels (pagerank/hits/katz) belong to; SimRank is the
standard pairwise member, and the one a url-url web graph uses for
related-page search.

The exact fixpoint is O(n²) state — not a 100 TB shape. The standard
scalable estimator (Fogaras & Rácz, WWW 2005, "Scaling link-based
similarity search") is Monte Carlo: s(a,b) = E[c^τ], where τ is the FIRST
MEETING TIME of two independent reverse random walks started at a and b
that step simultaneously (τ = 0 when a = b; never-meeting pairs
contribute 0, truncation at L under-estimates by ≤ c^L).

Spark shape: the walk corpus comes from ``learning.random_walks`` on the
TRANSPOSED edge table (deterministic hash-argmin draws → bit-reproducible
across cluster sizes AND DuckDB-replicable, the property the whole gate
leans on). Meetings are ONE equi-join of the query slice against the full
corpus on (walk index, step, position) — collision keys, never pairs — so
work scales with actual position collisions, not |Q|·n. Scores stay
sparse: pairs whose walks never meet (estimate 0) are not materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def simrank_mc(
    graph: LinkGraph,
    queries: DataFrame,
    c: float = 0.6,
    walk_length: int = 5,
    num_walks: int = 8,
    seed: int = 0,
) -> DataFrame:
    """(q, vid, score) — Monte-Carlo SimRank of every query vertex q
    against every vertex its coupled reverse walks ever meet.

    ``queries`` is a (vid) DataFrame. score = (1/R) Σ_walks c^τ over the
    R = ``num_walks`` coupled walk pairs that meet, τ = first common step
    index with equal position. s(q,q) = 1 exactly (a walk always meets
    itself at step 0). Deterministic for a fixed seed."""
    if not 0.0 < c < 1.0:
        raise ValueError(f"decay c must be in (0,1), got {c}")
    from graphscope_spark.learning import random_walks

    rev = LinkGraph(
        vertices=graph.vertices,
        edges=graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        ),
        num_partitions=graph.num_partitions,
    )
    walks = random_walks(
        rev,
        graph.vertices.select("vid"),
        length=walk_length,
        num_walks=num_walks,
        seed=seed,
    ).persist()
    walks.count()
    qw = walks.join(
        queries.select(F.col("vid").alias("root")), "root"
    ).select(
        F.col("root").alias("q"),
        F.col("w").alias("qw_w"),
        F.col("step").alias("qw_step"),
        F.col("vid").alias("pos"),
    )
    vw = walks.select(
        F.col("root").alias("v"),
        F.col("w").alias("vw_w"),
        F.col("step").alias("vw_step"),
        F.col("vid").alias("vpos"),
    )
    meet = qw.join(
        vw,
        (F.col("qw_w") == F.col("vw_w"))
        & (F.col("qw_step") == F.col("vw_step"))
        & (F.col("pos") == F.col("vpos")),
    ).select("q", "v", F.col("qw_w").alias("w"), F.col("qw_step").alias("tau"))
    first = meet.groupBy("q", "v", "w").agg(F.min("tau").alias("tau"))
    out = (
        first.groupBy("q", F.col("v").alias("vid"))
        .agg(
            (F.sum(F.pow(F.lit(float(c)), F.col("tau"))) / num_walks).alias(
                "score"
            )
        )
    )
    from graphscope_spark.bsp import truncate_plan

    out = truncate_plan(out)
    walks.unpersist()
    return out
