"""Link-prediction scores over the undirected simple graph.

The classic NetworkX link-prediction family (reference exposes NetworkX
compatibility through its nx layer, `python/graphscope/nx/`; these scores
are also the feature side of the GLE-lite link-prediction pipeline —
`gen_edge_labels` / `negative_sample` produce the training pairs, this
module produces their structural features):

* common_neighbors(u, v)        = |Γ(u) ∩ Γ(v)|
* jaccard_coefficient(u, v)     = |Γu ∩ Γv| / |Γu ∪ Γv|
* adamic_adar(u, v)             = Σ_{w ∈ Γu∩Γv} 1 / ln(deg(w))
* resource_allocation(u, v)     = Σ_{w ∈ Γu∩Γv} 1 / deg(w)
* preferential_attachment(u, v) = deg(u) · deg(v)

Scored pairs are the distance-2 non-adjacent pairs (≥1 common neighbor,
no edge) — every pair any of the neighborhood-overlap scores can rank
above zero, without materializing the quadratic non-edge set.

Scale notes (100 TB plan): the wedge enumeration is ONE self-join of the
symmetrized edge table keyed on the middle vertex, followed by a map-side
partially-aggregated groupBy on the (u, v) pair — two shuffles total.
Work is Σ_w deg(w)², so power-law hubs dominate; ``max_middle_degree``
bounds the per-middle fan-out by skipping hub middles (the standard
documented approximation — a hub shared by u and v contributes the least
informative evidence anyway, cf. the Adamic-Adar 1/ln(deg) discount).
Every common neighbor w has deg(w) ≥ 2 by construction, so 1/ln(deg(w))
is always finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def link_prediction(
    graph: LinkGraph, max_middle_degree: int | None = None
) -> DataFrame:
    """(u, v, cn, jaccard, adamic_adar, resource_allocation,
    preferential_attachment) for all non-adjacent unordered pairs u < v
    with at least one common neighbor in the undirected simple graph."""
    # Persist the symmetrized edge set: it feeds FOUR branches of one plan
    # (both wedge sides, the non-adjacency anti-join, and the degree
    # aggregate) and its distinct() shuffle is the dominant cost at scale —
    # unpersisted, Spark recomputes it per branch (the cdlp loop persists
    # for the same reason). Cache lives for the session (the result plan
    # references it lazily, so there is no safe in-function unpersist point).
    sym = graph.undirected_edges().persist()  # (src, dst) both ways, loop-free
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg")
    )  # undirected degree, derived from the SAME cached frame

    mid_deg = deg.select(
        F.col("vid").alias("mid"), F.col("deg").alias("mid_deg")
    )
    if max_middle_degree is not None:
        mid_deg = mid_deg.where(F.col("mid_deg") <= max_middle_degree)

    a = sym.select(F.col("dst").alias("u"), F.col("src").alias("mid"))
    b = sym.select(F.col("src").alias("mid"), F.col("dst").alias("v"))
    wedges = (
        a.join(mid_deg, "mid")
        .join(b, "mid")
        .where(F.col("u") < F.col("v"))
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("mid_deg"))).alias("adamic_adar"),
        F.sum(F.lit(1.0) / F.col("mid_deg")).alias("resource_allocation"),
    )

    # keep only NON-adjacent pairs: anti-join the canonical undirected edges
    und = sym.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    scores = scores.join(und, ["u", "v"], "anti")

    du = deg.select(F.col("vid").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("vid").alias("v"), F.col("deg").alias("dv"))
    return (
        scores.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            (
                F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn"))
            ).alias("jaccard"),
            "adamic_adar",
            "resource_allocation",
            (F.col("du") * F.col("dv")).alias("preferential_attachment"),
        )
    )
