"""Local graph clustering — seeded PPR mass + sweep cut.

Reference semantics: the local-community family the reference's analytical
apps expose around a seed set (e.g. `apps/kcore/kcore_search` localizes by
seed; community kernels `cdlp`/`louvain` are global) — re-expressed as the
classic PPR sweep (Andersen, Chung & Lang, FOCS 2006, "Local graph
partitioning using PageRank vectors"): approximate the personalized
PageRank vector around a seed, order vertices by degree-normalized mass,
and take the prefix with minimum conductance.

PPR here is the TRUNCATED LAZY-WALK POWER SERIES, not thresholded push:
with W = (I + D⁻¹A)/2 (lazy uniform walk; degree-0 rows keep their mass),

    p = α Σ_{k<K} ((1−α) W)^k e_seed,

computed over the SPARSE support only — state holds the nonzero-residual
rows, which grow one hop per round, so work is local to the seed's
K-neighborhood, never the graph. Fully deterministic (no thresholds whose
float comparisons could diverge across engines), so the entire operator —
mass, ordering, prefix conductances, best cut — has an exact DuckDB
mirror. Truncation under-estimates each mass by ≤ (1−α)^K.

The sweep is windowed prefix arithmetic over the support set (ranked by
p/d, ties by vid): vol(k) = Σ_{i≤k} d_i, cut(k) counts support-internal
edges via +1/−1 events at the endpoint ranks (an edge crosses the prefix
boundary for min_rank ≤ k < max_rank) plus every support→non-support
edge for k ≥ rank(inner endpoint); cond(k) = cut(k)/min(vol, 2m−vol).
Support sets are O(K-ball) sized — the windows run over that, not n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def seeded_ppr(
    graph: LinkGraph,
    seed_vid: int,
    alpha: float = 0.15,
    rounds: int = 6,
) -> DataFrame:
    """(vid, p) — truncated lazy-walk PPR mass around ``seed_vid``
    (sparse: only vertices reached within ``rounds`` hops appear)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    spark = graph.vertices.sparkSession
    und = graph.undirected_edges(drop_self_loops=True).persist()
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("double").alias("d")
    )
    r = spark.createDataFrame([(int(seed_vid), 1.0)], "vid long, r double")
    p = spark.createDataFrame([], "vid long, p double")
    for _ in range(rounds):
        p = (
            p.join(r, "vid", "full")
            .select(
                "vid",
                (
                    F.coalesce("p", F.lit(0.0))
                    + alpha * F.coalesce("r", F.lit(0.0))
                ).alias("p"),
            )
            .transform(truncate_plan)
        )
        rd = r.join(deg, "vid", "left").select(
            "vid", "r", F.coalesce("d", F.lit(0.0)).alias("d")
        )
        # lazy-walk split of the non-teleported mass: half stays, half
        # spreads over neighbors; degree-0 rows keep it all
        stay = rd.select(
            "vid",
            F.when(F.col("d") > 0, (1.0 - alpha) / 2 * F.col("r"))
            .otherwise((1.0 - alpha) * F.col("r"))
            .alias("m"),
        )
        spread = (
            rd.where(F.col("d") > 0)
            .join(und, rd["vid"] == und["src"])
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum((1.0 - alpha) / 2 * F.col("r") / F.col("d")).alias("m"))
        )
        r = (
            stay.unionByName(spread)
            .groupBy("vid")
            .agg(F.sum("m").alias("r"))
            .transform(truncate_plan)
        )
    und.unpersist()
    return p.where(F.col("p") > 0)


def local_community(
    graph: LinkGraph,
    seed_vid: int,
    alpha: float = 0.15,
    rounds: int = 6,
) -> DataFrame:
    """(vid, rank, p, cond, in_best) — the ACL sweep over the seeded-PPR
    support: vertices ordered by p/d (ties by vid), each prefix's
    conductance, and the best-prefix membership flag (the local community
    around ``seed_vid``). Prefixes with min(vol, 2m−vol) = 0 get cond 1.0
    (the seed isolated in an edgeless region yields the trivial cut)."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    two_m = und.count()  # = 2m (table is symmetric)
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("double").alias("d")
    )
    p = seeded_ppr(graph, seed_vid, alpha=alpha, rounds=rounds)
    sup = (
        p.join(deg, "vid", "left")
        .select("vid", "p", F.coalesce("d", F.lit(0.0)).alias("d"))
        .withColumn(
            # quantize the sweep key to 2^-40 before ranking (the node2vec
            # bias-key contract): vertices in symmetric positions have
            # EXACTLY equal true p/d but accumulate their float sums in
            # different orders per engine — an ulp-level difference must
            # not decide the order, the vid tie-break must
            "rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.floor(
                        F.col("p")
                        / F.greatest("d", F.lit(1.0))
                        * F.lit(float(1 << 40))
                    ).desc(),
                    F.col("vid").asc(),
                )
            )
            .cast("long"),
        )
        .persist()
    )
    ra = sup.select(F.col("vid").alias("src"), F.col("rank").alias("ra"))
    rb = sup.select(F.col("vid").alias("dst"), F.col("rank").alias("rb"))
    # support-incident edges, one row per symmetric direction; ra = the
    # support endpoint's rank, rb = other endpoint's rank (null if outside)
    inc = und.join(ra, "src").join(rb, "dst", "left")
    # +1/−1 cut events over prefix size k: an internal edge (both ranked)
    # crosses for min ≤ k < max — counted once (from its min side, /1) —
    # while a boundary edge (rb null) crosses for every k ≥ ra
    events = inc.select(
        F.when(
            F.col("rb").isNull(), F.struct(F.col("ra").alias("k"), F.lit(1).alias("e"))
        )
        .when(
            F.col("ra") < F.col("rb"),
            F.struct(F.col("ra").alias("k"), F.lit(1).alias("e")),
        )
        .otherwise(F.struct(F.col("ra").alias("k"), F.lit(-1).alias("e")))
        .alias("ev")
    ).select(F.col("ev.k").alias("k"), F.col("ev.e").alias("e"))
    cuts = events.groupBy("k").agg(F.sum("e").cast("double").alias("dc"))
    w = Window.orderBy("rank")
    swept = (
        sup.join(cuts, sup["rank"] == cuts["k"], "left")
        .select("vid", "rank", "p", "d", F.coalesce("dc", F.lit(0.0)).alias("dc"))
        .withColumn("vol", F.sum("d").over(w))
        .withColumn("cut", F.sum("dc").over(w))
        .withColumn(
            "cond",
            F.when(
                F.least(F.col("vol"), F.lit(float(two_m)) - F.col("vol")) > 0,
                F.col("cut")
                / F.least(F.col("vol"), F.lit(float(two_m)) - F.col("vol")),
            ).otherwise(F.lit(1.0)),
        )
    )
    # best-cut selection on the 1e-9-rounded conductance (same rationale:
    # near-tie prefixes must resolve by rank, not by the last ulp)
    best = swept.agg(
        F.min_by(
            F.col("rank"), F.struct(F.round(F.col("cond"), 9), F.col("rank"))
        ).alias("k")
    ).collect()[0]["k"]
    out = truncate_plan(
        swept.select(
            "vid",
            "rank",
            "p",
            "cond",
            (F.col("rank") <= best).alias("in_best"),
        )
    )
    sup.unpersist()
    und.unpersist()
    return out
