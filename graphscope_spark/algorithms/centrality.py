"""Degree / HITS / Katz / eigenvector centrality — aggregation + power-iteration
kernels.

Reference semantics:

* degree centrality: `gs::DegreeCentrality`
  (`/root/reference/analytical_engine/apps/centrality/degree/
  degree_centrality.h`, registered `.gs_conf.yaml:131-137`) —
  ``deg(v) / (N-1)``; in/out/both variants.
* HITS: `gs::HITS` (`apps/hits/hits.h:30+`, `.gs_conf.yaml:123-130`) —
  alternating hub/authority updates with per-round normalization
  (NetworkX-compatible semantics).
* Katz: `gs::KatzCentrality` (`apps/centrality/katz/`, `.gs_conf.yaml:144-149`)
  — ``x' = α·Aᵀx + β`` iterated, L2-normalized at the end.
* eigenvector: `gs::EigenvectorCentrality` (`.gs_conf.yaml:138-143`) — power
  iteration with L2 normalization per round.

All are one-join-one-agg supersteps; fixed round counts keep them
deterministic and DuckDB-oracle-checkable (the gate unrolls the same rounds
in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan, truncate_plan_lazy
from graphscope_spark.graph import LinkGraph


def degree_centrality(graph: LinkGraph, mode: str = "both") -> DataFrame:
    """(vid, dc) — degree / (N-1). ``mode``: 'in' | 'out' | 'both'; 'both'
    uses the undirected simple-graph degree (self-loops dropped), matching
    the reference's default on undirected views."""
    n = graph.vertices.count()
    denom = float(max(n - 1, 1))
    if mode == "out":
        deg = graph.out_degrees().withColumnRenamed("out_deg", "deg")
    elif mode == "in":
        deg = graph.in_degrees().withColumnRenamed("in_deg", "deg")
    else:
        deg = graph.degrees()
    return (
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .select(
            "vid",
            (F.coalesce(F.col("deg"), F.lit(0)) / F.lit(denom)).alias("dc"),
        )
    )


def hits(graph: LinkGraph, rounds: int = 10) -> DataFrame:
    """(vid, hub, auth) after ``rounds`` alternating updates, L1-normalized
    (scores sum to 1), fully deterministic.

    The per-round normalizations are pure scalings and the hub/auth updates
    are linear, so the normalized fixpoint sequence is identical whether we
    normalize every half-step (the textbook recurrence, what the DuckDB gate
    oracle unrolls) or run UNNORMALIZED and rescale occasionally. We exploit
    that: no driver action per half-step — one localCheckpoint+rescale every
    2 rounds bounds both the logical plan (each half-step references
    ``state`` twice → 16× plan nodes between truncations) and float range
    (values grow ~λ² per round; the periodic L1 rescale keeps them near 1
    even for mega-hub graphs). 1 barrier per 2 rounds vs 3 per round before
    — measured ~4× faster on the 5k-vertex gate graph."""
    edges = graph.edges.repartition(F.col("src")).persist()
    edges.count()
    verts = graph.vertices.select("vid")

    state = verts.select(
        "vid", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    )
    for r in range(1, rounds + 1):
        # auth(v) = Σ_{u→v} hub(u)   (unnormalized)
        a = (
            state.select(F.col("vid").alias("src"), "hub")
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("a"))
        )
        state = state.join(a, state["vid"] == a["dst"], "left").select(
            state["vid"], "hub", F.coalesce(F.col("a"), F.lit(0.0)).alias("auth")
        )
        # hub(u) = Σ_{u→v} auth(v)   (unnormalized)
        h = (
            state.select(F.col("vid").alias("dst"), "auth")
            .join(edges, "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("h"))
        )
        state = state.join(h, state["vid"] == h["src"], "left").select(
            state["vid"], F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"), "auth"
        )
        if r % 2 == 0 or r == rounds:
            # lazy: the normalization aggregate below materializes the
            # checkpoint — one job per 2 rounds instead of two
            state = state.transform(truncate_plan_lazy)
            sums = state.agg(
                F.sum("hub").alias("sh"), F.sum("auth").alias("sa")
            ).collect()[0]
            sh, sa = (sums["sh"] or 1.0), (sums["sa"] or 1.0)
            state = state.select(
                "vid",
                (F.col("hub") / F.lit(sh)).alias("hub"),
                (F.col("auth") / F.lit(sa)).alias("auth"),
            )
    edges.unpersist()
    return state.select("vid", "hub", "auth")


def articlerank(graph: LinkGraph, damping: float = 0.85, rounds: int = 10) -> DataFrame:
    """(vid, ar) — ArticleRank, the PageRank variant that damps hub influence
    by the mean out-degree.

    Reference: `apps/flash/ranking/articlerank.h`
    (`/root/reference/analytical_engine/apps/flash/ranking/articlerank.h:47-70`):
    per round over directed edges ``next(v) += d·val(u)/(outdeg(u)+avg)``;
    then ``val = next + (1−d)``; fixed rounds, init val = 0."""
    edges = graph.edges.repartition(F.col("src")).persist()
    edges.count()
    verts = graph.vertices.select("vid")
    n = verts.count()
    odeg = edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    avg = (edges.count() / n) if n else 0.0
    state = verts.join(odeg, "vid", "left").select(
        "vid",
        F.coalesce("deg", F.lit(0)).cast("double").alias("deg"),
        F.lit(0.0).alias("val"),
    )
    for r in range(rounds):
        m = (
            state.select(F.col("vid").alias("src"), "deg", "val")
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("val") / (F.col("deg") + F.lit(avg))).alias("s"))
        )
        state = state.join(m, state["vid"] == m["dst"], "left").select(
            state["vid"],
            "deg",
            (F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(1.0 - damping)).alias("val"),
        )
        if (r + 1) % 3 == 0:
            state = state.transform(truncate_plan)
    edges.unpersist()
    return state.select("vid", F.col("val").alias("ar"))


def personalized_pagerank(
    graph: LinkGraph, source: int, damping: float = 0.5, rounds: int = 10
) -> DataFrame:
    """(vid, ppr) — personalized PageRank from a single source.

    Reference: `apps/flash/ranking/ppr.h`
    (`/root/reference/analytical_engine/apps/flash/ranking/ppr.h:48-70`):
    undirected edges, ``next(v) = Σ_{u∼v} d·val(u)/deg(u)`` plus a constant
    ``d`` restart mass at the source; init val = 1 at source, 0 elsewhere;
    fixed rounds."""
    und = graph.undirected_edges(drop_self_loops=True).repartition(F.col("src")).persist()
    und.count()
    verts = graph.vertices.select("vid")
    deg = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    state = verts.join(deg, "vid", "left").select(
        "vid",
        F.coalesce("deg", F.lit(0)).cast("double").alias("deg"),
        F.when(F.col("vid") == source, 1.0).otherwise(0.0).alias("val"),
    )
    for r in range(rounds):
        m = (
            state.select(F.col("vid").alias("src"), "deg", "val")
            .join(und, "src")
            .groupBy("dst")
            .agg(F.sum(F.lit(damping) * F.col("val") / F.col("deg")).alias("s"))
        )
        state = state.join(m, state["vid"] == m["dst"], "left").select(
            state["vid"],
            "deg",
            (
                F.coalesce(F.col("s"), F.lit(0.0))
                + F.when(state["vid"] == source, F.lit(damping)).otherwise(0.0)
            ).alias("val"),
        )
        if (r + 1) % 3 == 0:
            state = state.transform(truncate_plan)
    und.unpersist()
    return state.select("vid", F.col("val").alias("ppr"))


def katz(
    graph: LinkGraph, alpha: float = 0.1, beta: float = 1.0, rounds: int = 10
) -> DataFrame:
    """(vid, katz) — ``x' = α·Σ_{u→v} x(u) + β`` iterated ``rounds`` times
    (message flows along edge direction), then L2-normalized."""
    P = graph.num_partitions
    edges = graph.edges.repartition(F.col("src")).persist()
    edges.count()
    verts = graph.vertices.select("vid")
    state = verts.select("vid", F.lit(1.0).alias("x"))
    for r in range(rounds):
        m = (
            state.select(F.col("vid").alias("src"), "x")
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("x").alias("s"))
        )
        state = state.join(m, state["vid"] == m["dst"], "left").select(
            state["vid"],
            (F.lit(alpha) * F.coalesce(F.col("s"), F.lit(0.0)) + F.lit(beta)).alias("x"),
        )
        if (r + 1) % 3 == 0:
            state = state.transform(truncate_plan)
    edges.unpersist()
    norm = state.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).collect()[0][0] or 1.0
    return state.select("vid", (F.col("x") / F.lit(norm)).alias("katz"))


def eigenvector_centrality(graph: LinkGraph, rounds: int = 20) -> DataFrame:
    """(vid, ec) — power iteration on Aᵀ (in-edge sum) with per-round L2
    normalization, fixed ``rounds``. One action per round: the norm collect
    doubles as the cache-materializing step (GRAPE Sum() allreduce analog)."""
    P = graph.num_partitions
    edges = graph.edges.repartition(F.col("src")).persist()
    edges.count()
    verts = graph.vertices.select("vid")
    state = verts.select("vid", F.lit(1.0).alias("x"))
    for _ in range(rounds):
        m = (
            state.select(F.col("vid").alias("src"), "x")
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("x").alias("s"))
        )
        state = state.join(m, state["vid"] == m["dst"], "left").select(
            state["vid"], F.coalesce(F.col("s"), F.lit(0.0)).alias("x")
        )
        # truncate (lazily) BEFORE the norm aggregate so the collect is the
        # materializing action — one job per round, not two; the post-norm
        # scaling is a pure projection over the checkpointed RDD
        state = state.transform(truncate_plan_lazy)
        norm = state.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).collect()[0][0] or 1.0
        state = state.withColumn("x", F.col("x") / F.lit(norm))
    edges.unpersist()
    return state.select("vid", F.col("x").alias("ec"))


def trustrank(
    graph: LinkGraph,
    seeds: list[int],
    alpha: float = 0.85,
    rounds: int = 10,
) -> DataFrame:
    """(vid, trust) — TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB'04): PageRank whose teleport vector is uniform over a trusted
    SEED SET instead of all vertices — the classic web-spam-demotion
    ranking on exactly this tier's Common-Crawl link graph. Directed
    out-link propagation, dangling mass re-teleported to the seeds,
    fixed ``rounds`` power iterations (the paper's M=20 methodology;
    the single-source ``personalized_pagerank`` is the flash `ppr.h`
    undirected variant — different reference semantics, kept separate).

    Scale shape = `pagerank`: the edge list persists hash-partitioned on
    the join key, each round shuffles only the rank column, and the
    dangling aggregate is the one driver scalar per round."""
    spark = graph.edges.sparkSession
    de = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(F.col("src"))
        .persist()
    )
    de.count()
    od = de.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("double").alias("od")
    )
    seed_df = spark.createDataFrame(
        [(int(s),) for s in seeds], "vid long"
    )
    ns = float(len(seeds))
    verts = graph.vertices.select("vid")
    state = (
        verts.join(od, "vid", "left")
        .join(seed_df.withColumn("__seed", F.lit(1)), "vid", "left")
        .select(
            "vid",
            "od",
            F.coalesce("__seed", F.lit(0)).alias("is_seed"),
            (F.coalesce("__seed", F.lit(0)) / F.lit(ns)).alias("val"),
        )
    )
    for r in range(rounds):
        dang = (
            state.where(F.col("od").isNull())
            .agg(F.sum("val"))
            .collect()[0][0]
            or 0.0
        )
        m = (
            state.where(F.col("od").isNotNull())
            .select(F.col("vid").alias("src"), "od", "val")
            .join(de, "src")
            .groupBy("dst")
            .agg(F.sum(F.lit(alpha) * F.col("val") / F.col("od")).alias("s"))
        )
        teleport = (1.0 - alpha) + alpha * float(dang)
        state = state.join(m, state["vid"] == m["dst"], "left").select(
            state["vid"],
            "od",
            "is_seed",
            (
                F.coalesce(F.col("s"), F.lit(0.0))
                + F.col("is_seed") * F.lit(teleport / ns)
            ).alias("val"),
        )
        if (r + 1) % 3 == 0:
            state = state.transform(truncate_plan)
    de.unpersist()
    return state.select("vid", F.col("val").alias("trust"))
