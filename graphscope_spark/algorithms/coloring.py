"""Greedy graph coloring and fluid communities.

Reference semantics:

* `apps/flash/clustering/color.h`
  (`/root/reference/analytical_engine/apps/flash/clustering/color.h:40-86`)
  — iterated synchronous greedy: every vertex starts at color 0; each round
  it gathers the CURRENT colors of its higher-(deg,id) neighbours and
  recolors itself to the minimum excluded value (mex); repeat until no
  vertex changes. The fixpoint is a proper coloring of the (deg,id)-DAG
  orientation: a vertex's color always differs from every higher neighbour.
* `apps/flash/clustering/fluid-community.h`
  (`.../clustering/fluid-community.h:40-105`) — k seed communities expand:
  each vertex adopts the community with maximal local density
  Σ_{nb in C} 1/|C| (own membership counts once), recomputing community
  sizes |C| every round. The reference seeds randomly (`rand_r`) and
  updates asynchronously (`VertexMapSeq`); for a deterministic,
  oracle-checkable operator this version seeds the k smallest portable-
  hash-priority vertices and runs synchronous rounds with exact argmax
  tie-breaks (smaller community id wins; a vertex switches only on a
  STRICT density improvement — the reference's 1e-10 epsilon).

Spark shapes:

* color: per round one edge-join + ``collect_set`` over higher neighbours,
  then mex = ``array_min(filter(sequence(0, size), i -> !contains))`` —
  pure codegen, no UDF. The set a hub gathers is bounded by its higher-
  order degree; rounds = the longest strictly-increasing (deg,id) path
  that actually forces a recolor (O(log n)-ish on web graphs).
* fluid: density comparisons are single IEEE divisions of integer counts
  (m/|C|) — bit-identical in Spark and DuckDB, so the unrolled oracle is
  exact; per round two shuffles (community sizes, neighbour-label counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan, truncate_plan_lazy
from graphscope_spark.datapipe.hashing import portable_hash60
from graphscope_spark.graph import LinkGraph


def color(graph: LinkGraph, max_rounds: int = 100) -> DataFrame:
    """(vid, color) — reference color.h fixpoint (mex over higher-(deg,id)
    neighbours' current colors, iterated synchronously to stability)."""
    deg = graph.degrees()
    okey = F.struct(F.col("deg").alias("d"), F.col("vid").alias("v"))
    keys = graph.vertices.join(deg, "vid", "left").select(
        "vid", F.coalesce("deg", F.lit(0)).alias("deg")
    ).select("vid", okey.alias("okey"))
    sym = graph.undirected_edges(drop_self_loops=True)
    # (vid, hi) — higher-(deg,id) neighbours hi of vid
    hi_edges = (
        sym.join(keys.select(F.col("vid").alias("src"), F.col("okey").alias("ks")), "src")
        .join(keys.select(F.col("vid").alias("dst"), F.col("okey").alias("kd")), "dst")
        .where(F.col("ks") > F.col("kd"))
        .select(F.col("dst").alias("vid"), F.col("src").alias("hi"))
        .repartition(F.col("vid"))
        .persist()
    )
    hi_edges.count()
    colors = graph.vertices.select(
        "vid", F.lit(0).cast("long").alias("c")
    ).transform(truncate_plan)
    for _ in range(max_rounds):
        used = (
            hi_edges.join(
                colors.select(F.col("vid").alias("hi"), F.col("c").alias("hc")), "hi"
            )
            .groupBy("vid")
            .agg(F.collect_set("hc").alias("used"))
        )
        mex = F.array_min(
            F.filter(
                F.sequence(F.lit(0).cast("long"), F.size("used").cast("long")),
                lambda i: ~F.array_contains(F.col("used"), i),
            )
        )
        nxt = (
            colors.join(used, "vid", "left")
            .select(
                "vid",
                F.when(F.col("used").isNull(), F.lit(0).cast("long"))
                .otherwise(mex)
                .alias("c"),
                F.col("c").alias("old"),
            )
        ).transform(truncate_plan_lazy)
        changed = nxt.where(F.col("c") != F.col("old")).count()
        colors = nxt.select("vid", "c")
        if changed == 0:
            break
    else:
        # a monotone-(deg,id) path propagates the recolor wave one hop per
        # round, so hitting the budget means the result may not yet be a
        # proper coloring — surface it rather than return silently
        hi_edges.unpersist()
        raise RuntimeError(
            f"color: no fixpoint within max_rounds={max_rounds} "
            f"({changed} vertices still recoloring); raise max_rounds"
        )
    hi_edges.unpersist()
    return colors.select("vid", F.col("c").alias("color"))


def fluid_community(
    graph: LinkGraph, k: int = 10, max_rounds: int = 15
) -> DataFrame:
    """(vid, comm) — deterministic fluid communities; comm = seed vid, or
    −1 for vertices no community ever reached."""
    sym = graph.undirected_edges(drop_self_loops=True).repartition(
        F.col("src")
    ).persist()
    sym.count()
    seeds = (
        graph.vertices.select(
            "vid", portable_hash60(F.col("vid").cast("string")).alias("h")
        )
        .orderBy("h", "vid")
        .limit(k)
        .select("vid", F.col("vid").alias("lab"))
    )
    lab = (
        graph.vertices.select("vid")
        .join(seeds, "vid", "left")
        .transform(truncate_plan)
    )
    for _ in range(max_rounds):
        sizes = lab.where(F.col("lab").isNotNull()).groupBy("lab").agg(
            F.count("*").alias("csize")
        )
        # neighbour-label counts m(v, lab), plus own membership (+1)
        nbr = (
            sym.join(
                lab.select(F.col("vid").alias("src"), F.col("lab").alias("slab")), "src"
            )
            .where(F.col("slab").isNotNull())
            .groupBy(F.col("dst").alias("vid"), F.col("slab").alias("lab"))
            .agg(F.count("*").alias("m"))
        )
        own = lab.where(F.col("lab").isNotNull()).select(
            "vid", "lab", F.lit(1).alias("m")
        )
        scores = (
            nbr.unionByName(own)
            .groupBy("vid", "lab")
            .agg(F.sum("m").alias("m"))
            .join(sizes, "lab")
            .select(
                "vid",
                "lab",
                (F.col("m").cast("double") / F.col("csize").cast("double")).alias("s"),
            )
        )
        # argmax score with tie → smaller lab: take the max score per
        # vertex, then the min label achieving it (exact double equality —
        # both engines compare the identical IEEE value). A struct-max with
        # a negated label would overflow for LONG_MIN vids.
        mx = scores.groupBy("vid").agg(F.max("s").alias("bs"))
        best = (
            scores.join(mx, "vid")
            .where(F.col("s") == F.col("bs"))
            .groupBy("vid", "bs")
            .agg(F.min("lab").alias("blab"))
        )
        # own-label score for the strict-improvement rule
        own_score = scores.select(
            F.col("vid").alias("ovid"), F.col("lab").alias("olab"), F.col("s").alias("os")
        )
        nxt = (
            lab.join(best, "vid", "left")
            .join(
                own_score,
                (lab["vid"] == F.col("ovid")) & (lab["lab"] == F.col("olab")),
                "left",
            )
            .select(
                lab["vid"].alias("vid"),
                F.when(
                    F.col("blab").isNotNull()
                    & (F.col("lab").isNull() | (F.col("bs") > F.col("os"))),
                    F.col("blab"),
                )
                .otherwise(F.col("lab"))
                .alias("lab"),
                lab["lab"].alias("old"),
            )
            .transform(truncate_plan_lazy)
        )
        changed = nxt.where(
            ~(F.col("lab").eqNullSafe(F.col("old")))
        ).count()
        lab = nxt.select("vid", "lab")
        if changed == 0:
            break
    sym.unpersist()
    return lab.select("vid", F.coalesce("lab", F.lit(-1)).alias("comm"))
