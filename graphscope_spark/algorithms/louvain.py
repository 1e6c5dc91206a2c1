"""Louvain-style community detection — synchronous one-level modularity
optimization — plus a distributed modularity metric.

Reference: `gs::LouvainAppBase` (`/root/reference/analytical_engine/apps/
pregel/louvain/louvain_app_base.h`, registered `.gs_conf.yaml:206-213`,
~1278 LoC) implements distributed multi-level Louvain over Pregel. Here we
implement the **one-level local-move phase** as a synchronous BSP loop (the
phase that dominates quality); graph coarsening between levels is future
work and documented as such. Results are deterministic (rounded gains,
smallest-community tie-breaks, move-only-if-strictly-positive) but — like
every parallel Louvain, the reference's included — not equal to sequential
NetworkX Louvain; correctness is validated by modularity monotonicity and
structural tests, not an oracle (no SQL entry).

Per round (undirected view, unit weights):

* ``k_ic``: for each vertex, edge count into each neighboring community —
  one join + two-level aggregation;
* gain of moving i → c:  ``k_ic − deg_i · tot_c' / (2m)`` with ``tot_c'``
  excluding i itself when c is i's current community;
* adopt the argmax community (rounded gain desc, community id asc) if it
  strictly beats staying; synchronous apply; stop when no vertex moved.

Oscillation damping: a vertex may only move to a community with a SMALLER
id than its current one on odd rounds, larger on even rounds — the
classic alternating-direction trick that makes synchronous local moves
converge without randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def modularity(graph: LinkGraph, comm: DataFrame) -> float:
    """Q = Σ_c [ L_c/m − (tot_c/(2m))² ] over the undirected simple graph;
    ``comm`` is (vid, comm)."""
    und = graph.undirected_edges(drop_self_loops=True)  # both directions
    m2 = und.count()  # = 2m
    if m2 == 0:
        return 0.0
    deg = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    cs = comm.select(F.col("vid").alias("src"), F.col("comm").alias("c_src"))
    cd = comm.select(F.col("vid").alias("dst"), F.col("comm").alias("c_dst"))
    internal2 = (
        und.join(cs, "src").join(cd, "dst").where(F.col("c_src") == F.col("c_dst")).count()
    )  # counts both directions = 2·L_c summed
    tot = (
        deg.join(comm, "vid")
        .groupBy("comm")
        .agg(F.sum("deg").alias("tot"))
        .agg(F.sum(F.col("tot") * F.col("tot")).alias("s"))
        .collect()[0]["s"]
    )
    return float(internal2 / m2 - tot / (m2 * m2))


def louvain(graph: LinkGraph, max_rounds: int = 20) -> DataFrame:
    """One-level Louvain local moves; returns (vid, comm)."""
    und = graph.undirected_edges(drop_self_loops=True).repartition(F.col("src")).persist()
    m2 = und.count()
    deg = (
        und.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    deg.count()
    verts = graph.vertices.select("vid")
    comm = (
        verts.join(deg, "vid", "left")
        .select("vid", F.col("vid").alias("comm"), F.coalesce("deg", F.lit(0)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(1, max_rounds + 1):
        tot = comm.groupBy("comm").agg(F.sum("deg").alias("tot"))
        # k_ic: edges from each vertex into each neighboring community
        nbr_comm = (
            und.join(
                comm.select(F.col("vid").alias("dst"), F.col("comm").alias("nc")), "dst"
            )
            .groupBy(F.col("src").alias("vid"), F.col("nc").alias("cand"))
            .agg(F.count("*").alias("k_ic"))
        )
        cur = comm.select("vid", F.col("comm").alias("cur"), "deg")
        scored = (
            nbr_comm.join(cur, "vid")
            .join(tot.withColumnRenamed("comm", "cand"), "cand")
            .select(
                "vid",
                "cur",
                "deg",
                "cand",
                (
                    F.col("k_ic")
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(F.col("cand") == F.col("cur"), F.col("deg")).otherwise(0)
                    )
                    / F.lit(float(m2))
                ).alias("gain"),
            )
        )
        # alternating move direction bounds oscillation
        direction = (
            (F.col("cand") < F.col("cur")) if rnd % 2 == 1 else (F.col("cand") > F.col("cur"))
        )
        allowed = scored.where(direction | (F.col("cand") == F.col("cur")))
        best = allowed.groupBy("vid").agg(
            F.max_by(
                F.struct("cand", "gain"),
                F.struct(F.round("gain", 9).alias("g"), (-F.col("cand")).alias("nc")),
            ).alias("b")
        )
        stay = scored.where(F.col("cand") == F.col("cur")).select(
            "vid", F.col("gain").alias("stay_gain")
        )
        nxt = (
            comm.join(best, "vid", "left")
            .join(stay, "vid", "left")
            .select(
                "vid",
                F.when(
                    F.col("b").isNotNull()
                    & (
                        F.round(F.col("b.gain"), 9)
                        > F.round(F.coalesce(F.col("stay_gain"), F.lit(0.0)), 9)
                    ),
                    F.col("b.cand"),
                )
                .otherwise(F.col("comm"))
                .alias("comm"),
                "deg",
                (F.col("b").isNotNull()
                 & (F.round(F.col("b.gain"), 9)
                    > F.round(F.coalesce(F.col("stay_gain"), F.lit(0.0)), 9))
                 & (F.col("b.cand") != F.col("comm"))).alias("moved"),
            )
            .localCheckpoint(eager=True)
        )
        n_moved = nxt.where("moved").count()
        comm = nxt.select("vid", "comm", "deg")
        if n_moved == 0 and rnd >= 2:  # need both directions tried
            break
    und.unpersist()
    deg.unpersist()
    return comm.select("vid", "comm")
