"""Weakly connected components — iterative min-label propagation.

Semantics transliterated from
`/root/reference/analytical_engine/apps/projected/wcc_projected.h:62-183`:

* init ``comp(v) = id(v)``                            (:76-81)
* each round every vertex takes the min of its own label and its neighbors'
  labels **along both edge directions**               (:83-105, :140-166)
* only changed vertices propagate next round (the ``curr_modified``
  frontier, :140-143)
* terminate when no vertex changed                    (:175-180)
* component id = min member vid (exact, deterministic under any
  parallelism — integer min is order-insensitive).

Spark shape: the frontier optimization is explicit — messages are generated
by joining **only the changed vertices** against the symmetric edge table,
so late rounds (few changes) cost tiny shuffles, matching GRAPE's
sparse-frontier behavior (SURVEY.md §4 "delta/frontier computation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import BSPResult, run_bsp
from graphscope_spark.graph import LinkGraph


def wcc(
    graph: LinkGraph,
    max_rounds: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    fused_rounds: int = 1,
) -> BSPResult:
    """Returns BSPResult whose state is (vid, comp).

    ``fused_rounds=k`` stacks k min-label propagation rounds into one Spark
    job (see ``run_bsp``) — valid because min-label propagation is
    monotone: labels only decrease and an all-quiet round is a fixpoint, so
    in-block overshoot is free. Use on high-diameter graphs where the
    driver barrier dominates the late sparse-frontier rounds; leave at 1
    when per-superstep metrics matter (metrics are per job)."""
    P = graph.num_partitions
    # Symmetric edge view (self-loops are no-ops for connectivity),
    # persisted hash-partitioned by the per-round join column so the cached
    # distribution satisfies ClusteredDistribution(src) — only the frontier
    # ever shuffles (see pagerank.py for the full rationale).
    sym = (
        graph.undirected_edges(drop_self_loops=True)
        .repartition(F.col("src"))
        .persist()
    )
    sym.count()

    state0 = (
        graph.vertices.select("vid", F.col("vid").alias("comp"), F.lit(True).alias("changed"))
        .repartition(P, F.pmod(F.col("vid"), F.lit(P)))
    )

    def superstep(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.where("changed").select(F.col("vid").alias("src"), "comp")
        msgs = (
            frontier.join(sym, "src")
            .groupBy("dst")
            .agg(F.min("comp").alias("msg"))
        )
        return (
            state.join(msgs, state["vid"] == msgs["dst"], "left")
            .select(
                state["vid"],
                F.least(state["comp"], F.coalesce(F.col("msg"), state["comp"])).alias("comp"),
                (F.coalesce(F.col("msg"), state["comp"]) < state["comp"]).alias("changed"),
            )
        )

    def scalar_fn(state: DataFrame) -> float:
        return float(state.where("changed").count())

    res = run_bsp(
        state0,
        superstep,
        max_rounds=max_rounds,
        scalar_fn=scalar_fn,
        converged_fn=lambda changed, rnd: changed == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        meta={"algorithm": "wcc"},
        fused_rounds=fused_rounds,
    )
    sym.unpersist()
    res.state = res.state.select("vid", "comp")
    return res


def wcc_log(graph: LinkGraph, max_rounds: int = 200) -> DataFrame:
    """(vid, comp) — log-round WCC: hash-to-min label propagation with a
    fused pointer-doubling jump per round (``comp(v) ← min(comp(v),
    comp(comp(v)))``), the reference `apps/flash/connectivity/cc-log.h`
    counterpart. O(log diameter) rounds vs the frontier `wcc`'s
    O(diameter); prefer this on long-stringy graphs (road networks, chain
    corpora) and the frontier variant on hub-dominated web graphs where
    the diameter is already tiny and per-round cost dominates."""
    from graphscope_spark.algorithms.scc import _fb_minlabels

    sym = graph.undirected_edges(drop_self_loops=True)
    labels = _fb_minlabels(
        sym, graph.vertices.select("vid"), max_rounds, backward=False
    )
    return labels.select("vid", F.col("f").alias("comp"))
