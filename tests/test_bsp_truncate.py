"""run_bsp with truncate_every > 1: the persist-only rounds must keep their
predecessor states alive until the next lineage-truncation point (a cache
eviction of a merely-persisted state otherwise recomputes through a freed
localCheckpoint and fails)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.bsp import run_bsp


def test_run_bsp_truncate_every_3(spark):
    state0 = spark.range(0, 100).select(
        F.col("id").alias("vid"), F.lit(0).alias("x")
    )

    def step(state, rnd):
        return state.select("vid", (F.col("x") + 1).alias("x"))

    res = run_bsp(
        state0,
        step,
        max_rounds=10,
        scalar_fn=lambda st: float(st.agg(F.max("x")).collect()[0][0]),
        converged_fn=lambda mx, rnd: mx >= 7,
        truncate_every=3,
    )
    assert res.converged and res.supersteps == 7
    vals = {r["x"] for r in res.state.collect()}
    assert vals == {7}


def test_sssp_fused_overshoot_equivalence(corpus_graph):
    """fused_rounds far past the fixpoint must not disturb SSSP distances
    (the monotone-overshoot contract run_bsp's docstring claims)."""
    from graphscope_spark.algorithms.traversal import sssp

    src = corpus_graph.vertices.agg(F.min("vid")).collect()[0][0]
    base = {
        (r["vid"]): r["dist"]
        for r in sssp(corpus_graph, source=src).state.collect()
    }
    fused = {
        (r["vid"]): r["dist"]
        for r in sssp(corpus_graph, source=src, fused_rounds=100).state.collect()
    }
    assert len(base) > 1 and base == fused
