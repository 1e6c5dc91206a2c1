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


def test_run_bsp_callable_fusion_schedule(spark):
    """fused_rounds may be a SCHEDULE (next_round -> k): a geometric
    schedule must reach the identical fixpoint as static fusion, with the
    block sizes actually growing (observed via the schedule's call log)."""
    import pyspark.sql.functions as F

    from graphscope_spark.bsp import run_bsp

    state0 = spark.createDataFrame(
        [(i, 0) for i in range(8)], "vid long, val long"
    )

    def superstep(st, rnd):
        return st.select(
            "vid",
            F.when(F.col("val") < 21, F.col("val") + 1)
            .otherwise(F.col("val"))
            .alias("val"),
        )

    def scalar(st):
        return float(st.where(F.col("val") < 21).count())

    static = run_bsp(
        state0, superstep, max_rounds=64, scalar_fn=scalar,
        converged_fn=lambda c, r: c == 0.0, fused_rounds=4,
    )
    calls = []

    def schedule(rnd):
        k = min(16, 2 << (rnd // 4))
        calls.append((rnd, k))
        return k

    dyn = run_bsp(
        state0, superstep, max_rounds=64, scalar_fn=scalar,
        converged_fn=lambda c, r: c == 0.0, fused_rounds=schedule,
    )
    assert static.converged and dyn.converged
    sa = {r["vid"]: r["val"] for r in static.state.collect()}
    sb = {r["vid"]: r["val"] for r in dyn.state.collect()}
    assert sa == sb == {i: 21 for i in range(8)}
    ks = [k for _, k in calls]
    assert ks[0] == 2 and max(ks) > ks[0]  # the schedule actually grew
    static.release()
    dyn.release()
