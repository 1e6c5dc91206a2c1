"""Core-based vertex orderings — degeneracy ordering and onion layers.

Reference semantics: `apps/flash/core/degeneracy-ordering.h`
(`/root/reference/analytical_engine/apps/flash/core/degeneracy-ordering.h:
90-110`) and `onion-layer-ordering.h` (same dir) — after computing
coreness, rank vertices by iterated parallel peel rounds:

* **degeneracy order**: rank(v) = the round at which v is removed when each
  round removes every vertex whose residual degree ≤ the graph's
  degeneracy (the max coreness). The removal sequence read rank-by-rank is
  a degeneracy ordering: when v is removed it has ≤ degeneracy remaining
  neighbours.
* **onion layers**: layer(v) = the round at which v is removed when each
  round removes every vertex whose count of remaining neighbours w with
  core(w) ≥ core(v) is ≤ core(v). Layers refine the k-shell decomposition
  (Hébert-Dufresne et al., "Multi-scale structure… onion decomposition").

Scale shape (rewritten round 4, matching the reference's incremental
decrement): ONE state DataFrame carries the residual degree AND the
rank/layer as columns — rank IS NULL means "still in the residual graph".
Each round is exactly ONE Spark job: the removed frontier's edges decrement
their surviving endpoints' residual degrees (`und ⋈ frontier`, work ∝
frontier out-edges, so the TOTAL join work across all rounds is O(m) —
not O(m · rounds) like the recompute-from-remaining formulation), the new
state is built lazily (`truncate_plan_lazy`), and the single action that
materializes it is the remaining-vertex count that doubles as the stopping
condition — the `coreness` (`kcore.py:60`) / `run_bsp` (`bsp.py:231`)
pattern. No per-round union accumulator, no growing output re-checkpoint:
ranks accumulate in place in the fixed-size state. (The previous
formulation ran ~4 driver jobs per round plus an O(rounds)-deep union —
a driver-bound scale-killer at web-graph peel depths.)

Progress per round is guaranteed (an empty removal set would exhibit a
(c*+1)-core inside the c*-shell, contradicting coreness), so rounds ≤
peel-cascade depth, the same bound the `coreness` h-index iteration carries.
"""

from __future__ import annotations

import gc
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import release_truncated, truncate_plan_lazy
from graphscope_spark.graph import LinkGraph


def _collect_adj(und, vertices):
    adj = defaultdict(list)
    for r in und.collect():
        adj[r["src"]].append(r["dst"])
    deg = {v: len(ns) for v, ns in adj.items()}
    for r in vertices.collect():
        deg.setdefault(r["vid"], 0)
    return adj, deg


def _simulate_peel(population, removable, on_remove):
    """Round-synchronous peel simulation: each round removes every live
    vertex satisfying ``removable(v)``; ``on_remove(w)`` applies w's
    decrements and returns the vertices it touched. Returns {vid: 1-based
    removal round} — the EXACT value sequence of the distributed loops
    below."""
    out: dict[int, int] = {}
    frontier = [v for v in population if removable(v)]
    rnd = 0
    while frontier:
        rnd += 1
        for v in frontier:
            out[v] = rnd
        touched: set = set()
        for v in frontier:
            touched |= on_remove(v)
        frontier = [w for w in touched if w not in out and removable(w)]
    return out


def _peel_tail_finish(
    state, out_col, collect_cols, edges_tbl, rnd, make_sim, local_edge_cutoff
):
    """Shared guarded tail finish for the peel loops: when the residual
    (``out_col`` IS NULL) subgraph's internal edge count (checked, never
    assumed) fits under ``local_edge_cutoff``, finish the cascade in one
    driver-side ``_simulate_peel`` pass with rounds offset by the ``rnd``
    distributed rounds already completed. ``make_sim(rows, adj)`` returns
    the (population, removable, on_remove) triple for the simulation.
    Returns the completed (vid, out_col) frame, or None when the residual
    is still too dense (caller keeps peeling distributed)."""
    resid = state.where(F.col(out_col).isNull()).select("vid", *collect_cols)
    rv = resid.select(F.col("vid").alias("src"))
    re_ = (
        edges_tbl.join(rv, "src", "semi")
        .join(resid.select(F.col("vid").alias("dst")), "dst", "semi")
        .select("src", "dst")
        .persist()
    )
    if re_.count() > local_edge_cutoff:
        re_.unpersist()  # residual too dense — keep peeling
        return None
    adj = defaultdict(list)
    for r in re_.collect():
        adj[r["src"]].append(r["dst"])
    re_.unpersist()
    rows = resid.collect()
    population, removable, on_remove = make_sim(rows, adj)
    out = _simulate_peel(population, removable, on_remove)
    local = state.sparkSession.createDataFrame(
        sorted((int(v), int(r) + rnd) for v, r in out.items()),
        f"vid long, {out_col} long",
    )
    return (
        state.where(F.col(out_col).isNotNull())
        .select("vid", out_col)
        .unionByName(local)
    )


def degeneracy_order(
    graph: LinkGraph,
    max_rounds: int = 2000,
    fused_rounds: int = 8,
    max_driver_edges: int = 2_000_000,
    local_cutoff: int = 100_000,
    local_edge_cutoff: int = 2_000_000,
) -> DataFrame:
    """(vid, rank) — 1-based parallel-peel round at which v leaves when
    peeling at the global degeneracy.

    **Adaptive tail finish** (round-5, closing round-3's bar): the peel's
    late cascades move a handful of vertices per round at full
    shuffle-job cost — the same deep-sparse-tail profile as
    ``topological_generations``. After each block, the residual (rank
    IS NULL) vertex count is known from the stopping aggregate; once it
    drops under ``local_cutoff`` AND the residual-internal edge count
    (checked, never assumed) is under ``local_edge_cutoff``, the
    remaining cascade — a bounded subproblem with all prior decrements
    already applied — finishes in one driver-side ``_simulate_peel``
    pass with ranks offset by the completed distributed rounds. The
    early wide rounds still run distributed (``max_driver_edges=0``
    forces that path, as the gate does); only the barrier-bound tail is
    escaped, and above the guards the loop just keeps iterating.

    ``fused_rounds=k`` stacks k peel rounds into ONE Spark job: inner
    rounds only *construct* the next lazily-checkpointed state (plan cut,
    RDD lineage shared — no tree blowup), and the remaining-vertex stopping
    count runs once per block. Peel semantics are unaffected — a round past
    completion has an empty frontier and decrements nothing, and ranks are
    stamped with the true inner round number. Peel depth is the inherent
    round count of the parallel peel, so at web-graph depths (hundreds of
    cascades) this divides driver round-trips by k, the same lever as
    pagerank's ``fused_rounds`` (pagerank.py:22).

    Peel depth is Θ(cascade length) — measured ~600 rounds at sf0.1 once
    the degeneracy is computed CORRECTLY (dg=4; round 4 found the earlier
    unconverged coreness inflating dg and silently shortcutting the peel) —
    so below ``max_driver_edges`` the identical round-synchronous peel runs
    driver-side in one pass (the min_vertex_cover/dfs_preorder contract);
    ``max_driver_edges=0`` forces the distributed loop (the gate does)."""
    from graphscope_spark.algorithms.kcore import coreness

    und = graph.undirected_edges(drop_self_loops=True).persist()
    m = und.count()
    dg = coreness(graph).agg(F.max("core")).collect()[0][0] or 0
    if m <= max_driver_edges:
        adj, deg = _collect_adj(und, graph.vertices.select("vid"))
        und.unpersist()

        def on_remove(v):
            for w in adj.get(v, ()):
                deg[w] -= 1
            return set(adj.get(v, ()))

        ranks = _simulate_peel(deg, lambda v: deg[v] <= dg, on_remove)
        return graph.vertices.sparkSession.createDataFrame(
            sorted((int(v), int(r)) for v, r in ranks.items()),
            "vid long, rank long",
        )
    deg0 = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("long").alias("deg")
    )
    state = (
        graph.vertices.select("vid")
        .join(deg0, "vid", "left")
        .select(
            "vid",
            F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
            F.lit(None).cast("long").alias("rank"),
        )
        .transform(truncate_plan_lazy)
    )
    removable = F.col("rank").isNull() & (F.col("deg") <= dg)
    spent: list[DataFrame] = []
    for rnd in range(1, max_rounds + 1):
        # this round's removed frontier, and the decrement its edges apply
        # to surviving endpoints (edges among two removed vertices also
        # decrement, harmlessly — the endpoint's deg is frozen by its rank)
        frontier = state.where(removable).select(F.col("vid").alias("src"))
        dec = (
            und.join(frontier, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count("*").cast("long").alias("dec"))
        )
        spent.append(state)
        state = (
            state.join(dec, "vid", "left")
            .select(
                "vid",
                (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0))).alias("deg"),
                F.when(removable, F.lit(rnd))
                .otherwise(F.col("rank"))
                .cast("long")
                .alias("rank"),
            )
            .transform(truncate_plan_lazy)
        )
        # the ONE action per BLOCK: materializes the k chained lazy
        # checkpoints AND yields the stopping condition
        if rnd % max(1, fused_rounds) == 0 or rnd == max_rounds:
            remaining = state.where(F.col("rank").isNull()).count()
            for st in spent:
                release_truncated(st)
            spent.clear()
            gc.collect()  # flush py4j detaches (see kcore.coreness)
            if remaining == 0:
                break
            if remaining <= local_cutoff:
                # guarded tail finish: residual degrees already reflect
                # every applied decrement (rounds complete at block end —
                # no in-flight messages), so the local peel continues the
                # exact cascade with ranks offset by the finished rounds
                def make_sim(rows, adj):
                    deg = {r["vid"]: r["deg"] for r in rows}

                    def on_remove(v):
                        for w in adj.get(v, ()):
                            deg[w] -= 1
                        return set(adj.get(v, ()))

                    return deg, (lambda v: deg[v] <= dg), on_remove

                done = _peel_tail_finish(
                    state, "rank", ["deg"], und, rnd, make_sim,
                    local_edge_cutoff,
                )
                if done is not None:
                    und.unpersist()
                    return done
    und.unpersist()
    return state.where(F.col("rank").isNotNull()).select("vid", "rank")


def onion_layers(
    graph: LinkGraph,
    max_rounds: int = 2000,
    fused_rounds: int = 8,
    max_driver_edges: int = 2_000_000,
    local_cutoff: int = 100_000,
    local_edge_cutoff: int = 2_000_000,
) -> DataFrame:
    """(vid, layer) — 1-based onion layer: round at which v is removed when
    each round removes v iff #{remaining nbrs w : core(w) ≥ core(v)} ≤
    core(v).

    Same incremental shape as ``degeneracy_order`` (including the
    ``fused_rounds`` block fusion — one stopping action per k lazily-chained
    rounds, and the same bounded-driver fast path below
    ``max_driver_edges``); the static edge table is annotated ONCE with
    both endpoints' coreness so the per-round decrement (remove w →
    decrement v iff core(w) ≥ core(v)) is a frontier join with an in-row
    predicate, never a rejoin against vertex state."""
    from graphscope_spark.algorithms.kcore import coreness

    und = graph.undirected_edges(drop_self_loops=True).persist()
    m = und.count()
    core = coreness(graph)
    if m <= max_driver_edges:
        cd = {r["vid"]: r["core"] for r in core.collect()}
        adj, _deg = _collect_adj(und, graph.vertices.select("vid"))
        und.unpersist()
        qdeg = {
            v: sum(1 for w in adj.get(v, ()) if cd[w] >= cd[v]) for v in cd
        }

        def on_remove(w):
            touched = set()
            for v in adj.get(w, ()):
                if cd[w] >= cd[v]:
                    qdeg[v] -= 1
                    touched.add(v)
            return touched

        layers = _simulate_peel(qdeg, lambda v: qdeg[v] <= cd[v], on_remove)
        return graph.vertices.sparkSession.createDataFrame(
            sorted((int(v), int(r)) for v, r in layers.items()),
            "vid long, layer long",
        )
    # (src, dst, qualifies): does src's presence count toward dst's
    # qualifying degree?  qualifies ⇔ core(src) ≥ core(dst)
    ecore = (
        und.join(core.select(F.col("vid").alias("src"), F.col("core").alias("score")), "src")
        .join(core.select(F.col("vid").alias("dst"), F.col("core").alias("dcore")), "dst")
        .where(F.col("score") >= F.col("dcore"))
        .select("src", "dst")
        .persist()
    )
    ecore.count()
    qdeg0 = ecore.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").cast("long").alias("qdeg")
    )
    state = (
        core.join(qdeg0, "vid", "left")
        .select(
            "vid",
            "core",
            F.coalesce("qdeg", F.lit(0)).cast("long").alias("qdeg"),
            F.lit(None).cast("long").alias("layer"),
        )
        .transform(truncate_plan_lazy)
    )
    removable = F.col("layer").isNull() & (F.col("qdeg") <= F.col("core"))
    spent: list[DataFrame] = []
    for rnd in range(1, max_rounds + 1):
        frontier = state.where(removable).select(F.col("vid").alias("src"))
        dec = (
            ecore.join(frontier, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count("*").cast("long").alias("dec"))
        )
        spent.append(state)
        state = (
            state.join(dec, "vid", "left")
            .select(
                "vid",
                "core",
                (F.col("qdeg") - F.coalesce(F.col("dec"), F.lit(0))).alias("qdeg"),
                F.when(removable, F.lit(rnd))
                .otherwise(F.col("layer"))
                .cast("long")
                .alias("layer"),
            )
            .transform(truncate_plan_lazy)
        )
        if rnd % max(1, fused_rounds) == 0 or rnd == max_rounds:
            remaining = state.where(F.col("layer").isNull()).count()
            for st in spent:
                release_truncated(st)
            spent.clear()
            gc.collect()  # flush py4j detaches (see kcore.coreness)
            if remaining == 0:
                break
            if remaining <= local_cutoff:
                # guarded tail finish (degeneracy_order's contract): the
                # residual qualifying degrees already include every
                # applied decrement; continue the cascade locally with
                # layers offset by the finished rounds
                def make_sim(rows, adj):
                    cd = {r["vid"]: r["core"] for r in rows}
                    qdeg = {r["vid"]: r["qdeg"] for r in rows}

                    def on_remove(w):
                        touched = set()
                        for v in adj.get(w, ()):
                            qdeg[v] -= 1
                            touched.add(v)
                        return touched

                    return qdeg, (lambda v: qdeg[v] <= cd[v]), on_remove

                done = _peel_tail_finish(
                    state, "layer", ["core", "qdeg"], ecore, rnd, make_sim,
                    local_edge_cutoff,
                )
                if done is not None:
                    ecore.unpersist()
                    und.unpersist()
                    return done
    ecore.unpersist()
    und.unpersist()
    return state.where(F.col("layer").isNotNull()).select("vid", "layer")
