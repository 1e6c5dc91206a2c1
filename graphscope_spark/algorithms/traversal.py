"""BFS and SSSP — frontier-based traversal as BSP join/agg supersteps.

Reference semantics:

* BFS: `grape::BFSOpt` (registered `/root/reference/coordinator/gscoordinator/
  builtin/app/.gs_conf.yaml:42-49`) — level-synchronous directed BFS from a
  source vertex; per-vertex depth.
* SSSP: `grape::SSSPOpt` (`.gs_conf.yaml:34-41`) and the in-repo
  `gs::SSSPProjected` (`analytical_engine/apps/projected/sssp_projected.h`) —
  iterative distance relaxation (Bellman-Ford flavor) until fixpoint.

Spark shape (both): state ``(vid, dist)`` where unreached = NULL; each
superstep joins **only the frontier** (vertices whose distance changed last
round) against the out-edge table, takes the min candidate per destination,
and keeps improvements. Late rounds cost tiny shuffles — GRAPE's sparse
frontier (`wcc_projected.h:140-143` analog). Convergence = empty frontier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import BSPResult, run_bsp
from graphscope_spark.graph import LinkGraph


def bfs(
    graph: LinkGraph,
    source: int,
    max_rounds: int = 500,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    fused_rounds: int = 1,
) -> BSPResult:
    """Directed BFS depth from ``source``. Result state: (vid, dist) for
    REACHED vertices only (unreached carry no row).

    ``fused_rounds=k`` stacks k level-expansions into one Spark job (see
    ``run_bsp``): BFS is monotone — a vertex's dist is written once and an
    emptied frontier stays empty — so running past the fixpoint inside a
    block changes nothing, and the block-end changed-count is an exact
    convergence check. On a web graph (diameter ~20-60 BFS levels) this
    cuts driver barriers by k× — the dominant cost of deep frontiers whose
    late rounds shuffle almost nothing."""
    P = graph.num_partitions
    # partitioned by the join column for shuffle-free frontier joins
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    edges.count()

    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == source, F.lit(0)).cast("long").alias("dist"),
        (F.col("vid") == source).alias("changed"),
    ).repartition(P, F.pmod(F.col("vid"), F.lit(P)))

    def superstep(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.where("changed").select(F.col("vid").alias("src"), "dist")
        msgs = (
            frontier.join(edges, "src")
            .groupBy("dst")
            .agg((F.min("dist") + 1).alias("cand"))
        )
        return state.join(msgs, state["vid"] == msgs["dst"], "left").select(
            state["vid"],
            F.when(
                state["dist"].isNull() & F.col("cand").isNotNull(), F.col("cand")
            )
            .otherwise(state["dist"])
            .alias("dist"),
            (state["dist"].isNull() & F.col("cand").isNotNull()).alias("changed"),
        )

    res = run_bsp(
        state0,
        superstep,
        max_rounds=max_rounds,
        scalar_fn=lambda st: float(st.where("changed").count()),
        converged_fn=lambda newly, rnd: newly == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        meta={"algorithm": "bfs", "source": source},
        fused_rounds=fused_rounds,
    )
    edges.unpersist()
    res.state = res.state.where(F.col("dist").isNotNull()).select("vid", "dist")
    return res


def shortest_path(
    graph: LinkGraph,
    source: int,
    target: int,
    weight: Column | None = None,
    max_rounds: int = 1000,
    fused_rounds: int = 1,
) -> DataFrame:
    """(step, vid) — the vertices of a shortest weighted path source→target
    (step 0 = source). Empty result if unreachable.

    Reference: `apps/sssp/sssp_path.h`
    (`/root/reference/analytical_engine/apps/sssp/sssp_path.h`) keeps a
    predecessor per vertex during relaxation. Here predecessors are derived
    POST-HOC from the converged distances with one join —
    ``pred(v) = min{ u : dist(u) + w(u,v) = dist(v) }`` — which avoids
    carrying a pred column through every superstep (same result, one extra
    join total, deterministic smallest-vid tie-break). The walk back from
    ``target`` is O(path length) point lookups on the hash-partitioned pred
    table; a pointer-jumping variant would make it O(log L) supersteps but
    the lookup loop is the honest cost model for "give me one route".
    """
    if weight is None:
        # (src+dst) mod 10 via (src%10 + dst%10) mod 10: same value by
        # modular arithmetic (and same as the DuckDB oracle's (src+dst)%10
        # on the gate's small ids) but hashed 64-bit vids cannot overflow
        # the ANSI long add
        weight = (
            F.pmod(
                F.pmod(F.col("src"), F.lit(10)) + F.pmod(F.col("dst"), F.lit(10)),
                F.lit(10),
            )
            + 1
        ).cast("double")
    res = sssp(
        graph, source, weight=weight, max_rounds=max_rounds, fused_rounds=fused_rounds
    )
    dist = res.state.persist()
    dist.count()
    ew = graph.edges.where(F.col("src") != F.col("dst")).select(
        "src", "dst", weight.alias("w")
    )
    preds = (
        ew.join(
            dist.select(F.col("vid").alias("src"), F.col("dist").alias("du")), "src"
        )
        .join(dist.select(F.col("vid").alias("dst"), F.col("dist").alias("dv")), "dst")
        .where(F.col("du") + F.col("w") == F.col("dv"))
        .groupBy("dst")
        .agg(F.min("src").alias("pred"))
        .localCheckpoint(eager=True)
    )
    spark = graph.vertices.sparkSession
    reached = {r["vid"] for r in dist.where(F.col("vid") == target).collect()}
    dist.unpersist()
    if target not in reached and target != source:
        return spark.createDataFrame([], "step long, vid long")
    chain = [target]
    cur = target
    while cur != source:
        row = preds.where(F.col("dst") == cur).collect()
        if not row:  # no predecessor → target was unreachable
            return spark.createDataFrame([], "step long, vid long")
        cur = row[0]["pred"]
        chain.append(cur)
    chain.reverse()
    return spark.createDataFrame(
        list(enumerate(chain)), "step long, vid long"
    )


def sssp(
    graph: LinkGraph,
    source: int,
    weight: Column | None = None,
    max_rounds: int = 1000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    resume: bool = False,
    fused_rounds: int = 1,
) -> BSPResult:
    """Single-source shortest path (directed, non-negative weights).

    ``weight`` is a Column over (src, dst); default deterministic
    ``pmod(src+dst, 10) + 1`` so a weight exists even on an unweighted link
    graph (mirrored in the DuckDB oracle). Result state: (vid, dist) for
    reached vertices.

    ``fused_rounds=k`` stacks k relaxation rounds into one Spark job (see
    ``run_bsp``): Bellman-Ford relaxation is monotone (dist only decreases;
    an all-quiet round implies fixpoint), so in-block overshoot is free and
    the block-end improved-count is an exact convergence check.
    """
    P = graph.num_partitions
    if weight is None:
        # (src+dst) mod 10 via (src%10 + dst%10) mod 10: same value by
        # modular arithmetic (and same as the DuckDB oracle's (src+dst)%10
        # on the gate's small ids) but hashed 64-bit vids cannot overflow
        # the ANSI long add
        weight = (
            F.pmod(
                F.pmod(F.col("src"), F.lit(10)) + F.pmod(F.col("dst"), F.lit(10)),
                F.lit(10),
            )
            + 1
        ).cast("double")
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst", weight.alias("w"))
        .repartition(F.col("src"))
        .persist()
    )
    edges.count()

    state0 = graph.vertices.select(
        "vid",
        F.when(F.col("vid") == source, F.lit(0.0)).alias("dist"),
        (F.col("vid") == source).alias("changed"),
    ).repartition(P, F.pmod(F.col("vid"), F.lit(P)))

    def superstep(state: DataFrame, rnd: int) -> DataFrame:
        frontier = state.where("changed").select(F.col("vid").alias("src"), "dist")
        msgs = (
            frontier.join(edges, "src")
            .groupBy("dst")
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        improved = F.col("cand").isNotNull() & (
            state["dist"].isNull() | (F.col("cand") < state["dist"])
        )
        return state.join(msgs, state["vid"] == msgs["dst"], "left").select(
            state["vid"],
            F.when(improved, F.col("cand")).otherwise(state["dist"]).alias("dist"),
            improved.alias("changed"),
        )

    res = run_bsp(
        state0,
        superstep,
        max_rounds=max_rounds,
        scalar_fn=lambda st: float(st.where("changed").count()),
        converged_fn=lambda improved, rnd: improved == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
        meta={"algorithm": "sssp", "source": source},
        fused_rounds=fused_rounds,
    )
    edges.unpersist()
    res.state = res.state.where(F.col("dist").isNotNull()).select("vid", "dist")
    return res


def bfs_tree(
    graph: LinkGraph, source: int, max_rounds: int = 500, fused_rounds: int = 1
) -> DataFrame:
    """(vid, dist, parent) — the canonical BFS tree rooted at ``source``:
    every reached vertex with its depth and its tree parent, where
    ``parent(v) = min{ u : (u,v) ∈ E and dist(u)+1 = dist(v) }`` (the
    source row carries parent NULL). Reached vertices only.

    Reference: the NetworkX-builtin tree surface — ``bfs_tree`` /
    ``bfs_predecessors`` / ``bfs_successors`` / ``bfs_edges``
    (`/root/reference/python/graphscope/nx/algorithms/builtin.py:468,395,
    403,354`), all projections of one predecessor map.

    Spark shape: parents are derived POST-HOC from the converged BFS
    distances with ONE extra join (the same trick `shortest_path` uses for
    weighted predecessors) instead of threading a parent column through
    every superstep — identical tree, deterministic min-vid tie-break, and
    the per-round state stays one long narrower. The parent join shuffles
    on dst, co-partitioned with the degree tables."""
    dist = bfs(
        graph, source, max_rounds=max_rounds, fused_rounds=fused_rounds
    ).state.persist()
    dist.count()
    e = graph.edges.where(F.col("src") != F.col("dst")).select("src", "dst")
    parents = (
        e.join(dist.select(F.col("vid").alias("src"), F.col("dist").alias("du")), "src")
        .join(dist.select(F.col("vid").alias("dst"), F.col("dist").alias("dv")), "dst")
        .where(F.col("du") + 1 == F.col("dv"))
        .groupBy("dst")
        .agg(F.min("src").alias("parent"))
    )
    out = (
        dist.join(parents, dist["vid"] == parents["dst"], "left")
        .select(dist["vid"], dist["dist"], F.col("parent"))
        .localCheckpoint(eager=True)
    )
    dist.unpersist()
    return out


def bfs_edges(
    graph: LinkGraph, source: int, max_rounds: int = 500, fused_rounds: int = 1
) -> DataFrame:
    """(src, dst) — the tree edges of `bfs_tree` (parent → child), i.e. the
    NetworkX ``bfs_edges`` edge set under the min-vid parent convention."""
    t = bfs_tree(graph, source, max_rounds=max_rounds, fused_rounds=fused_rounds)
    return t.where(F.col("parent").isNotNull()).select(
        F.col("parent").alias("src"), F.col("vid").alias("dst")
    )


def bfs_predecessors(
    graph: LinkGraph, source: int, max_rounds: int = 500, fused_rounds: int = 1
) -> DataFrame:
    """(vid, pred) — each reached non-source vertex with its BFS-tree parent
    (NetworkX ``bfs_predecessors``)."""
    t = bfs_tree(graph, source, max_rounds=max_rounds, fused_rounds=fused_rounds)
    return t.where(F.col("parent").isNotNull()).select(
        "vid", F.col("parent").alias("pred")
    )


def bfs_successors(
    graph: LinkGraph, source: int, max_rounds: int = 500, fused_rounds: int = 1
) -> DataFrame:
    """(vid, successors) — each tree vertex with the sorted array of its
    children (NetworkX ``bfs_successors``; childless reached vertices are
    omitted, matching the generator semantics)."""
    t = bfs_tree(graph, source, max_rounds=max_rounds, fused_rounds=fused_rounds)
    return (
        t.where(F.col("parent").isNotNull())
        .groupBy(F.col("parent").alias("vid"))
        .agg(F.sort_array(F.collect_list("vid")).alias("successors"))
    )
