"""Matching family — maximal matching, minimum edge cover, greedy minimum
dominating set.

Reference semantics:

* `apps/flash/matching/mm.h` (`/root/reference/analytical_engine/apps/flash/
  matching/mm.h:63-76`) — rounds of "propose to the extremal unmatched
  neighbor; an edge matches iff the proposals are mutual"; winners leave.
  The reference proposes to the MAX VERTEX ID; id-ordered proposals
  serialize id-monotone chains into O(n) rounds, so (exactly as in
  `algorithms/mis.py`) the proposal order here is the portable 60-bit hash
  priority — deterministic, oracle-reproducible in DuckDB, and O(log n)
  rounds w.h.p. like a random permutation.
* `apps/flash/matching/min-edge-cover.h` — a minimum edge cover is a
  maximal matching plus one incident edge for every exposed non-isolated
  vertex (König/Gallai: |min edge cover| = n − |maximum matching|; with a
  maximal matching this is the standard 3/2-approximation).
* `apps/flash/matching/min-cover.h:42-105` — two-phase greedy vertex
  cover: (1) threshold halving — rounds with threshold n/2, n/4, … where
  every remaining vertex whose residual degree (edges to not-yet-covered
  neighbours) reaches the threshold joins the cover, and vertices whose
  residual degree hits 0 drop out; (2) redundancy pruning — repeatedly
  un-cover vertices all of whose neighbours are covered, removing only the
  id-maxima among adjacent candidates each round so the cover property is
  never violated.
* `apps/flash/matching/min-dominating-set.h:54-100` — greedy: each round
  every undominated vertex whose (residual-coverage, id) pair is the strict
  maximum within its undominated 2-hop neighbourhood joins the set and
  dominates its closed neighbourhood; repeat until every vertex is
  dominated. Residual coverage = number of undominated neighbours.

All three are deterministic and therefore carry exact unrolled-round DuckDB
oracles in `__spark_entry__.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph
from graphscope_spark.algorithms.mis import _priority


def maximal_matching(graph: LinkGraph, max_rounds: int = 100) -> DataFrame:
    """(a, b) with a<b — a maximal matching of the undirected simple graph.

    Round: every unmatched vertex proposes to its maximum-priority unmatched
    neighbour; an edge joins the matching iff the proposals are mutual. The
    globally max-priority vertex with any unmatched neighbour always forms a
    mutual pair, so every round matches ≥1 edge; with hash priorities the
    expected round count is O(log n). Each round is two shuffles: one
    max_by partial aggregate for the proposals, one self-join for the
    mutual check — hub vertices cost a map-side combine, never a gather.
    """
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    alive = graph.vertices.select(
        "vid", _priority(F.col("vid")).alias("pri")
    ).transform(truncate_plan)
    spark = graph.vertices.sparkSession
    matched = spark.createDataFrame([], "a long, b long")
    for _ in range(max_rounds):
        # drop vertices with no alive neighbour — they can never match
        e_a = (
            und.join(alive.select(F.col("vid").alias("src"), F.col("pri").alias("spri")), "src")
            .join(alive.select(F.col("vid").alias("dst")), "dst")
        )
        # proposal: max-priority alive neighbour of each alive vertex
        prop = e_a.groupBy(F.col("dst").alias("vid")).agg(
            F.max_by("src", "spri").alias("pick")
        )
        if prop.count() == 0:
            break
        mutual = (
            prop.alias("p")
            .join(
                prop.select(F.col("vid").alias("pick"), F.col("pick").alias("vid2")).alias("q"),
                "pick",
            )
            .where(F.col("vid2") == F.col("vid"))
            .where(F.col("vid") < F.col("pick"))
            .select(F.col("vid").alias("a"), F.col("pick").alias("b"))
            .transform(truncate_plan)
        )
        matched = matched.unionByName(mutual).transform(truncate_plan)
        winners = mutual.select(F.col("a").alias("vid")).unionByName(
            mutual.select(F.col("b").alias("vid"))
        )
        alive = alive.join(winners, "vid", "anti").transform(truncate_plan)
    und.unpersist()
    return matched


def min_edge_cover(graph: LinkGraph, max_rounds: int = 100) -> DataFrame:
    """(a, b) with a<b — an edge cover: maximal matching plus, for every
    exposed non-isolated vertex, the edge to its maximum-priority neighbour
    (deterministic). Isolated vertices are uncoverable and skipped."""
    m = maximal_matching(graph, max_rounds).persist()
    m.count()
    und = graph.undirected_edges(drop_self_loops=True)
    covered = m.select(F.col("a").alias("vid")).unionByName(
        m.select(F.col("b").alias("vid"))
    )
    pri = und.join(
        graph.vertices.select(
            F.col("vid").alias("src"), _priority(F.col("vid")).alias("spri")
        ),
        "src",
    )
    exposed_pick = (
        pri.join(covered.withColumnRenamed("vid", "dst"), "dst", "anti")
        .groupBy(F.col("dst").alias("vid"))
        .agg(F.max_by("src", "spri").alias("pick"))
        .select(F.least("vid", "pick").alias("a"), F.greatest("vid", "pick").alias("b"))
    )
    out = m.unionByName(exposed_pick).distinct()
    m.unpersist()
    return out


def min_dominating_set(graph: LinkGraph, max_rounds: int = 200) -> DataFrame:
    """(vid) — greedy minimum dominating set (reference
    `min-dominating-set.h` semantics: 2-hop-local greedy by
    (residual-coverage, vid), winners dominate their closed
    neighbourhood).

    Each round is three edge-join + partial-aggregate shuffles over the
    shrinking undominated subgraph: one to count residual coverage, two to
    propagate the (cnt, vid) max over the 2-hop neighbourhood. The pair is
    a struct compared lexicographically, so the max is a plain partial
    aggregate and safe for full-range 64-bit vids (a cnt·2³² + vid BIGINT
    packing would overflow under ANSI mode); the DuckDB oracle keeps the
    packed expression, whose order is identical for 0 ≤ vid < 2³² — the
    gate doc_id range."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    undom = graph.vertices.select("vid").transform(truncate_plan)
    spark = graph.vertices.sparkSession
    chosen = spark.createDataFrame([], "vid long")
    pack = lambda cnt, vid: F.struct(cnt.alias("c"), vid.alias("v"))  # noqa: E731
    for _ in range(max_rounds):
        if undom.count() == 0:
            break
        # residual coverage: # undominated neighbours (undominated self adds
        # nothing to the ORDER, it is common to all competitors at v)
        e_u = und.join(undom.withColumnRenamed("vid", "src"), "src").join(
            undom.withColumnRenamed("vid", "dst"), "dst"
        )
        cnt = e_u.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("cnt"))
        val = (
            undom.join(cnt, "vid", "left")
            .select("vid", pack(F.coalesce(F.col("cnt"), F.lit(0)), F.col("vid")).alias("pv"))
            .transform(truncate_plan)
        )
        # two rounds of neighbour-max over the undominated subgraph → 2-hop max
        hop = val
        for _h in range(2):
            nbr_max = (
                e_u.join(hop.select(F.col("vid").alias("src"), F.col("pv").alias("spv")), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.max("spv").alias("nmax"))
            )
            # greatest() skips NULLs, so vertices with no undominated
            # neighbour keep their own pv
            hop = (
                hop.join(nbr_max, "vid", "left")
                .select("vid", F.greatest("pv", "nmax").alias("pv"))
                .transform(truncate_plan)
            )
        winners = (
            val.join(hop.withColumnRenamed("pv", "mx"), "vid")
            .where(F.col("pv") == F.col("mx"))
            .select("vid")
            .transform(truncate_plan)
        )
        chosen = chosen.unionByName(winners).transform(truncate_plan)
        dominated = (
            und.join(winners.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .distinct()
            .unionByName(winners)
        )
        undom = undom.join(dominated, "vid", "anti").transform(truncate_plan)
    und.unpersist()
    return chosen


def min_vertex_cover(
    graph: LinkGraph, max_rounds: int = 200, max_driver_edges: int = 2_000_000
) -> DataFrame:
    """(vid) — greedy minimum vertex cover, reference `min-cover.h`
    semantics (threshold-halving greedy + id-max redundancy pruning).

    Phase 1 runs ≤ ⌈log₂ n⌉ + 1 rounds (the threshold halves every round
    and at threshold 0 every remaining vertex with a live edge joins);
    each round is one filter + one edge-join partial aggregate.

    Phase 2 (redundancy pruning, reference min-cover.h:79-101) removes, each
    round, the candidates (cover vertices all of whose neighbours are
    covered) that are id-maxima among adjacent candidates, to fixpoint. That
    fixpoint is UNIQUE and equals the sequential decreasing-id greedy over
    the candidate-induced subgraph: candidacy is monotone non-increasing
    (the cover only shrinks, so "has an uncovered neighbour" only spreads
    and never retracts), hence v is removed iff v is an initial candidate
    and no higher-id candidate neighbour of v is removed — a recursion on
    strictly-decreasing ids, which is exactly what the sequential greedy
    resolves. The round-parallel process can serialize into Θ(longest
    monotone-id candidate chain) driver rounds (measured 380 rounds / 330 s
    at sf0.1, where phase 1 covers every vertex so the candidate subgraph is
    the whole graph), so when the candidate subgraph fits
    ``max_driver_edges`` we resolve it in ONE pass driver-side (the same
    bounded-driver-path contract as dfs_preorder); above the bound the
    distributed round loop runs — the reference's own cost shape."""
    und = graph.undirected_edges(drop_self_loops=True).persist()
    und.count()
    n = graph.vertices.count()
    # resid: uncovered vertices with >0 edges to uncovered neighbours
    resid = (
        und.groupBy(F.col("src").alias("vid"))
        .agg(F.count("*").alias("d"))
        .transform(truncate_plan)
    )
    spark = graph.vertices.sparkSession
    cover = spark.createDataFrame([], "vid long")
    nowd = n // 2
    for _ in range(max_rounds):
        if resid.isEmpty():
            break
        winners = resid.where(F.col("d") >= F.lit(nowd)).select("vid")
        cover = cover.unionByName(winners).transform(truncate_plan)
        dec = (
            und.join(winners.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.count("*").alias("dec"))
        )
        resid = (
            resid.join(winners, "vid", "anti")
            .join(dec, "vid", "left")
            .select("vid", (F.col("d") - F.coalesce("dec", F.lit(0))).alias("d"))
            .where(F.col("d") > 0)
            .transform(truncate_plan)
        )
        nowd = nowd // 2
    # phase 2: drop redundant cover vertices (all neighbours covered),
    # id-maxima among adjacent candidates each round, until fixpoint
    uncovered_nbr = (
        und.join(cover.withColumnRenamed("vid", "dst"), "dst", "anti")
        .select(F.col("src").alias("vid"))
        .distinct()
    )
    cand0 = cover.join(uncovered_nbr, "vid", "anti").transform(truncate_plan)
    ec = (
        und.join(cand0.withColumnRenamed("vid", "src"), "src")
        .join(cand0.withColumnRenamed("vid", "dst"), "dst")
        .select("src", "dst")
    )
    n_cand, n_ec = (
        cand0.agg(F.count("*")).collect()[0][0],
        ec.agg(F.count("*")).collect()[0][0],
    )
    if n_cand + n_ec <= max_driver_edges:
        # driver fast-path: the unique fixpoint, resolved sequentially in
        # decreasing id order (see docstring for the equivalence argument)
        removed: set = set()
        adj: dict = {}
        for r in ec.collect():
            adj.setdefault(r["src"], []).append(r["dst"])
        for v in sorted((r["vid"] for r in cand0.collect()), reverse=True):
            if all(w not in removed for w in adj.get(v, ())):
                removed.add(v)
        if removed:
            spark = graph.vertices.sparkSession
            rm_df = spark.createDataFrame(
                [(int(v),) for v in removed], "vid long"
            )
            cover = cover.join(F.broadcast(rm_df), "vid", "anti").transform(
                truncate_plan
            )
        und.unpersist()
        return cover
    cand = cand0
    for _ in range(max_rounds):
        if cand.isEmpty():
            break
        higher_adj_cand = (
            und.join(cand.withColumnRenamed("vid", "src"), "src")
            .join(cand.withColumnRenamed("vid", "dst"), "dst")
            .where(F.col("src") > F.col("dst"))
            .select(F.col("dst").alias("vid"))
            .distinct()
        )
        removable = cand.join(higher_adj_cand, "vid", "anti")
        if removable.isEmpty():
            break
        prev_cover, prev_cand = cover, cand
        cover = cover.join(removable, "vid", "anti").transform(truncate_plan)
        # candidacy is monotone: drop this round's removals and their
        # (now-uncovered-adjacent) neighbours — never a full recompute
        touched = (
            und.join(removable.withColumnRenamed("vid", "src"), "src")
            .select(F.col("dst").alias("vid"))
            .unionByName(removable)
            .distinct()
        )
        cand = cand.join(touched, "vid", "anti").transform(truncate_plan)
        # eager truncation: the new checkpoints are materialized, so the
        # previous round's blocks are releasable — long id-chain graphs run
        # hundreds of rounds and leaked checkpoints OOM the driver
        from graphscope_spark.bsp import release_truncated

        release_truncated(prev_cover)
        release_truncated(prev_cand)
        import gc

        gc.collect()
    und.unpersist()
    return cover
