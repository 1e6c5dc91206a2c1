"""Strongly connected components — chain contraction + parallel-pivot
forward-backward reachability with trimming.

Reference semantics: `apps/flash/connectivity/scc.h` and the log-round
variants `scc-2.h` / `cc-log.h`
(`/root/reference/analytical_engine/apps/flash/connectivity/`) — FLASH SCC
repeatedly (a) trims trivial SCCs, (b) picks a pivot PER remaining weakly
connected component, intersects forward and backward reachability, and
removes the found SCCs; the log-round variants shortcut long paths with
pointer doubling. Component id = smallest vid in the component
(deterministic, oracle-checkable).

Spark shape (FW-BW-Trim over a chain-contracted graph):

1. **Chain contraction (pointer doubling, O(log L) rounds)** — a *chain
   vertex* has in-degree 1 and out-degree 1 in the simple directed graph.
   Maximal chain paths are contracted to a single edge (head-predecessor →
   tail-successor) by doubling jumps `j(v) ← j(j(v))`; a chain whose jump
   never reaches a non-chain vertex is a *pure cycle* — a complete SCC
   whose id (min member vid) falls out of the same doubling by carrying a
   running min. Web-graph tendrils/chains are exactly what made per-level
   BFS pay diameter-many barriers (measured 62-hop chains at sf0.1); after
   contraction both trimming and reach run on a graph whose every path
   alternates through branching vertices.
2. **Trim to fixpoint** — zero in- or out-degree in the remaining
   subgraph → own SCC; removing those exposes more (the bow-tie's IN/OUT
   tendrils are already gone via contraction, so this converges fast).
3. **Parallel pivots** — WCC over the remaining subgraph (min-label: each
   weak component's label IS its min vid = the pivot); ALL pivots' forward
   and backward BFS run together as one frontier. Every remaining weak
   component sheds its pivot's SCC each outer round.
4. **Relabel** — chain members join their chain's SCC iff head and tail
   land in the same contracted SCC; the final component id is re-minimized
   over the full membership (a chain vid can undercut every branching vid).

Outer rounds = the deepest chain of *branching* SCCs inside any weak
component; each inner step is a join + partial aggregate. All shuffles key
on vid; the doubling state is O(#chain vertices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph


def _reach(edges: DataFrame, start: DataFrame, reverse: bool = False) -> DataFrame:
    """(vid) reachable from any start vertex over ``edges`` (inclusive)."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    seen = start.select("vid").transform(truncate_plan)
    frontier = seen
    while True:
        nxt = (
            frontier.join(edges, frontier["vid"] == edges[src])
            .select(F.col(dst).alias("vid"))
            .distinct()
            .join(seen, "vid", "anti")
            .transform(truncate_plan)
        )
        if nxt.count() == 0:
            return seen
        seen = seen.unionByName(nxt).transform(truncate_plan)
        frontier = nxt


def _contract_chains(edges: DataFrame, vertices: DataFrame):
    """Split the simple directed graph at degree-(1,1) chain vertices.

    Returns ``(contracted_edges, chain_map, cycle_comp)`` where

    * ``contracted_edges`` — (src, dst) over non-chain vertices only: the
      original non-chain↔non-chain edges plus one edge per maximal chain
      path (head-predecessor → tail-successor);
    * ``chain_map`` — (vid, head, tail) for every non-cycle chain vertex:
      the non-chain vertices bracketing its chain;
    * ``cycle_comp`` — (vid, comp) for every pure-cycle chain vertex,
      comp = min vid of its cycle (these SCCs are already final).
    """
    spark = edges.sparkSession
    outd = edges.groupBy("src").agg(
        F.count("*").alias("od"), F.min("dst").alias("onbr")
    )
    ind = edges.groupBy("dst").agg(
        F.count("*").alias("id_"), F.min("src").alias("inbr")
    )
    deg = (
        vertices.join(outd.withColumnRenamed("src", "vid"), "vid", "left")
        .join(ind.withColumnRenamed("dst", "vid"), "vid", "left")
        .select(
            "vid",
            F.coalesce("od", F.lit(0)).alias("od"),
            F.coalesce("id_", F.lit(0)).alias("id_"),
            "onbr",
            "inbr",
        )
        .persist()
    )
    chain = deg.where((F.col("od") == 1) & (F.col("id_") == 1)).select(
        "vid", F.col("onbr").alias("nxt"), F.col("inbr").alias("prv")
    )
    n_chain = chain.count()
    if n_chain == 0:
        deg.unpersist()
        empty_map = spark.createDataFrame([], "vid long, head long, tail long")
        empty_cyc = spark.createDataFrame([], "vid long, comp long")
        return edges, empty_map, empty_cyc

    is_chain = chain.select("vid", F.lit(True).alias("c"))
    # state: j / p = vertex 2^k hops forward / backward (frozen once it
    # lands on a non-chain vertex); m = min chain vid in the forward window
    st = (
        chain.join(is_chain.withColumnRenamed("vid", "nxt"), "nxt", "left")
        .join(
            is_chain.select(F.col("vid").alias("prv"), F.col("c").alias("cp")),
            "prv",
            "left",
        )
        .select(
            "vid",
            F.col("nxt").alias("j"),
            F.col("c").isNotNull().alias("jc"),
            F.col("prv").alias("p"),
            F.col("cp").isNotNull().alias("pc"),
            F.col("vid").alias("m"),
        )
        .transform(truncate_plan)
    )
    rounds = max(1, int(n_chain).bit_length())
    for _ in range(rounds):
        jstate = st.select(
            F.col("vid").alias("j"),
            F.col("j").alias("j2"),
            F.col("jc").alias("jc2"),
            F.col("m").alias("m2"),
        )
        pstate = st.select(
            F.col("vid").alias("p"), F.col("p").alias("p2"), F.col("pc").alias("pc2")
        )
        st = (
            st.join(jstate, "j", "left")
            .join(pstate, "p", "left")
            .select(
                "vid",
                F.when(F.col("jc"), F.col("j2")).otherwise(F.col("j")).alias("j"),
                F.when(F.col("jc"), F.col("jc2")).otherwise(F.lit(False)).alias("jc"),
                F.when(F.col("pc"), F.col("p2")).otherwise(F.col("p")).alias("p"),
                F.when(F.col("pc"), F.col("pc2")).otherwise(F.lit(False)).alias("pc"),
                F.when(F.col("jc"), F.least("m", "m2")).otherwise(F.col("m")).alias("m"),
            )
            .transform(truncate_plan)
        )
    # jc still true after ceil(log2(n_chain)) doublings ⇒ the jump walked
    # ≥ n_chain hops without leaving the chain set ⇒ pure cycle; the
    # forward window wrapped the whole cycle, so m = its min vid.
    cycle_comp = st.where("jc").select("vid", F.col("m").alias("comp"))
    chain_map = st.where(~F.col("jc")).select(
        "vid", F.col("p").alias("head"), F.col("j").alias("tail")
    )

    nonchain_edges = (
        edges.join(is_chain.withColumnRenamed("vid", "src"), "src", "anti")
        .join(is_chain.withColumnRenamed("vid", "dst"), "dst", "anti")
        .select("src", "dst")
    )
    shortcut = (
        edges.join(is_chain.withColumnRenamed("vid", "src"), "src", "anti")
        .join(chain_map.withColumnRenamed("vid", "dst"), "dst")
        .select("src", F.col("tail").alias("dst"))
    )
    contracted = (
        nonchain_edges.unionByName(shortcut)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg.unpersist()
    return contracted, chain_map, cycle_comp


def scc(graph: LinkGraph, max_rounds: int = 10_000) -> DataFrame:
    """(vid, comp) with comp = min vid of the strongly connected component."""
    from graphscope_spark.algorithms.wcc import wcc
    from graphscope_spark.graph import LinkGraph as _LG

    spark = graph.vertices.sparkSession
    simple = graph.edges.where(F.col("src") != F.col("dst")).distinct()
    contracted, chain_map, cycle_comp = _contract_chains(simple, graph.vertices)
    chain_map = chain_map.persist()
    cycle_comp = cycle_comp.persist()
    chain_map.count()
    cycle_comp.count()

    chain_vids = chain_map.select("vid").unionByName(cycle_comp.select("vid"))
    branch_verts = graph.vertices.select("vid").join(chain_vids, "vid", "anti")

    all_edges = contracted.repartition(F.col("src")).persist()
    all_edges.count()
    remaining = branch_verts.transform(truncate_plan)
    assigned = spark.createDataFrame([], "vid long, comp long")

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # -- trim: zero in- or out-degree within `remaining` → singleton SCC
        while True:
            e_r = all_edges.join(
                remaining.withColumnRenamed("vid", "src"), "src"
            ).join(remaining.withColumnRenamed("vid", "dst"), "dst")
            has_out = e_r.select(F.col("src").alias("vid")).distinct()
            has_in = e_r.select(F.col("dst").alias("vid")).distinct()
            keep = (
                remaining.join(has_out, "vid", "semi")
                .join(has_in, "vid", "semi")
                .transform(truncate_plan)
            )
            n_keep = keep.count()
            trimmed = remaining.join(keep, "vid", "anti")
            if trimmed.count() == 0:
                break
            assigned = assigned.unionByName(
                trimmed.select("vid", F.col("vid").alias("comp"))
            ).transform(truncate_plan)
            remaining = keep
            if n_keep == 0:
                break
        if remaining.count() == 0:
            break
        # -- parallel pivot round over the remaining subgraph ---------------
        e_r = (
            all_edges.join(remaining.withColumnRenamed("vid", "src"), "src")
            .join(remaining.withColumnRenamed("vid", "dst"), "dst")
            .transform(truncate_plan)
        )
        sub = _LG(vertices=remaining, edges=e_r, num_partitions=graph.num_partitions)
        comp = wcc(sub).state  # (vid, comp) — comp = min vid = the pivot
        pivots = comp.select(F.col("comp").alias("vid")).distinct()
        fw = _reach(e_r, pivots, reverse=False)
        bw = _reach(e_r, pivots, reverse=True)
        found = fw.join(bw, "vid", "semi").transform(truncate_plan)
        assigned = assigned.unionByName(
            found.join(comp, "vid").select("vid", "comp")
        ).transform(truncate_plan)
        remaining = remaining.join(found, "vid", "anti").transform(truncate_plan)

    # -- fold chain vertices back in ---------------------------------------
    # a chain path lies on a cycle iff its bracketing non-chain vertices
    # ended up in the same contracted SCC
    ch = (
        chain_map.join(
            assigned.select(F.col("vid").alias("head"), F.col("comp").alias("hc")),
            "head",
        )
        .join(
            assigned.select(F.col("vid").alias("tail"), F.col("comp").alias("tc")),
            "tail",
        )
        .select(
            "vid",
            F.when(F.col("hc") == F.col("tc"), F.col("hc"))
            .otherwise(F.col("vid"))
            .alias("comp"),
        )
    )
    merged = assigned.unionByName(ch).unionByName(cycle_comp)
    # re-minimize the representative over full membership (a chain vid can
    # be smaller than every branching vid in its SCC)
    rep = merged.groupBy("comp").agg(F.min("vid").alias("newc"))
    out = merged.join(rep, "comp").select("vid", F.col("newc").alias("comp"))
    out = out.localCheckpoint(eager=True)
    all_edges.unpersist()
    chain_map.unpersist()
    cycle_comp.unpersist()
    return out
