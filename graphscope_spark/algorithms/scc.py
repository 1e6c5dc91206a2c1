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

Spark shape (per-round Contract-Trim-FW-BW):

1. **Chain contraction (pointer doubling, O(log L) rounds) — EVERY outer
   round, on the remaining subgraph.** A *chain vertex* has in-degree 1
   and out-degree 1 *within the not-yet-assigned subgraph*. Maximal chain
   paths are contracted to a single edge (head-predecessor →
   tail-successor) by doubling jumps `j(v) ← j(j(v))`; a chain whose jump
   never reaches a non-chain vertex is a *pure cycle* — a complete SCC
   (no other remaining edge touches a (1,1) vertex) whose id (min member
   vid) falls out of the same doubling by carrying a running min.
   Contracting per round matters: measured at sf0.1, the FULL graph has
   ZERO (1,1) vertices, but its cyclic core is ~62-hop directed cycles —
   which are (1,1) *within the core* and collapse here in ≤⌈log₂ L⌉
   doubling steps instead of L BFS levels (142 s → see BENCH).
2. **Trim to fixpoint** — zero in- or out-degree in the remaining
   subgraph → own SCC; removing those exposes more. Long tendril paths
   that would trim one hop per iteration are already a single shortcut
   edge after step 1, so this converges in O(branching depth).
3. **Doubled fwd/bwd min labels** — f(v) = min ancestor vid, b(v) = min
   descendant vid, each computed by fused edge-relax + pointer-jump
   rounds (``f(v) ← min(f(v), f(f(v)))``), so the phase converges in
   O(log diameter) rounds — BFS reach from pivots paid the full ~500-hop
   directed diameter of the gate web graph per sweep. ``f(v) == b(v) == m``
   ⟺ m both reaches and is reached by v ⟺ v ∈ SCC(m); f and b are
   constant across an SCC (its members share one ancestor set), so whole
   SCCs peel per outer round — at least the min-vid SCC of every weak
   component, in practice every "locally min-closed" SCC at once.
4. **Relabel (LIFO across rounds)** — chain members join their chain's
   SCC iff head and tail land in the same contracted SCC; round-k chain
   brackets may themselves be round-(k+1) chain vertices, so fold-back
   runs newest-round-first. The final component id is re-minimized over
   the full membership (a chain vid can undercut every branching vid).

Outer rounds = the deepest chain of *branching* SCCs inside any weak
component; each inner step is a join + partial aggregate. All shuffles key
on vid; the doubling state is O(#chain vertices in that round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan_lazy
from graphscope_spark.graph import LinkGraph


def _fb_minlabels(
    edges: DataFrame,
    vertices: DataFrame,
    max_rounds: int = 200,
    backward: bool = True,
) -> DataFrame:
    """(vid, f, b): f = min vid among v's ancestors (vertices that REACH v,
    v included), b = min vid among v's descendants — both over ``edges``.

    Each round fuses one edge-relax step with one POINTER-DOUBLING jump
    ``f(v) ← min(f(v), f(f(v)))`` — sound for directed reachability
    because f(v) is an ancestor of v and any ancestor of f(v) is therefore
    an ancestor of v (ditto descendants for b). The jump doubles the
    covered path length per round, so convergence is O(log diameter)
    rounds instead of O(diameter) — on the gate's sf0.1 web graph the
    directed diameter is ~500, which made per-level BFS reach the whole
    cost of SCC (reference log-round shapes: `apps/flash/connectivity/
    scc-2.h`, `cc-log.h`).

    ``backward=False`` computes f only (the b column mirrors f) — the
    log-round WCC mode, where edges are pre-symmetrized and ancestor ==
    descendant == weak-component member.
    """
    state = vertices.select(
        "vid", F.col("vid").alias("f"), F.col("vid").alias("b")
    ).transform(truncate_plan_lazy)
    for _ in range(max_rounds):
        fmsg = (
            edges.join(state.select(F.col("vid").alias("src"), "f"), "src")
            .groupBy("dst")
            .agg(F.min("f").alias("fm"))
            .withColumnRenamed("dst", "vid")
        )
        fjump = state.select(F.col("vid").alias("f"), F.col("f").alias("ff"))
        new = state.join(fmsg, "vid", "left").join(fjump, "f", "left")
        nf = F.least("f", F.coalesce("fm", "f"), F.coalesce("ff", "f"))
        if backward:
            bmsg = (
                edges.join(state.select(F.col("vid").alias("dst"), "b"), "dst")
                .groupBy("src")
                .agg(F.min("b").alias("bm"))
                .withColumnRenamed("src", "vid")
            )
            bjump = state.select(F.col("vid").alias("b"), F.col("b").alias("bb"))
            nb = F.least("b", F.coalesce("bm", "b"), F.coalesce("bb", "b"))
            new = (
                new.join(bmsg, "vid", "left")
                .join(bjump, "b", "left")
                .select(
                    "vid",
                    nf.alias("nf"),
                    nb.alias("nb"),
                    ((F.col("f") != nf) | (F.col("b") != nb)).alias("changed"),
                )
            )
        else:
            new = new.select(
                "vid",
                nf.alias("nf"),
                nf.alias("nb"),
                (F.col("f") != nf).alias("changed"),
            )
        new = new.transform(truncate_plan_lazy)
        n_changed = new.where("changed").count()
        state = new.select(
            "vid", F.col("nf").alias("f"), F.col("nb").alias("b")
        )
        if n_changed == 0:
            break
    return state


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
        .transform(truncate_plan_lazy)
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
            .transform(truncate_plan_lazy)
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
    spark = graph.vertices.sparkSession
    cur_edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(F.col("src"))
        .transform(truncate_plan_lazy)
    )
    remaining = graph.vertices.select("vid").transform(truncate_plan_lazy)
    assigned = spark.createDataFrame([], "vid long, comp long")
    chain_maps: list[DataFrame] = []  # one per round, folded back LIFO

    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        if remaining.count() == 0:
            break
        # -- induce on remaining, then contract (1,1)-chain paths -----------
        e_r = (
            cur_edges.join(remaining.withColumnRenamed("vid", "src"), "src", "semi")
            .join(remaining.withColumnRenamed("vid", "dst"), "dst", "semi")
            .select("src", "dst")  # USING joins reorder cols; union is positional
            .transform(truncate_plan_lazy)
        )
        contracted, cmap, cycle_comp = _contract_chains(e_r, remaining)
        cmap = cmap.persist()
        if cmap.count() > 0 or not cycle_comp.isEmpty():
            chain_maps.append(cmap)
            # pure cycles of (1,1) vertices touch no other remaining edge —
            # each is a complete SCC, final as-is
            assigned = assigned.unionByName(cycle_comp).transform(truncate_plan_lazy)
            remaining = (
                remaining.join(cmap.select("vid"), "vid", "anti")
                .join(cycle_comp.select("vid"), "vid", "anti")
                .transform(truncate_plan_lazy)
            )
            cur_edges = contracted.transform(truncate_plan_lazy)
        else:
            cmap.unpersist()
            cur_edges = e_r
        # -- trim: zero in- or out-degree within `remaining` → singleton SCC
        while True:
            e_t = cur_edges.join(
                remaining.withColumnRenamed("vid", "src"), "src", "semi"
            ).join(remaining.withColumnRenamed("vid", "dst"), "dst", "semi")
            has_out = e_t.select(F.col("src").alias("vid")).distinct()
            has_in = e_t.select(F.col("dst").alias("vid")).distinct()
            keep = (
                remaining.join(has_out, "vid", "semi")
                .join(has_in, "vid", "semi")
                .transform(truncate_plan_lazy)
            )
            n_keep = keep.count()
            trimmed = remaining.join(keep, "vid", "anti")
            if trimmed.count() == 0:
                break
            assigned = assigned.unionByName(
                trimmed.select("vid", F.col("vid").alias("comp"))
            ).transform(truncate_plan_lazy)
            remaining = keep
            if n_keep == 0:
                break
        if remaining.count() == 0:
            break
        # -- doubled fwd/bwd min-label phase over the contracted subgraph ---
        e_r = (
            cur_edges.join(remaining.withColumnRenamed("vid", "src"), "src", "semi")
            .join(remaining.withColumnRenamed("vid", "dst"), "dst", "semi")
            .select("src", "dst")
            .transform(truncate_plan_lazy)
        )
        labels = _fb_minlabels(e_r, remaining)
        found = labels.where(F.col("f") == F.col("b")).select(
            "vid", F.col("f").alias("comp")
        )
        assigned = assigned.unionByName(found).transform(truncate_plan_lazy)
        remaining = remaining.join(found, "vid", "anti").transform(truncate_plan_lazy)
        cur_edges = e_r

    # -- fold chain vertices back in, newest round first --------------------
    # a chain path lies on a cycle iff its bracketing non-chain vertices
    # ended up in the same contracted SCC; a round-k bracket vertex may
    # itself be a round-(k+1) chain vertex, resolved by the LIFO order
    for cmap in reversed(chain_maps):
        ch = (
            cmap.join(
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
        assigned = assigned.unionByName(ch).transform(truncate_plan_lazy)
    # re-minimize the representative over full membership (a chain vid can
    # be smaller than every branching vid in its SCC)
    rep = assigned.groupBy("comp").agg(F.min("vid").alias("newc"))
    out = assigned.join(rep, "comp").select("vid", F.col("newc").alias("comp"))
    out = out.localCheckpoint(eager=True)
    for cmap in chain_maps:
        cmap.unpersist()
    return out
