"""k-truss / truss decomposition — edge peeling by triangle support.

Semantics (NetworkX ≥2.x definition, the surface the reference exposes and
tests through its NetworkX layer —
`/root/reference/python/graphscope/nx/algorithms/tests/builtin/test_core.py:175-190`):

* support(e) = number of triangles of the CURRENT subgraph containing edge e
* the k-truss is the maximal subgraph in which every edge has
  support ≥ k-2 (so the 2-truss is the whole simple graph)
* trussness(e) = the largest k such that e survives in the k-truss —
  the edge-level analog of coreness, computed by peeling k = 3, 4, …

Spark shape: the same degree-ordered orientation + sorted-intersection
kernel as `triangles` (`algorithms/triangles.py`) enumerates triangle
instances of the REMAINING edge set each round; each instance credits its
three (canonicalized) edges, one groupBy gives per-edge support, and edges
below threshold drop.  One count() action per round (the `kcore` peel
pattern, `algorithms/kcore.py:23`), lineage truncated per round.

Scale notes (100 TB):
* per-round work is one triangle enumeration of the remaining graph — the
  oriented out-degree bound O(√m) caps intersection fan-out exactly as in
  `triangles`, so no round is worse than a full triangle count;
* the edge set only shrinks, so rounds get cheaper; round COUNT is the
  truss peel depth, which on web graphs is small (supports drop in whole
  layers).  The decomposition's total cost is Σ_k (rounds at k) triangle
  passes; `max_k` bounds it and raising is explicit, mirroring `coloring`'s
  bounded-round contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import release_truncated, truncate_plan, truncate_plan_lazy
from graphscope_spark.graph import LinkGraph, sorted_adjacency
from graphscope_spark.algorithms.triangles import _sorted_intersect


def _canonical_edges(graph: LinkGraph) -> DataFrame:
    """One row per undirected simple edge: (a, b) with a < b."""
    return (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def edge_support(edges_ab: DataFrame, num_partitions: int) -> DataFrame:
    """(a, b, sup) — triangles-per-edge over a canonical (a<b) edge set.

    Degree-ordered orientation within THIS edge set (degrees shift as the
    peel removes edges, so orientation is recomputed per call — required
    for the O(√m) out-degree bound to keep holding on the shrinking graph).
    Edges in no triangle get sup = 0.
    """
    deg = (
        edges_ab.select(F.col("a").alias("vid"))
        .unionAll(edges_ab.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("deg_b"))
    ed = edges_ab.join(da, "a").join(db, "b")
    lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist()
    adj = sorted_adjacency(
        oriented.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        num_partitions,
    )
    adj_u = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nbrs_v"))
    tri = (
        oriented.join(adj_u, "u")
        .join(adj_v, "v")
        .select("u", "v", F.explode(_sorted_intersect("nbrs_u", "nbrs_v")).alias("w"))
    )
    # each triangle {u,v,w} credits its three edges, canonicalized a<b
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
                ),
                F.struct(
                    F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
                ),
                F.struct(
                    F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = tri_edges.groupBy("a", "b").agg(F.count("*").cast("long").alias("sup"))
    out = edges_ab.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("sup"), F.lit(0)).cast("long").alias("sup")
    )
    # EAGER truncation: `oriented` feeds the plan three times (both adjacency
    # sides + the instance join); materializing before the unpersist below
    # computes it once from cache — a lazy cut would recompute it per use
    # after the blocks are gone (localCheckpoint lineage is severed, but
    # oriented is a plain persist, so it silently recomputes instead).
    out = truncate_plan(out)
    oriented.unpersist()
    return out


def _truss_fixpoint(
    edges_ab: DataFrame,
    k: int,
    num_partitions: int,
    max_rounds: int,
    n_start: int | None = None,
) -> tuple[DataFrame, int]:
    """Peel edges with support < k-2 to the fixpoint; returns (edges, count).
    ``n_start`` lets a caller that already counted ``edges_ab`` skip the
    redundant count action."""
    cur = edges_ab
    n_cur = cur.count() if n_start is None else n_start
    thresh = k - 2
    for _ in range(max_rounds):
        if n_cur == 0:
            break
        sup = edge_support(cur, num_partitions)
        nxt = truncate_plan_lazy(sup.where(F.col("sup") >= thresh).select("a", "b"))
        n_next = nxt.count()
        # nxt is materialized: the round's support table and the previous
        # edge set are spent — release their checkpoint blocks (a peel can
        # run hundreds of rounds; see release_truncated on driver-heap leaks).
        # The caller's input frame is never released (the caller owns it).
        release_truncated(sup)
        if cur is not edges_ab:
            release_truncated(cur)
        if n_next == n_cur:
            return nxt, n_next
        cur, n_cur = nxt, n_next
        if n_next == 0:
            break
    if n_cur > 0 and thresh > 0:
        # the loop above either converged (returned) or ran out of budget;
        # release the last round's blocks before raising — the documented
        # recovery is retry-with-higher-budget in the same session, which
        # would otherwise leak one frame per attempt
        if cur is not edges_ab:
            release_truncated(cur)
        raise RuntimeError(
            f"k_truss: no fixpoint within max_rounds={max_rounds} at k={k}; "
            "raise max_rounds"
        )
    return cur, n_cur


def k_truss(
    graph: LinkGraph, k: int, max_rounds: int = 200
) -> DataFrame:
    """Edges (a, b) of the k-truss of the undirected simple graph."""
    edges = _canonical_edges(graph)
    if k <= 2:
        return edges
    out, _ = _truss_fixpoint(edges, k, graph.num_partitions, max_rounds)
    return out


def truss_decomposition(
    graph: LinkGraph, max_k: int = 64, max_rounds: int = 200
) -> DataFrame:
    """(a, b, truss) — per-edge trussness, peeling k = 3, 4, … until the
    (k)-truss is empty.  Every simple edge appears; truss ≥ 2."""
    from functools import reduce

    cur = _canonical_edges(graph).persist()
    n_cur = cur.count()
    spark = graph.edges.sparkSession
    # Per-k dropped frames, each truncated at its own materialization (so
    # lineage into the released edge sets is severed). Each row is written
    # once here and once in the final consolidation — O(2·|E|) checkpoint
    # IO total, versus re-checkpointing the whole growing accumulator every
    # round (O(max_k·|E|)), the shape this function shipped with.
    parts: list[DataFrame] = []
    k = 3
    try:
        while n_cur > 0 and k <= max_k:
            # nxt comes back truncate-backed and already materialized
            nxt, n_next = _truss_fixpoint(
                cur, k, graph.num_partitions, max_rounds, n_start=n_cur
            )
            parts.append(
                truncate_plan(
                    cur.join(nxt, ["a", "b"], "left_anti").select(
                        "a", "b", F.lit(k - 1).cast("long").alias("truss")
                    )
                )
            )
            # each release is a no-op on the other kind of frame (plain
            # persist at k=3, truncate-backed afterwards)
            cur.unpersist()
            release_truncated(cur)
            cur, n_cur = nxt, n_next
            k += 1
        if n_cur > 0:
            raise RuntimeError(
                f"truss_decomposition: {n_cur} edges still present at "
                f"k={max_k}; raise max_k"
            )
    except BaseException:
        # the documented recovery is retry-with-higher-budget in the same
        # session; leave nothing registered behind
        for p in parts:
            release_truncated(p)
        cur.unpersist()
        release_truncated(cur)
        raise
    cur.unpersist()
    release_truncated(cur)
    if not parts:
        return spark.createDataFrame([], "a bigint, b bigint, truss bigint")
    # one final consolidation so the result is a single truncate-backed
    # frame (releasable by the caller) instead of a union over ≤max_k leaves
    out = truncate_plan(reduce(lambda x, y: x.unionByName(y), parts))
    for p in parts:
        release_truncated(p)
    return out
