"""Triangle-anchored motif counting — diamonds, tailed triangles, 3-paths,
and the four directed-triangle classes (cyclic / acyclic / in+ / out+).

Reference semantics (`/root/reference/analytical_engine/apps/flash/subgraph/`):

* `diamond.h:62-76` — #diamonds = Σ over adjacent pairs {u,v} of
  C(codeg(u,v), 2): a (non-induced) diamond is a pair of triangles sharing
  its diagonal edge.
* `tailed-triangle.h:58-72` — Σ over edges e={u,v} of
  codeg(e)·((deg u − 2) + (deg v − 2)), halved: every triangle counted with
  a pendant edge at each corner.
* `3-path.h:58-68` — Σ over edges e={u,v} of
  (deg u − 1)(deg v − 1) − codeg(e): paths of length 3 with e as the middle
  edge (subtracting the closed wedges).
* `cyclic-triangle.h:60-72` — directed 3-cycles a→b→c→a.
* `acyclic-triangle.h:53-64` — for EVERY directed edge (s,d), common
  out-neighbours x (s→x and d→x): transitive-triangle instances, one per
  directed edge of a mutual pair.
* `in-triangle.h:58-70` / `out-triangle.h:58-70` — MUTUAL pairs s↔d with a
  common out-neighbour (s→x, d→x) resp. common in-neighbour (x→s, x→d).

Spark shape — all seven counts are aggregations over ONE skew-safe kernel:
the (deg,id)-oriented triangle enumeration of `algorithms/triangles.py`
(out-neighbourhoods bounded by O(√m), so no hub blow-up), extended with a
per-pair direction mask (bit 1: low-vid→high-vid edge exists, bit 2: the
reverse). The FLASH kernels instead hold full neighbour hash-sets per
vertex — per-vertex O(deg) state that a hub-heavy web graph can't afford;
anchoring every motif at its unique orientation-minimal triangle (or edge)
keeps the shuffle volume at the intrinsic triangle count. The DuckDB
oracles in `__spark_entry__.py` are independent direct joins over the
directed edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def _directed_simple(graph: LinkGraph) -> DataFrame:
    """Distinct directed edges, self-loops dropped."""
    return (
        graph.edges.where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _pair_masks(graph: LinkGraph) -> DataFrame:
    """(a, b, mask) for every adjacent unordered pair, a < b by vid;
    mask bit 1 = a→b present, bit 2 = b→a present."""
    d = _directed_simple(graph)
    return (
        d.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.when(F.col("src") < F.col("dst"), F.lit(1)).otherwise(F.lit(2)).alias("m"),
        )
        .groupBy("a", "b")
        .agg(F.sum(F.col("m").cast("int")).alias("mask"))
    )


def triangle_instances(graph: LinkGraph) -> DataFrame:
    """One row per undirected triangle {x, y, z} (x < y < z by vid) with the
    three direction masks (mxy, mxz, myz) — the shared kernel for every
    directed-motif count. Enumeration is the (deg,id)-oriented sorted-
    intersection from `algorithms/triangles.py`, so each triangle appears
    exactly once and hub skew is bounded."""
    from graphscope_spark.algorithms.subgraph import _closed_triangles

    closed, oriented = _closed_triangles(graph, min_ws=1)
    tri = closed.select("u", "v", F.explode("ws").alias("w"))
    # canonicalize to x < y < z by vid (orientation order is (deg,id));
    # sort_array, not least/sum/greatest — a vid sum overflows BIGINT for
    # full-range xxhash64 ids
    arr = F.sort_array(F.array("u", "v", "w"))
    tri = tri.select(
        arr[0].alias("x"), arr[1].alias("y"), arr[2].alias("z")
    )
    masks = _pair_masks(graph)
    out = (
        tri.join(
            masks.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("mask").alias("mxy")),
            ["x", "y"],
        )
        .join(
            masks.select(F.col("a").alias("x"), F.col("b").alias("z"), F.col("mask").alias("mxz")),
            ["x", "z"],
        )
        .join(
            masks.select(F.col("a").alias("y"), F.col("b").alias("z"), F.col("mask").alias("myz")),
            ["y", "z"],
        )
    )
    oriented.unpersist()
    return out


def _dir_bits(t):
    """Six boolean direction columns from the three masks of a canonical
    triangle row (x < y < z)."""
    b = {}
    b["xy"] = (F.col("mxy").bitwiseAND(1)) > 0
    b["yx"] = (F.col("mxy").bitwiseAND(2)) > 0
    b["xz"] = (F.col("mxz").bitwiseAND(1)) > 0
    b["zx"] = (F.col("mxz").bitwiseAND(2)) > 0
    b["yz"] = (F.col("myz").bitwiseAND(1)) > 0
    b["zy"] = (F.col("myz").bitwiseAND(2)) > 0
    return b


def _count_expr(per_tri, alias):
    return F.coalesce(F.sum(per_tri.cast("long")), F.lit(0).cast("long")).alias(alias)


def cyclic_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (cyclic bigint) — directed 3-cycles a→b→c→a (each cycle once;
    a mutual-edge triangle can host both rotations)."""
    t = triangle_instances(graph)
    b = _dir_bits(t)
    fwd = (b["xy"] & b["yz"] & b["zx"]).cast("int")
    bwd = (b["xz"] & b["zy"] & b["yx"]).cast("int")
    return t.agg(_count_expr(fwd + bwd, "cyclic"))


def acyclic_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (acyclic bigint) — per reference: for every DIRECTED edge
    (s,d), common out-neighbours x with s→x and d→x (mutual s↔d pairs
    contribute one instance per direction)."""
    t = triangle_instances(graph)
    b = _dir_bits(t)
    total = None
    # ordered (s, d) over the 3 vertices; x = the third
    for s, d, xx in [
        ("x", "y", "z"), ("y", "x", "z"),
        ("x", "z", "y"), ("z", "x", "y"),
        ("y", "z", "x"), ("z", "y", "x"),
    ]:
        term = (b.get(s + d, F.lit(False)) & b[s + xx] & b[d + xx]).cast("int")
        total = term if total is None else total + term
    return t.agg(_count_expr(total, "acyclic"))


def in_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (in_tri bigint) — mutual pairs s↔d with common out-neighbour
    x (s→x AND d→x), per reference in-triangle.h."""
    t = triangle_instances(graph)
    b = _dir_bits(t)
    mut = {
        ("x", "y"): b["xy"] & b["yx"],
        ("x", "z"): b["xz"] & b["zx"],
        ("y", "z"): b["yz"] & b["zy"],
    }
    total = None
    for (s, d), m in mut.items():
        xx = ({"x", "y", "z"} - {s, d}).pop()
        term = (m & b[s + xx] & b[d + xx]).cast("int")
        total = term if total is None else total + term
    return t.agg(_count_expr(total, "in_tri"))


def out_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (out_tri bigint) — mutual pairs s↔d with common in-neighbour
    x (x→s AND x→d), per reference out-triangle.h."""
    t = triangle_instances(graph)
    b = _dir_bits(t)
    mut = {
        ("x", "y"): b["xy"] & b["yx"],
        ("x", "z"): b["xz"] & b["zx"],
        ("y", "z"): b["yz"] & b["zy"],
    }
    total = None
    for (s, d), m in mut.items():
        xx = ({"x", "y", "z"} - {s, d}).pop()
        term = (m & b[xx + s] & b[xx + d]).cast("int")
        total = term if total is None else total + term
    return t.agg(_count_expr(total, "out_tri"))


def cycle_plus_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (cycle_plus bigint) — ordered instances (s, d, x) with a
    MUTUAL pair s↔d and the directed cycle s→d→x→s (i.e. edges d→x and
    x→s), per reference `apps/flash/subgraph/cycle-plus-triangle.h:46-77`
    (pass 1/2 collect un-filtered in/out neighbour sets, pass 3 requires
    the reciprocal `did ∈ s.in` before intersecting — so each triangle
    contributes once per (ordered mutual pair, completing vertex)."""
    t = triangle_instances(graph)
    b = _dir_bits(t)
    mut = {
        ("x", "y"): b["xy"] & b["yx"],
        ("x", "z"): b["xz"] & b["zx"],
        ("y", "z"): b["yz"] & b["zy"],
    }
    total = None
    # ordered (s, d): both orders of each unordered mutual pair count
    for (p, q), m in mut.items():
        third = ({"x", "y", "z"} - {p, q}).pop()
        for s, d in ((p, q), (q, p)):
            term = (m & b[d + third] & b[third + s]).cast("int")
            total = term if total is None else total + term
    return t.agg(_count_expr(total, "cycle_plus"))


def lcc_directed(graph: LinkGraph) -> DataFrame:
    """(vid, lcc_directed) — directed local clustering coefficient
    (reference ``grape::LCCDirected``, ``.gs_conf.yaml:95-102`` — the
    LDBC Graphalytics LCC definition applied to directed graphs):
    N(v) = in∪out neighbours (self excluded), and

        lcc(v) = |{(u, w) : u, w ∈ N(v), u ≠ w, u→w ∈ E}| / (d·(d−1))

    with d = |N(v)|; 0 when d < 2. A mutual pair among the neighbours
    contributes twice (both ordered pairs), matching the spec.

    Spark shape: the numerator rides the SHARED canonical triangle kernel
    (``triangle_instances`` — degree-ordered orientation, √m fan-out):
    every directed edge between two neighbours of v closes a triangle
    containing v, so corner v of each canonical triangle {x,y,z} gains
    the popcount of the OPPOSITE pair's direction mask. No new join
    shape, no wedge-squared blowup on hubs."""
    t = triangle_instances(graph)

    def pop(m):
        return (
            (F.col(m).bitwiseAND(1) > 0).cast("long")
            + (F.col(m).bitwiseAND(2) > 0).cast("long")
        )

    per = t.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("vid"), pop("myz").alias("c")),
                F.struct(F.col("y").alias("vid"), pop("mxz").alias("c")),
                F.struct(F.col("z").alias("vid"), pop("mxy").alias("c")),
            )
        ).alias("s")
    ).select("s.vid", "s.c")
    num = per.groupBy("vid").agg(F.sum("c").cast("long").alias("num"))
    deg = graph.degrees()
    return (
        graph.vertices.select("vid")
        .join(deg, "vid", "left")
        .join(num, "vid", "left")
        .select(
            "vid",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                F.coalesce(F.col("num"), F.lit(0))
                * 1.0
                / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc_directed"),
        )
    )


def _edge_codegree(graph: LinkGraph) -> DataFrame:
    """(a, b, t) — canonical undirected edge with its triangle count
    (= common-neighbour count), edges in no triangle included with t=0."""
    from graphscope_spark.algorithms.subgraph import _closed_triangles

    closed, oriented = _closed_triangles(graph, min_ws=1)
    tri = closed.select("u", "v", F.explode("ws").alias("w"))
    sides = None
    for p, q in [("u", "v"), ("u", "w"), ("v", "w")]:
        side = tri.select(F.least(p, q).alias("a"), F.greatest(p, q).alias("b"))
        sides = side if sides is None else sides.unionByName(side)
    cnt = sides.groupBy("a", "b").agg(F.count("*").alias("t"))
    und = graph.undirected_edges(drop_self_loops=True).where(
        F.col("src") < F.col("dst")
    ).select(F.col("src").alias("a"), F.col("dst").alias("b"))
    out = und.join(cnt, ["a", "b"], "left").select(
        "a", "b", F.coalesce("t", F.lit(0)).cast("long").alias("t")
    )
    oriented.unpersist()
    return out


def _with_degrees(graph: LinkGraph, codeg: DataFrame) -> DataFrame:
    deg = graph.degrees()
    return codeg.join(
        deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")


def diamond_count(graph: LinkGraph) -> DataFrame:
    """One row (diamonds bigint) — non-induced diamonds (K4 minus an edge):
    Σ over adjacent pairs of C(codeg, 2)."""
    codeg = _edge_codegree(graph)
    return codeg.agg(
        F.coalesce(F.sum(F.col("t") * (F.col("t") - 1) / 2), F.lit(0.0))
        .cast("long")
        .alias("diamonds")
    )


def tailed_triangle_count(graph: LinkGraph) -> DataFrame:
    """One row (tailed bigint) — triangles with a pendant edge:
    Σ_e codeg(e)·(deg_a + deg_b − 4) / 2 = Σ_triangles Σ_corners (deg−2)."""
    e = _with_degrees(graph, _edge_codegree(graph))
    return e.agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("da") + F.col("db") - 4) / 2), F.lit(0.0)
        )
        .cast("long")
        .alias("tailed")
    )


def path3_count(graph: LinkGraph) -> DataFrame:
    """One row (paths3 bigint) — simple 3-edge paths:
    Σ_e (deg_a − 1)(deg_b − 1) − codeg(e), e the middle edge."""
    e = _with_degrees(graph, _edge_codegree(graph))
    return e.agg(
        F.coalesce(
            F.sum((F.col("da") - 1) * (F.col("db") - 1) - F.col("t")), F.lit(0)
        )
        .cast("long")
        .alias("paths3")
    )
