"""Clustering statistics and boundary / assortativity operators.

Reference semantics:

* avg_clustering: `gs::AvgClustering` (`apps/clustering/avg_clustering.h`,
  `.gs_conf.yaml:180-185`) — mean of per-vertex local clustering
  coefficients over all vertices.
* transitivity: `gs::Transitivity` (`apps/clustering/transitivity.h`,
  `.gs_conf.yaml:186-191`) — 3·triangles / wedges (global ratio).
* node_boundary / edge_boundary: `apps/boundary/node_boundary.h` /
  `edge_boundary.h` (`.gs_conf.yaml:242-253`) — NetworkX semantics:
  node_boundary(S) = vertices outside S with an in-edge from S;
  edge_boundary(S, T=V∖S) = edges from S to outside S.
* degree_assortativity: `apps/assortativity/degree_assortativity_coefficient.h`
  (`.gs_conf.yaml:234-241`) — Pearson correlation of (out-deg(src),
  in-deg(dst)) over directed edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.algorithms.triangles import lcc, total_triangles
from graphscope_spark.graph import LinkGraph


def avg_clustering(graph: LinkGraph) -> float:
    """Mean local clustering coefficient (vertices with deg<2 count as 0)."""
    row = lcc(graph).agg(F.avg("lcc").alias("c")).collect()[0]
    return float(row["c"] or 0.0)


def transitivity(graph: LinkGraph) -> float:
    """3 × triangles / wedges on the undirected simple graph."""
    tri3 = total_triangles(graph) * 3
    wedges = (
        graph.degrees()
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w"))
        .collect()[0]["w"]
        or 0.0
    )
    return float(tri3 / wedges) if wedges else 0.0


def node_boundary(graph: LinkGraph, s: DataFrame) -> DataFrame:
    """Vertices NOT in S that receive an edge from S: (vid)."""
    sv = s.select("vid").distinct()
    out = (
        graph.edges.join(sv.withColumnRenamed("vid", "src"), "src", "semi")
        .select(F.col("dst").alias("vid"))
        .distinct()
        .join(sv, "vid", "anti")
    )
    return out


def edge_boundary(graph: LinkGraph, s: DataFrame) -> DataFrame:
    """Edges (src, dst) with src ∈ S and dst ∉ S."""
    sv = s.select("vid").distinct()
    return (
        graph.edges.join(sv.withColumnRenamed("vid", "src"), "src", "semi")
        .join(sv.withColumnRenamed("vid", "dst"), "dst", "anti")
        .select("src", "dst")
    )


def average_degree_connectivity(graph: LinkGraph) -> DataFrame:
    """(deg, avg_nbr_deg): for each undirected degree k, the mean over all
    degree-k vertices of the average degree of their neighbors — reference
    `apps/assortativity/average_degree_connectivity.h`
    (`.gs_conf.yaml:254-261`), NetworkX semantics on the simple graph."""
    deg = graph.degrees()
    sym = graph.undirected_edges(drop_self_loops=True)
    nbr_deg = (
        sym.join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "nbr_deg"), "dst")
        .groupBy(F.col("src").alias("vid"))
        .agg(F.avg("nbr_deg").alias("mean_nbr_deg"))
    )
    return (
        deg.join(nbr_deg, "vid")
        .groupBy("deg")
        .agg(F.avg("mean_nbr_deg").alias("avg_nbr_deg"))
    )


def attribute_assortativity(graph: LinkGraph, attrs: DataFrame) -> float:
    """Categorical attribute assortativity coefficient — reference
    `apps/assortativity/attribute_assortativity.h` (`.gs_conf.yaml:262-269`),
    NetworkX semantics: ``r = (tr(e) − Σ a·b) / (1 − Σ a·b)`` over the
    directed-edge mixing matrix. ``attrs`` is (vid, attr).

    The mixing matrix is a tiny |categories|² aggregate — the heavy work is
    one distributed double join; the matrix math is driver-side."""
    sa = attrs.select(F.col("vid").alias("src"), F.col("attr").alias("ax"))
    sb = attrs.select(F.col("vid").alias("dst"), F.col("attr").alias("ay"))
    cells = (
        graph.edges.join(sa, "src").join(sb, "dst")
        .groupBy("ax", "ay")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    total = sum(r["c"] for r in cells)
    if total == 0:
        return 0.0
    cats = sorted({r["ax"] for r in cells} | {r["ay"] for r in cells})
    e = {(r["ax"], r["ay"]): r["c"] / total for r in cells}
    a = {x: sum(e.get((x, y), 0.0) for y in cats) for x in cats}
    b = {y: sum(e.get((x, y), 0.0) for x in cats) for y in cats}
    tr = sum(e.get((x, x), 0.0) for x in cats)
    ab = sum(a[x] * b[x] for x in cats)
    return (tr - ab) / (1.0 - ab) if ab != 1.0 else 1.0


def degree_assortativity(graph: LinkGraph) -> float:
    """Pearson correlation of (out-degree(src), in-degree(dst)) across
    directed edges — one join + `corr` aggregate."""
    out_deg = graph.out_degrees().withColumnRenamed("vid", "src")
    in_deg = graph.in_degrees().withColumnRenamed("vid", "dst")
    row = (
        graph.edges.join(out_deg, "src")
        .join(in_deg, "dst")
        .agg(F.corr(F.col("out_deg").cast("double"), F.col("in_deg").cast("double")).alias("r"))
        .collect()[0]
    )
    return float(row["r"]) if row["r"] is not None else 0.0


def numeric_assortativity(graph: LinkGraph, attrs: DataFrame) -> float:
    """Numeric attribute assortativity coefficient — reference
    `apps/assortativity/numeric_assortativity.h` (NetworkX
    ``numeric_assortativity_coefficient`` semantics). For a numeric
    attribute the mixing-matrix Pearson formula reduces to the plain
    Pearson correlation of (attr(src), attr(dst)) over directed edges, so
    this is one distributed double join + a single `corr` aggregate —
    the same shape as `degree_assortativity`. ``attrs`` is (vid, attr)."""
    sa = attrs.select(F.col("vid").alias("src"), F.col("attr").cast("double").alias("ax"))
    sb = attrs.select(F.col("vid").alias("dst"), F.col("attr").cast("double").alias("ay"))
    row = (
        graph.edges.join(sa, "src")
        .join(sb, "dst")
        .agg(F.corr("ax", "ay").alias("r"))
        .collect()[0]
    )
    return float(row["r"]) if row["r"] is not None else 0.0


def modularity_by_community(graph: LinkGraph, assignment: DataFrame) -> DataFrame:
    """Per-community modularity contributions on the undirected simple
    graph: (comm, intra_edges, degree_sum, contrib) with
    ``contrib = L_c/m − (d_c/(2m))²`` — NetworkX ``modularity`` semantics
    (γ=1); total Q = Σ contrib. ``assignment`` is (vid, comm).

    Scale: two broadcast-able joins of the edge table against the
    assignment (the assignment is one long per vertex), then two map-side
    partially-aggregated groupBys keyed by community — no pair
    enumeration anywhere."""
    und = graph.undirected_edges().where(F.col("src") < F.col("dst"))
    m = und.count()
    if m == 0:
        # derive comm's type from the assignment so empty and non-empty
        # snapshots union cleanly (comm may be string-labelled)
        comm_t = assignment.schema["comm"].dataType.simpleString()
        return assignment.sparkSession.createDataFrame(
            [],
            f"comm {comm_t}, intra_edges long, degree_sum long, contrib double",
        )
    ca = assignment.select(F.col("vid").alias("src"), F.col("comm").alias("ca"))
    cb = assignment.select(F.col("vid").alias("dst"), F.col("comm").alias("cb"))
    intra = (
        und.join(ca, "src")
        .join(cb, "dst")
        .where(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("comm"))
        .agg(F.count("*").alias("intra_edges"))
    )
    dsum = (
        graph.degrees()
        .join(assignment, "vid")
        .groupBy("comm")
        .agg(F.sum("deg").alias("degree_sum"))
    )
    two_m = float(2 * m)
    return (
        dsum.join(intra, "comm", "left")
        .select(
            "comm",
            F.coalesce(F.col("intra_edges"), F.lit(0)).alias("intra_edges"),
            "degree_sum",
            (
                F.coalesce(F.col("intra_edges"), F.lit(0)) / F.lit(float(m))
                - (F.col("degree_sum") / F.lit(two_m)) ** 2
            ).alias("contrib"),
        )
    )


def modularity(graph: LinkGraph, assignment: DataFrame) -> float:
    """Total modularity Q of a partition (scalar)."""
    row = (
        modularity_by_community(graph, assignment)
        .agg(F.sum("contrib").alias("q"))
        .collect()[0]
    )
    return float(row["q"] or 0.0)


def conductance(graph: LinkGraph, s: DataFrame) -> float:
    """Conductance φ(S) = cut(S, S̄) / min(vol(S), vol(S̄)) on the
    undirected simple graph — NetworkX ``conductance`` semantics with
    volumes counted in edge endpoints (vol(S) = Σ_{v∈S} deg(v)).

    One semi/anti-join pass over the canonical undirected edge set for the
    cut, one join for the volumes — three scalar aggregates total."""
    sv = s.select("vid").distinct()
    und = graph.undirected_edges().where(F.col("src") < F.col("dst"))
    flagged = und.join(
        sv.select(F.col("vid").alias("src"), F.lit(1).alias("in_s")),
        "src",
        "left",
    ).join(
        sv.select(F.col("vid").alias("dst"), F.lit(1).alias("in_d")),
        "dst",
        "left",
    )
    cut = flagged.where(
        F.coalesce(F.col("in_s"), F.lit(0)) != F.coalesce(F.col("in_d"), F.lit(0))
    ).count()
    vols = (
        graph.degrees()
        .join(sv.withColumn("in_s", F.lit(1)), "vid", "left")
        .groupBy(F.coalesce(F.col("in_s"), F.lit(0)).alias("in_s"))
        .agg(F.sum("deg").alias("vol"))
        .collect()
    )
    vol = {int(r["in_s"]): int(r["vol"]) for r in vols}
    denom = min(vol.get(1, 0), vol.get(0, 0))
    return float(cut) / denom if denom else 0.0
