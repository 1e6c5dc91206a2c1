"""Simple-path checks — membership queries over the edge table.

Reference: `gs::IsSimplePath` (`/root/reference/analytical_engine/apps/
simple_path/is_simple_path.h`, `.gs_conf.yaml:270-277`) — NetworkX
semantics: a list of vertices is a simple path iff all vertices exist, are
pairwise distinct, and every consecutive pair is an edge. (A single
existing vertex is a trivial simple path.)

Spark shape: the candidate path is a tiny local list — broadcast it as a
consecutive-pair table and anti-join against the edge table; zero missing
pairs ⇒ path holds. Scales with |path|, not |E| beyond one semi-join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def is_simple_path(graph: LinkGraph, path: list[int]) -> bool:
    if len(path) == 0:
        return False
    if len(set(path)) != len(path):
        return False
    spark = graph.vertices.sparkSession
    verts = spark.createDataFrame([(v,) for v in path], "vid long")
    n_exist = graph.vertices.join(verts, "vid", "semi").count()
    if n_exist != len(path):
        return False
    if len(path) == 1:
        return True
    pairs = spark.createDataFrame(
        list(zip(path[:-1], path[1:])), "src long, dst long"
    )
    missing = pairs.join(graph.edges, ["src", "dst"], "anti").count()
    return missing == 0


def all_simple_paths(
    graph: LinkGraph, source: int, target: int, cutoff: int
) -> "DataFrame":
    """All simple (vertex-disjoint) directed paths source→target with at
    most ``cutoff`` edges, one row per path: (path string "v0->v1->...").

    Reference: `gs::AllSimplePaths`
    (`/root/reference/analytical_engine/apps/simple_path/all_simple_paths.h`,
    279 LoC) — bounded path enumeration. Spark shape: BSP frontier of
    partial paths carried as an array column; each superstep one join with
    the edge table plus an ``array_contains`` simplicity filter. Paths that
    reach ``target`` retire (a simple path cannot revisit it), so state
    holds only live prefixes; worst case O(b^cutoff) — the cutoff IS the
    scale contract, exactly as in the reference."""
    from pyspark.sql import DataFrame  # noqa: F401 (annotation)

    spark = graph.vertices.sparkSession
    edges = graph.edges.where(F.col("src") != F.col("dst")).persist()
    edges.count()
    frontier = spark.createDataFrame([([source],)], "path array<long>")
    done = spark.createDataFrame([], "path array<long>")
    for _ in range(cutoff):
        ext = (
            frontier.join(edges, F.element_at(F.col("path"), -1) == F.col("src"))
            .where(~F.array_contains(F.col("path"), F.col("dst")))
            .select(F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"))
            .localCheckpoint(eager=True)
        )
        arrived = ext.where(F.element_at(F.col("path"), -1) == target)
        done = done.unionByName(arrived).localCheckpoint(eager=True)
        frontier = ext.where(F.element_at(F.col("path"), -1) != target)
        if frontier.count() == 0:
            break
    edges.unpersist()
    return done.select(F.concat_ws("->", F.col("path").cast("array<string>")).alias("path"))


def path_exists_sql(path: list[int]) -> str:
    """DuckDB mirror returning one row (is_path BIGINT 0/1) for the gate."""
    pair_rows = ", ".join(f"({a}, {b})" for a, b in zip(path[:-1], path[1:]))
    vert_rows = ", ".join(f"({v})" for v in path)
    distinct_ok = 1 if len(set(path)) == len(path) else 0
    return f"""
p AS (SELECT * FROM (VALUES {pair_rows}) AS t(src, dst)),
pv AS (SELECT * FROM (VALUES {vert_rows}) AS t(vid)),
missing AS (SELECT COUNT(*) AS m FROM p WHERE NOT EXISTS
            (SELECT 1 FROM edges e WHERE e.src = p.src AND e.dst = p.dst)),
vmissing AS (SELECT COUNT(*) AS m FROM pv WHERE vid NOT IN (SELECT vid FROM verts))
SELECT CAST(CASE WHEN {distinct_ok} = 1
                  AND (SELECT m FROM missing) = 0
                  AND (SELECT m FROM vmissing) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS is_path
"""


def all_simple_edge_paths(
    graph: LinkGraph, source: int, target: int, cutoff: int
) -> "DataFrame":
    """All simple directed paths source→target as EDGE sequences, one row
    per path: (path string "u->v|v->w|...").

    Reference: NetworkX-builtin ``all_simple_edge_paths``
    (`/root/reference/python/graphscope/nx/algorithms/builtin.py:933`) —
    the edge-list projection of `all_simple_paths`. On a simple LinkGraph
    (no parallel edges) each vertex path maps to exactly one edge path, so
    this reuses the bounded BSP enumeration and re-expresses every
    consecutive vertex pair as an edge token — a pure column transform, no
    extra joins."""
    vp = all_simple_paths(graph, source, target, cutoff)
    verts = F.split(F.col("path"), "->")
    pairs = F.transform(
        F.slice(verts, 1, F.size(verts) - 1),
        lambda v, i: F.concat(v, F.lit("->"), F.element_at(verts, i + 2)),
    )
    return vp.select(F.array_join(pairs, "|").alias("epath"))
