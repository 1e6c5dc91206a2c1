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
