"""Triangle counting — degree-ordered orientation + sorted-array intersection.

Semantics transliterated from
`/root/reference/analytical_engine/apps/clustering/triangles.h:30-159`:

* undirected view, self-loops and duplicate edges dropped      (:43-47)
* stage 0: global degree table                                  (:49-54)
* stage 1: orient each undirected edge from the smaller to the larger
  endpoint under the total order ``(deg, id)`` — keep u→v iff
  ``deg(u) < deg(v)`` or (``deg(u)==deg(v)`` and ``id(u) < id(v)``)
  (:78-91). Every vertex's oriented out-degree is O(√m), which bounds
  the intersection work and kills the hub-skew problem by construction.
* stage 2: for each oriented edge (u,v), count (and identify)
  ``N⁺(u) ∩ N⁺(v)``; each common w closes triangle {u,v,w}; credit all
  three corners                                                 (:119-139)
* stage 3: per-vertex counts; total = Σ/3                        (:148-153)

Spark shape: oriented sorted adjacency (the CSR analog, built skew-aware via
two-phase salted aggregation, graph.sorted_adjacency) is joined onto the
oriented edge list twice; the intersection runs in an Arrow-batched pandas
UDF over numpy sorted arrays (``np.intersect1d``) — the one place join/agg
genuinely can't express the semantics (SURVEY.md §2.3), and exactly the
"sorted-intersection via pandas UDFs" the north rule prescribes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from graphscope_spark.graph import LinkGraph, sorted_adjacency


@pandas_udf(T.ArrayType(T.LongType()))
def _sorted_intersect(a: pd.Series, b: pd.Series) -> pd.Series:
    """Common elements of two sorted long arrays (vectorized per Arrow batch)."""
    out = []
    for x, y in zip(a.values, b.values):
        if x is None or y is None or len(x) == 0 or len(y) == 0:
            out.append([])
        else:
            out.append(np.intersect1d(np.asarray(x), np.asarray(y), assume_unique=True).tolist())
    return pd.Series(out)


def _oriented(graph: LinkGraph) -> tuple[DataFrame, DataFrame]:
    """(oriented edges u→v under (deg,id) order, degree table)."""
    deg = graph.degrees()
    # one row per undirected edge {u,v}: canonical (small vid, large vid)
    e = graph.edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    lt = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    return oriented, deg


def triangles(graph: LinkGraph) -> DataFrame:
    """Per-vertex triangle counts (vid, tri) — every vertex listed, zeros
    included (matches the reference's vertex_data context output)."""
    P = graph.num_partitions
    oriented, _ = _oriented(graph)
    oriented = oriented.persist()
    adj = sorted_adjacency(
        oriented.select(F.col("u").alias("src"), F.col("v").alias("dst")), P
    ).persist()

    adj_u = adj.select(F.col("src").alias("u"), F.col("nbrs").alias("nbrs_u"))
    adj_v = adj.select(F.col("src").alias("v"), F.col("nbrs").alias("nbrs_v"))
    closed = (
        oriented.join(adj_u, "u")
        .join(adj_v, "v")
        .select("u", "v", _sorted_intersect("nbrs_u", "nbrs_v").alias("ws"))
        .where(F.size("ws") > 0)
    )
    # credit all three corners: u and v once per common w; each w once
    corner_uv = closed.select(
        F.explode(F.array("u", "v")).alias("vid"), F.size("ws").alias("c")
    )
    corner_w = closed.select(F.explode("ws").alias("vid"), F.lit(1).alias("c"))
    counts = (
        corner_uv.unionByName(corner_w)
        .groupBy("vid")
        .agg(F.sum("c").alias("tri"))
    )
    result = (
        graph.vertices.select("vid")
        .join(counts, "vid", "left")
        .select("vid", F.coalesce(F.col("tri"), F.lit(0)).cast("long").alias("tri"))
    )
    return result


def total_triangles(graph: LinkGraph) -> int:
    """Global triangle count = Σ per-vertex / 3."""
    s = triangles(graph).agg(F.sum("tri")).collect()[0][0] or 0
    return int(s) // 3


def lcc(graph: LinkGraph) -> DataFrame:
    """Local clustering coefficient (vid, lcc) = tri(v) / (deg(v)·(deg(v)-1)/2)
    on the undirected simple graph — reference `grape::LCCOpt` semantics
    (.gs_conf.yaml:87-94), triangles ÷ wedge count."""
    tri = triangles(graph)
    deg = graph.degrees()
    return (
        tri.join(deg, "vid", "left")
        .select(
            "vid",
            F.when(
                F.coalesce(F.col("deg"), F.lit(0)) >= 2,
                F.col("tri") * 2.0 / (F.col("deg") * (F.col("deg") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )
