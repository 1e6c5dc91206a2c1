"""Distributed Lloyd k-means over embedding columns — the deterministic,
oracle-exact clustering contract.

Two k-means live in this engine, on purpose:

* ``similarity.ivf_assignments`` — the PERFORMANCE path: spherical k-means
  trained on a hash-ordered driver sample, broadcast-centroid GEMM
  assignment. That is the right 100 TB shape for ANN/SemDeDup, but its
  trainer sees a sample, and its float32 GEMM is not bit-mirrorable in SQL.
* this module — the CONTRACT path: textbook Lloyd iterations computed
  ENTIRELY in the data plane with double-precision codegen arithmetic
  (explode → broadcast centroid join → per-point argmin → per-cluster
  means), deterministic by construction (first-k init, ties to the lowest
  cluster id, empty clusters keep their centroid), so a DuckDB oracle can
  replay every round exactly. Use it when reproducibility across engines /
  cluster sizes matters more than constant factors (labeling corpora,
  building evaluation partitions).

Scale shape: state per round is the (n·dim) long-form point table joined
against a BROADCAST (k·dim) centroid table — one shuffle per round for the
per-(point, cluster) distance aggregation, one for the centroid means. Work
is O(n·dim·k) per round, Lloyd's inherent cost; nothing ever collects the
points. The long form keeps everything inside whole-stage codegen — no
UDFs, no Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist) — Lloyd k-means assignments after ``rounds``
    (assign, update) iterations plus a final assignment against the last
    centroids; ``dist`` is the squared euclidean distance to the assigned
    centroid. Init = the ``k`` smallest ids AMONG ROWS WITH A NON-EMPTY
    VECTOR: rows whose embedding is NULL or empty produce no exploded
    dimensions, are never eligible as centroids, and are absent from the
    output assignments (posexplode emits nothing for them) — matching the
    SQL-oracle semantics exactly."""
    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1, got {k}, {rounds}")
    x = (
        emb.select(
            F.col(id_col).cast("long").alias("id"),
            F.posexplode(F.col(vec_col)).alias("i0", "xv"),
        )
        .select(
            "id",
            (F.col("i0") + 1).cast("long").alias("i"),
            F.col("xv").cast("double").alias("xv"),
        )
        .persist()
    )
    x.count()
    # init from the EXPLODED table (not emb): NULL/empty-vector rows have
    # no dimensions and must not become degenerate centroids
    ids = [r["id"] for r in x.select("id").distinct().orderBy("id").limit(k).collect()]
    init = (
        x.join(
            x.sparkSession.createDataFrame([(v, c) for c, v in enumerate(ids)], "id long, c long"),
            "id",
        )
        .select("c", "i", F.col("xv").alias("cv"))
    )
    cent = truncate_plan(init)

    def assign(c: DataFrame) -> DataFrame:
        d = (
            x.join(F.broadcast(c), "i")
            .groupBy("id", "c")
            .agg(F.sum(F.pow(F.col("xv") - F.col("cv"), 2)).alias("d"))
        )
        return d.groupBy("id").agg(
            F.min_by(F.col("c"), F.struct("d", "c")).alias("cluster"),
            F.min(F.struct("d", "c")).getField("d").alias("dist"),
        )

    for _ in range(rounds):
        a = assign(cent)
        upd = (
            a.join(x, "id")
            .groupBy(F.col("cluster").alias("c"), "i")
            .agg(F.avg("xv").alias("cv"))
        )
        # empty clusters keep their previous centroid
        kept = cent.join(
            upd.select("c").distinct(), "c", "anti"
        )
        cent = truncate_plan(upd.unionByName(kept))
    out = truncate_plan(assign(cent).select("id", "cluster", "dist"))
    x.unpersist()
    return out
