"""Path sampling — deterministic pseudo-random walks from seed vertices.

Reference semantics: `apps/sampling_path/sampling_path.h`
(`/root/reference/analytical_engine/apps/sampling_path/`) — sample bounded
paths from start vertices along out-edges.

Spark shape: all walks advance together in one BSP frontier — state is
(root, vid) and a step is one join + one min_by aggregate; the "random"
next hop is the out-neighbor minimizing a portable hash of
(root, step, candidate), which behaves like a uniform choice but is
reproducible bit-for-bit in the DuckDB gate oracle and across cluster
sizes (no RNG state to broadcast). A walk ends early at a sink vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.datapipe.hashing import portable_hash60
from graphscope_spark.graph import LinkGraph


def sampling_path(graph: LinkGraph, roots: DataFrame, length: int = 5) -> DataFrame:
    """(root, step, vid) — one hash-deterministic walk of ≤ ``length`` hops
    per root (step 0 = the root itself)."""
    edges = (
        graph.edges.where(F.col("src") != F.col("dst"))
        .repartition(F.col("src"))
        .persist()
    )
    edges.count()
    state = roots.select(
        F.col("vid").alias("root"), F.lit(0).cast("long").alias("step"), F.col("vid")
    ).transform(truncate_plan)
    out = state
    for k in range(1, length + 1):
        h = portable_hash60(
            F.concat(
                F.col("root").cast("string"),
                F.lit(f":{k}:"),
                F.col("dst").cast("string"),
            )
        )
        nxt = (
            state.join(edges, state["vid"] == edges["src"])
            .select("root", "dst", h.alias("h"))
            .groupBy("root")
            .agg(F.min_by(F.col("dst"), F.struct("h", "dst")).alias("vid"))
            .select("root", F.lit(k).cast("long").alias("step"), "vid")
            .transform(truncate_plan)
        )
        if nxt.count() == 0:
            break
        out = out.unionByName(nxt).transform(truncate_plan)
        state = nxt
    edges.unpersist()
    return out
