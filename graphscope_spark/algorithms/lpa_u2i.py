"""LPA-U2I — bipartite weighted label propagation (user ↔ item).

Reference semantics: `gs::LPAU2I`
(`/root/reference/analytical_engine/apps/lpa/lpa_u2i.h:30-246`): users carry
double-valued label vectors; alternating half-steps propagate them through
the weighted bipartite graph —

* u2i: ``item(p) = Σ_{u→i} w(u,i)·user(u,p)``;
* i2u: ``tmp(u,p) = Σ_{u→i} w(u,i)·item(i,p)``; seed labels (exactly 0 or
  1) are FIXED; otherwise
  ``user'(u,p) = (tmp − outdeg(u)·user(u,p)) / (Σ_{i∈N(u)} indeg(i) − outdeg(u))``
  (unchanged when the denominator is 0) — i.e. the in-degree-weighted mean
  of the labels of other users sharing items with u
  (`lpa_u2i.h:216-233`).

Spark shape: label state is the melted relational form (vertex, prop_id,
val) so a P-property label is P rows, and every half-step is one
join + partial-aggregated groupBy — no per-row Python, no vector UDFs, and
hub items cost a partial aggregate, not an array build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan


def lpa_u2i(u_labels: DataFrame, edges: DataFrame, rounds: int = 10) -> DataFrame:
    """``u_labels``: (uid, prop_id, val); ``edges``: (uid, iid, w).
    Returns the converged user labels (uid, prop_id, val); each ``rounds``
    is one full u2i + i2u pair (the reference's two half-steps)."""
    e = edges.select("uid", "iid", F.col("w").cast("double").alias("w")).persist()
    e.count()
    out_deg = e.groupBy("uid").agg(F.count("*").alias("odeg"))
    in_deg = e.groupBy("iid").agg(F.count("*").alias("ideg"))
    # Σ over u's items of item in-degree (edge multiplicity included)
    onids = (
        e.join(in_deg, "iid")
        .groupBy("uid")
        .agg(F.sum("ideg").alias("onids"))
    )
    consts = (
        out_deg.join(onids, "uid", "left")
        .select("uid", "odeg", F.coalesce("onids", F.lit(0)).alias("onids"))
        .persist()
    )
    consts.count()

    state = u_labels.select("uid", "prop_id", F.col("val").cast("double").alias("val"))
    for _ in range(rounds):
        i_val = (
            state.join(e, "uid")
            .groupBy("iid", "prop_id")
            .agg(F.sum(F.col("w") * F.col("val")).alias("ival"))
        )
        tmp = (
            i_val.join(e, "iid")
            .groupBy("uid", "prop_id")
            .agg(F.sum(F.col("w") * F.col("ival")).alias("tmp"))
        )
        seeded = (F.col("val") == 0.0) | (F.col("val") == 1.0)
        state = (
            state.join(tmp, ["uid", "prop_id"], "left")
            .join(consts, "uid", "left")
            .select(
                "uid",
                "prop_id",
                F.when(seeded, F.col("val"))
                .when(
                    F.coalesce(F.col("onids"), F.lit(0)) != F.coalesce(F.col("odeg"), F.lit(0)),
                    (
                        F.coalesce(F.col("tmp"), F.lit(0.0))
                        - F.coalesce(F.col("odeg"), F.lit(0)) * F.col("val")
                    )
                    / (F.col("onids") - F.col("odeg")),
                )
                .otherwise(F.col("val"))
                .alias("val"),
            )
            .transform(truncate_plan)
        )
    e.unpersist()
    consts.unpersist()
    return state
