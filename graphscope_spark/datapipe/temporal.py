"""Temporal join operators: as-of join, range join, sliding windows.

The reference engine is a batch graph engine with no temporal joins; these
are the standard event-table operators a training-data pipeline needs next
to the `events` stream (sessionization and watermark windows live in
`streaming.py`). Both joins are built so the 100 TB plan never enumerates
a cross product:

* ``asof_join`` — each left row matched to the latest right row with
  ``right_ts <= left_ts`` per key (backward inclusive, the DuckDB/pandas
  ``ASOF JOIN`` contract). Implemented as ONE union + ONE window pass:
  tag both sides, sort within key by (ts, side), and carry the last
  non-null right payload forward. One shuffle on the key, O(n log n/p)
  per partition, no range self-join, no per-row Python.
* ``range_join`` — points joined to interval tables. Small interval sides
  broadcast an inequality join (BroadcastNestedLoop over the broadcast
  dim — the right plan for a dimension table); large interval sides use
  the bucketed strategy: intervals explode into the fixed-width buckets
  they cover, points compute their bucket, and the join is a plain
  equi-join on bucket + residual predicate. Bucket fan-out is
  interval_width/bucket_width per row — bounded, never quadratic.
* ``sliding_counts`` — overlapping hopping windows via the built-in
  ``window()`` generator (each event lands in width/slide windows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.bsp import local_checkpoint


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward-inclusive as-of join: for each left row, the columns of the
    latest right row with ``right[right_ts] <= left[left_ts]`` and equal
    ``on`` keys (nulls when none, or when older than ``tolerance``).

    ``right`` must be unique per (on, right_ts) — pre-aggregate ties
    deterministically upstream (e.g. ``max_by``), exactly as DuckDB's ASOF
    requires for a deterministic answer.
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in set(on) | {right_ts}
        ]
    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
        F.lit(None).cast("long").alias("__rowid"),
    )
    # NULL join keys never match (the DuckDB/pandas ASOF contract):
    # drop null-key right rows from the window input — null-key left rows
    # then fall into a partition with no right rows and get null payloads
    nn = None
    for k in on:
        c = F.col(k).isNotNull()
        nn = c if nn is None else (nn & c)
    if nn is not None:
        r = r.where(nn)
    # tag the left side ONCE and PIN it (eager localCheckpoint): the tagged
    # plan feeds two branches (window input + payload re-attach), and
    # monotonically_increasing_id depends on intra-partition row order,
    # which is NOT stable across independent recomputations of a shuffled
    # input — un-pinned, the rowid join could attach the wrong left
    # payload. Checkpointing makes the ids a single materialized fact
    # (and a lost block fails loudly instead of silently mismatching).
    left_id = local_checkpoint(
        left.withColumn("__rowid", F.monotonically_increasing_id()),
        eager=True,
    )
    l = left_id.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        "__rowid",
    )
    # right rows sort BEFORE left rows at equal ts → backward INCLUSIVE
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r.unionByName(l).withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    )
    matched = u.where(F.col("__side") == 1)
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull()
                & (F.col("__t") - F.col("__m.__ts") <= tolerance),
                F.col("__m"),
            ),
        )
    out = matched.select(
        *on,
        F.col("__t").alias(left_ts),
        F.col("__rowid"),
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    # re-attach the remaining left columns by the rowid (cheap narrow join;
    # avoids dragging wide left payloads through the window sort)
    rest = [c for c in left.columns if c not in set(on) | {left_ts}]
    if rest:
        out = out.join(left_id.select("__rowid", *rest), "__rowid")
    out = out.drop("__rowid")
    # the result lazily references the pinned left snapshot, so its blocks
    # must outlive the result; hand the checkpoint ids to the caller —
    # after consuming the result, bsp.release_truncated(result) frees the
    # snapshot (otherwise it lives for the session, one copy per call)
    out._graft_ck_ids = list(getattr(left_id, "_graft_ck_ids", None) or [])
    return out


def range_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    broadcast_threshold: int = 100_000,
    num_buckets: int = 4096,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``. Interval tables at or below
    ``broadcast_threshold`` rows take the broadcast inequality-join path;
    larger ones take the bucketed equi-join path (fixed-width buckets
    derived from the global interval span, intervals exploded into the
    buckets they cover).

    ``how``: any Spark join type on the broadcast path; the bucketed path
    supports only 'inner' — validated HERE, before any Spark job runs, so
    an unsupported combination cannot burn two jobs on a large interval
    table first (and so the answer does not silently depend on which side
    of ``broadcast_threshold`` the table lands on)."""
    # normalize the same aliases Spark's JoinType parser accepts
    canon = how.lower().replace("_", "")
    allowed = {"inner", "cross", "outer", "full", "fullouter",
               "left", "leftouter", "right", "rightouter",
               "semi", "leftsemi", "anti", "leftanti"}
    if canon not in allowed:
        raise ValueError(f"range_join: unknown join type how={how!r}")
    n_intervals = intervals.count()
    pred = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    if n_intervals <= broadcast_threshold:
        return points.join(F.broadcast(intervals), pred, how)

    if canon != "inner":
        raise NotImplementedError(
            "bucketed range_join supports how='inner'; the broadcast path "
            "covers outer joins for dimension-sized interval tables"
        )
    span = intervals.agg(
        F.min(lo_col).alias("lo"), F.max(hi_col).alias("hi")
    ).collect()[0]
    lo0, hi0 = float(span["lo"]), float(span["hi"])
    width = max((hi0 - lo0) / num_buckets, 1e-12)
    b_lo = F.floor((F.col(lo_col) - F.lit(lo0)) / F.lit(width))
    b_hi = F.floor(
        (F.col(hi_col) - F.lit(lo0)) / F.lit(width)
    )  # hi exclusive, but include its bucket: residual predicate filters
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(b_lo, b_hi))
    )
    pts = points.withColumn(
        "__bucket",
        F.floor((F.col(point_col) - F.lit(lo0)) / F.lit(width)),
    )
    return pts.join(iv, "__bucket").where(pred).drop("__bucket")


def sliding_counts(
    events: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Hopping-window aggregate: (window_start, window_end, *keys, n_events,
    sum_value?) — each event contributes to width/slide overlapping
    windows via the built-in ``window()`` generator (pure codegen; the
    only shuffle is the final groupBy)."""
    keys = keys or []
    w = F.window(F.col(ts_col), width, slide)
    aggs = [F.count("*").alias("n_events")]
    names = ["n_events"]
    if "value" in events.columns:
        aggs.append(F.sum("value").alias("sum_value"))
        names.append("sum_value")
    return (
        events.groupBy(w.alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *names,
        )
    )
