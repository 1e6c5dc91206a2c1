"""Structured Streaming operators over the events stream.

The reference's GAE is batch-only (SURVEY.md §2.4 — no watermarks, no
windows); streaming enters this engine as the ingestion side of a web-scale
pipeline: event tables land continuously and the same aggregations the batch
engine runs must hold incrementally. Built on Structured Streaming
(`readStream` → windowed agg with watermark → `writeStream`), so at scale
the planner handles state-store partitioning; no custom receivers.

Batch/stream parity is the test contract: running the streaming query with
an ``availableNow`` trigger over a static directory must equal the batch
aggregation of the same files (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """File-source event stream (parquet dir). ``maxFilesPerTrigger`` bounds
    per-microbatch work — the backpressure knob at scale."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts + value sums per event_type, late data beyond
    the watermark dropped. Works on both stream and batch DataFrames (the
    parity property the tests pin)."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def user_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based): (user_id, session win, n_events,
    sum_value). The stateful-op path — Spark's session_window handles state
    merge; at scale state lives in the HDFS-backed state store partitioned
    by user_id."""
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return e.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))


USER_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_USER_TOTALS_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom STATEFUL operator: per-user running event count + value sum,
    re-emitted after every microbatch that touches the user.

    This is the ``applyInPandasWithState`` path — arbitrary Python state per
    key, Arrow-batched, state kept in Spark's per-partition state store
    (keyed by user_id, so a 10^9-user stream shards the state across
    executors exactly like any keyed aggregation). Built-in windowed aggs
    (``hourly_event_counts``/``user_sessions``) cover the declarative cases;
    this operator is the template for semantics they can't express
    (cross-window running totals, custom eviction, model state).

    On a BATCH DataFrame it degrades to the equivalent groupBy — the
    batch/stream parity contract tested in tests/test_streaming.py."""
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_USER_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, checkpoint: str, mode: str = "complete"
):
    """Drain everything currently available into an in-memory sink and stop —
    the deterministic test/backfill mode. Returns the finished query.
    ``mode='update'`` for stateful operators that emit per-batch updates
    (``running_user_totals``)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
