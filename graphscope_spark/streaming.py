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


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint: str):
    """Drain everything currently available into an in-memory sink and stop —
    the deterministic test/backfill mode. Returns the finished query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
