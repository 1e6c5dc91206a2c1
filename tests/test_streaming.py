"""Structured Streaming parity: the streamed windowed aggregation over a
static directory must equal the batch aggregation of the same rows."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from graphscope_spark.streaming import (
    hourly_event_counts,
    read_event_stream,
    run_available_now,
    user_sessions,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (str(r["win"]), r["event_type"] if "event_type" in df.columns else r["user_id"],
         r["n_events"], round(r["sum_value"], 6))
        for r in df.collect()
    )


def _event_dir(tmp_path):
    """File-stream sources need a DIRECTORY of files."""
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_hourly_parity(spark, tmp_path):
    src = _event_dir(tmp_path)
    batch = spark.read.parquet(src)
    stream = read_event_stream(spark, src)
    assert stream.isStreaming

    q = run_available_now(
        hourly_event_counts(stream),
        "hourly_test",
        str(tmp_path / "ck_hourly"),
    )
    got = spark.sql("SELECT * FROM hourly_test")
    want = hourly_event_counts(batch)
    assert _rows(got) == _rows(want)
    q.stop()


def test_streaming_sessions_parity(spark, tmp_path):
    src = _event_dir(tmp_path)
    batch = spark.read.parquet(src)
    stream = read_event_stream(spark, src)
    q = run_available_now(
        user_sessions(stream, gap="10 minutes"),
        "sessions_test",
        str(tmp_path / "ck_sessions"),
    )
    got = spark.sql("SELECT * FROM sessions_test")
    want = user_sessions(batch, gap="10 minutes")
    assert _rows(got) == _rows(want)
    assert got.count() > 0
    q.stop()
