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


def test_streaming_stateful_running_totals_parity(spark, tmp_path):
    """applyInPandasWithState accumulates per-user state ACROSS microbatches:
    split the events into two files and force one file per trigger, then the
    final per-user running totals must equal the batch groupBy."""
    from graphscope_spark.streaming import running_user_totals

    batch_all = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = tmp_path / "events_split"
    # two microbatches with every user in both → state genuinely carries over
    batch_all.where("event_id % 2 = 0").coalesce(1).write.parquet(str(d / "b0"))
    batch_all.where("event_id % 2 = 1").coalesce(1).write.parquet(str(d / "b1"))
    src = str(d / "*/")

    stream = (
        spark.readStream.schema(batch_all.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_available_now(
        running_user_totals(stream),
        "totals_test",
        str(tmp_path / "ck_totals"),
        mode="update",
    )
    # update-mode memory sink appends one row per (user, batch); the running
    # total is monotone in n_events so the final state is the per-user max
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql(
            "SELECT user_id, n_events, sum_value FROM totals_test t "
            "WHERE n_events = (SELECT max(n_events) FROM totals_test u "
            "                  WHERE u.user_id = t.user_id)"
        ).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in running_user_totals(batch_all).collect()
    }
    assert got == want
    # and the state really spanned >1 microbatch: some user must appear twice
    per_user_rows = spark.sql(
        "SELECT user_id, count(*) c FROM totals_test GROUP BY user_id"
    ).collect()
    assert max(r["c"] for r in per_user_rows) >= 2
    q.stop()
