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


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """streaming_exact_dedup: each content hash is emitted exactly ONCE
    across microbatches (first arrival wins); duplicates in later batches
    are dropped by the per-hash state. Batch mode degrades to
    groupBy(hash).min(id)."""
    from graphscope_spark.streaming import streaming_exact_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    d = tmp_path / "docs_split"
    # batch 0: the even half; batch 1: odd half PLUS a re-emission of the
    # even half under shifted doc ids → every batch-1 duplicate must drop
    docs.where("doc_id % 2 = 0").coalesce(1).write.parquet(str(d / "b0"))
    dup = docs.where("doc_id % 2 = 0").select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    docs.where("doc_id % 2 = 1").unionByName(dup).coalesce(1).write.parquet(str(d / "b1"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*/"))
    )
    q = run_available_now(
        streaming_exact_dedup(stream),
        "dedup_stream_test",
        str(tmp_path / "ck_dedup"),
        mode="update",
    )
    got = spark.sql("SELECT content_hash, doc_id FROM dedup_stream_test").collect()
    # exactly once per distinct hash
    n_distinct = docs.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    assert len(got) == n_distinct
    assert len({r["content_hash"] for r in got}) == n_distinct
    # no re-emitted duplicate (shifted ids) may win a hash that batch 0 saw:
    # every emitted keeper must be an ORIGINAL doc id
    assert all(r["doc_id"] < 1_000_000 for r in got)
    # batch degradation equals the exact_dedup keep-min contract
    b = streaming_exact_dedup(docs)
    assert b.count() == n_distinct
    assert b.agg(F.min("doc_id")).collect()[0][0] == 0
    q.stop()


def test_incremental_wcc_batch_parity(spark):
    """Folding edge batches one at a time must equal batch WCC over the
    union — including cross-batch merges (batch 3 bridges the two islands
    batches 1-2 built) and never-seen vertices."""
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.graph import from_edge_df
    from graphscope_spark.streaming import IncrementalWCC

    batches = [
        [(1, 2), (2, 3), (10, 11)],                # two islands
        [(4, 5), (11, 12), (20, 21)],              # grow + a third island
        [(3, 4), (12, 20), (30, 31), (5, 1)],      # bridge islands + cycle
    ]
    inc = IncrementalWCC(num_partitions=4)
    seen: list[tuple[int, int]] = []
    for b in batches:
        seen += b
        inc.update(spark.createDataFrame(b, "src long, dst long"))
        got = {r["vid"]: r["comp"] for r in inc.labels.collect()}
        g = from_edge_df(spark.createDataFrame(seen, "src long, dst long"), 4)
        want = {r["vid"]: r["comp"] for r in wcc(g).state.collect()}
        assert got == want, f"after batch {b}"


def test_incremental_wcc_stream(spark, tmp_path):
    """The foreachBatch streaming surface drains a directory of edge files
    (one file per microbatch) and leaves labels equal to batch WCC."""
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.graph import from_edge_df
    from graphscope_spark.streaming import IncrementalWCC, incremental_wcc_stream

    d = tmp_path / "edges_in"
    d.mkdir()
    all_edges = []
    files = [
        [(1, 2), (3, 4)],
        [(2, 3), (7, 8)],
        [(8, 1), (9, 9)],
    ]
    for i, b in enumerate(files):
        all_edges += b
        spark.createDataFrame(b, "src long, dst long").coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    inc = IncrementalWCC(num_partitions=4)
    q = incremental_wcc_stream(stream, inc, str(tmp_path / "ck"))
    q.awaitTermination()
    got = {r["vid"]: r["comp"] for r in inc.labels.collect()}
    g = from_edge_df(spark.createDataFrame(all_edges, "src long, dst long"), 4)
    want = {r["vid"]: r["comp"] for r in wcc(g).state.collect()}
    assert got == want


def test_incremental_pagerank_batch_parity(spark):
    """Folding edge batches with warm-started re-solve must land on the
    same fixpoint as a cold batch solve of the accumulated graph; a warm
    start from the exact solution converges in one superstep."""
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.graph import from_edge_df
    from graphscope_spark.streaming import IncrementalPageRank

    batches = [
        [(1, 2), (2, 3), (3, 1), (3, 4)],
        [(4, 5), (5, 1), (6, 1)],
        [(2, 6), (7, 3)],  # new vertex 7 mid-stream
    ]
    inc = IncrementalPageRank(num_partitions=4)
    seen: list[tuple[int, int]] = []
    for b in batches:
        seen += b
        inc.update(spark.createDataFrame(b, "src long, dst long"),
                   tol=1e-12, max_rounds=400)
    g = from_edge_df(spark.createDataFrame(seen, "src long, dst long"), 4)
    cold = pagerank(g, tol=1e-12, max_rounds=400)
    got = {r["vid"]: r["rank"] for r in inc.ranks.collect()}
    want = {r["vid"]: r["rank"] for r in cold.state.collect()}
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in got) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9

    # degenerate warm start: from the solution itself, one superstep
    warm = pagerank(g, tol=1e-12, max_rounds=400,
                    init_ranks=cold.state.select("vid", "rank"))
    assert warm.supersteps == 1


def test_incremental_pagerank_stream(spark, tmp_path):
    """foreachBatch surface: drain a directory of edge files, ranks equal
    the cold solve of the union."""
    from graphscope_spark.algorithms.pagerank import pagerank
    from graphscope_spark.graph import from_edge_df
    from graphscope_spark.streaming import (
        IncrementalPageRank,
        incremental_pagerank_stream,
    )

    d = tmp_path / "pr_edges_in"
    d.mkdir()
    files = [[(1, 2), (2, 3)], [(3, 1), (1, 4)]]
    all_edges = []
    for i, rows in enumerate(files):
        all_edges += rows
        spark.createDataFrame(rows, "src long, dst long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d / f"b{i}"))
    inc = IncrementalPageRank(num_partitions=4)
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "b*"))
    )
    q = incremental_pagerank_stream(stream, inc, str(tmp_path / "ck_ipr"))
    q.awaitTermination()
    cold = pagerank(
        from_edge_df(spark.createDataFrame(all_edges, "src long, dst long"), 4),
        tol=1e-10, max_rounds=400,
    )
    got = {r["vid"]: r["rank"] for r in inc.ranks.collect()}
    want = {r["vid"]: r["rank"] for r in cold.state.collect()}
    assert set(got) == set(want)
    assert max(abs(got[v] - want[v]) for v in got) < 1e-6


def test_incremental_triangles_matches_batch(spark):
    """Replay edges in 3 uneven batches (with dups and reversed repeats);
    after every batch the running total equals batch total_triangles over
    the union so far."""
    from graphscope_spark.algorithms import total_triangles
    from graphscope_spark.graph import from_edge_df
    from graphscope_spark.streaming import IncrementalTriangles

    batches = [
        [(1, 2), (2, 3), (3, 1), (3, 4)],                # one triangle
        [(4, 5), (5, 3), (1, 4), (2, 1)],                # closes 3-4-5, 1-3-4; dup 1-2
        [(5, 6), (6, 7), (7, 7), (10, 11), (11, 12), (12, 10), (4, 1)],
    ]
    inc = IncrementalTriangles(num_partitions=4)
    seen: list = []
    for b in batches:
        seen += b
        total = inc.update(spark.createDataFrame(b, "src long, dst long"))
        g = from_edge_df(spark.createDataFrame(seen, "src long, dst long"), 4)
        assert total == total_triangles(g), seen
    # an all-duplicate batch is a no-op
    assert inc.update(spark.createDataFrame(batches[0], "src long, dst long")) == total
