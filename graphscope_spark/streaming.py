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


DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)

_DEDUP_STATE = T.StructType([T.StructField("keeper", T.LongType())])


def streaming_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming EXACT DEDUP: emit each distinct content hash once — on
    first arrival — and silently drop every later duplicate, across
    microbatches. The streaming twin of ``datapipe.exact_dedup``: a crawl
    pipeline dedups continuously as pages land, not in a nightly batch.

    State = one long per distinct hash (the keeper's doc id), keyed and
    sharded by content_hash exactly like a keyed aggregation — at 10^10
    distinct documents the state store is ~80 GB across the cluster, the
    same order as the batch job's shuffle. Within the first microbatch that
    contains a hash, the min doc id wins (deterministic); later batches
    find state set and emit nothing.

    On a BATCH DataFrame it degrades to groupBy(hash).min(id) — the same
    batch/stream parity contract as the other streaming ops."""
    hashed = docs.select(
        F.md5(F.col(text_col).cast("binary")).alias("content_hash"),
        F.col(id_col).cast("long").alias("doc_id"),
    )
    if not docs.isStreaming:
        return hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            return  # hash already emitted in an earlier microbatch — drop
        best = None
        for pdf in pdfs:
            m = int(pdf["doc_id"].min())
            best = m if best is None else min(best, m)
        state.update((best,))
        yield pd.DataFrame({"content_hash": [key[0]], "doc_id": [best]})

    return hashed.groupBy("content_hash").applyInPandasWithState(
        update,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class IncrementalWCC:
    """Incremental weakly-connected-components maintenance: keep a
    (vid, comp) label table current as edge batches arrive, without ever
    recomputing WCC over the full edge history.

    The reference engine recomputes connectivity per run (GAE is batch-only,
    SURVEY §2.4); a continuously-crawled web graph needs the incremental
    formulation. Per batch:

    1. resolve the batch's endpoints to their CURRENT component labels
       (unseen vertices label themselves);
    2. contract the batch to distinct (comp_u, comp_v) edges — the only
       merges a batch can cause are between components it touches, so the
       contracted graph has at most 2·|batch| vertices regardless of how
       large the accumulated graph is;
    3. run pointer-doubling min-label WCC (`wcc_log`, O(log merge-chain)
       rounds) on that tiny contracted graph → an old-comp → new-comp
       remap table;
    4. apply the remap to the full label table with ONE left join (the
       remap side is bounded by the batch, so AQE broadcasts it), and
       append rows for never-seen vertices.

    Step 4's full-table scan is the honest per-batch floor — at 10^10
    vertices it is one broadcast-join pass over a hash-partitioned table,
    the same cost class as any dimension update; everything else scales
    with the BATCH, not the graph. Labels are re-checkpointed per batch
    (`truncate_plan`) so lineage stays flat across thousands of batches.

    Correctness invariant (pinned by tests + the gate row): after any
    sequence of batches, the label table equals batch `wcc` over the union
    of all batches, with the same min-member canonical component ids.
    """

    def __init__(self, num_partitions: int = 32):
        self.num_partitions = num_partitions
        self.labels: DataFrame | None = None  # (vid, comp), checkpointed

    def update(self, new_edges: DataFrame) -> DataFrame:
        """Fold one batch of (src, dst) edges in; returns the new labels."""
        from graphscope_spark.algorithms.wcc import wcc_log
        from graphscope_spark.bsp import release_truncated, truncate_plan
        from graphscope_spark.graph import from_edge_df

        e = new_edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        verts = (
            e.select(F.col("src").alias("vid"))
            .union(e.select(F.col("dst").alias("vid")))
            .distinct()
        )
        if self.labels is None:
            cur = verts.select("vid", F.col("vid").alias("comp"))
        else:
            cur = verts.join(self.labels, "vid", "left").select(
                "vid", F.coalesce("comp", F.col("vid")).alias("comp")
            )
        # contracted batch graph over current component ids
        ce = (
            e.join(cur.withColumnRenamed("vid", "src").withColumnRenamed("comp", "cu"), "src")
            .join(cur.withColumnRenamed("vid", "dst").withColumnRenamed("comp", "cv"), "dst")
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )
        remap = (
            wcc_log(from_edge_df(ce, self.num_partitions))
            .where(F.col("vid") != F.col("comp"))
            .select(F.col("vid").alias("old"), F.col("comp").alias("new"))
        )
        base = (
            self.labels if self.labels is not None
            else verts.limit(0).select("vid", F.col("vid").alias("comp"))
        )
        merged = base.unionByName(
            cur.join(base.select("vid"), "vid", "anti")  # never-seen vertices
        )
        updated = merged.join(
            F.broadcast(remap), merged["comp"] == F.col("old"), "left"
        ).select("vid", F.coalesce("new", "comp").alias("comp"))
        prev = self.labels
        self.labels = truncate_plan(
            updated.repartition(self.num_partitions, F.col("vid"))
        )
        if prev is not None:
            release_truncated(prev)
        return self.labels


class IncrementalPageRank:
    """Incremental PageRank maintenance for a continuously-crawled link
    graph: keep a (vid, rank) table current as edge batches arrive,
    re-solving by WARM-STARTED power iteration instead of from scratch.

    PageRank is a global fixpoint — a new edge can in principle move every
    rank — so unlike WCC there is no batch-local exact update. The standard
    web-scale practice (and what this implements) is: accumulate the edge
    delta, then restart power iteration FROM THE PREVIOUS RANK VECTOR
    (extended with 1/n for new vertices, renormalized). Convergence is to
    the same unique stationary vector from any positive start
    (`algorithms/pagerank.py` ``init_ranks``); when a batch perturbs the
    graph locally, the warm start lands within ``tol`` sooner by
    ≈ log(‖warm − fixpoint‖ / ‖uniform − fixpoint‖) / log(contraction)
    supersteps — an absolute saving that grows with how slowly the graph
    mixes (web graphs are α-limited, ~0.85/round) and shrinks to nothing
    when a batch rewrites the graph wholesale (a warm start from a very
    different graph's solution can even lose to uniform; measured on the
    sf0.01 1/3-slice pathological case). The invariant that is pinned
    (tests + gate row) is CORRECTNESS, not rounds: after any batch
    sequence the ranks equal a cold batch solve of the accumulated graph
    at the same tol (<1e-9 observed at tol=1e-10), and a warm start from
    the exact solution converges in one superstep. Edge history is
    re-checkpointed per batch so lineage stays flat across thousands of
    batches; the accumulated-edge distinct is one hash aggregate over the
    same partitioning the solver reuses.
    """

    def __init__(self, alpha: float = 0.85, num_partitions: int = 32):
        self.alpha = alpha
        self.num_partitions = num_partitions
        self.edges: DataFrame | None = None  # accumulated distinct (src, dst)
        self.ranks: DataFrame | None = None  # (vid, rank), checkpointed
        self.last_supersteps: int = 0

    def update(
        self, new_edges: DataFrame, tol: float = 1e-10, max_rounds: int = 200
    ) -> DataFrame:
        """Fold one batch of (src, dst) edges in; returns the new ranks."""
        from graphscope_spark.algorithms.pagerank import pagerank
        from graphscope_spark.bsp import release_truncated, truncate_plan
        from graphscope_spark.graph import LinkGraph

        e = new_edges.select(
            F.col("src").cast("long"), F.col("dst").cast("long")
        ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        acc = e if self.edges is None else self.edges.unionByName(e)
        prev_e = self.edges
        # distinct + pmod(src) partitioning ONCE here; the LinkGraph is
        # built directly over the maintained table (from_edge_df would
        # re-distinct and re-shuffle the already-canonical checkpoint)
        self.edges = truncate_plan(
            acc.distinct().repartition(
                self.num_partitions, F.pmod(F.col("src"), F.lit(self.num_partitions))
            )
        )
        if prev_e is not None:
            release_truncated(prev_e)
        verts = (
            self.edges.select(F.col("src").alias("vid"))
            .unionByName(self.edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
        g = LinkGraph(
            vertices=verts, edges=self.edges, num_partitions=self.num_partitions
        )
        res = pagerank(
            g,
            alpha=self.alpha,
            tol=tol,
            max_rounds=max_rounds,
            init_ranks=self.ranks,
        )
        prev_r = self.ranks
        self.ranks = truncate_plan(res.state.select("vid", "rank"))
        if prev_r is not None:
            release_truncated(prev_r)
        self.last_supersteps = res.supersteps
        return self.ranks


def incremental_pagerank_stream(
    edge_stream: DataFrame, state: IncrementalPageRank, checkpoint: str
):
    """Streaming surface for :class:`IncrementalPageRank` — same
    foreachBatch maintenance pattern as :func:`incremental_wcc_stream`."""
    return (
        edge_stream.writeStream.foreachBatch(
            lambda batch_df, _id: (state.update(batch_df), None)[1]
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def incremental_wcc_stream(
    edge_stream: DataFrame, state: IncrementalWCC, checkpoint: str
):
    """Streaming surface: fold each arriving microbatch of (src, dst) edges
    into ``state`` via foreachBatch — the maintenance pattern for sinks the
    built-in stateful operators can't express (the label table is a JOINED
    artifact, not a keyed aggregate). `state.labels` holds the live
    components after every batch; parity with batch `wcc` over the union of
    all drained batches is the test contract."""
    return (
        edge_stream.writeStream.foreachBatch(
            lambda batch_df, _id: (state.update(batch_df), None)[1]
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
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


class IncrementalTriangles:
    """Incremental global triangle counting: keep the running triangle
    count of the accumulated undirected simple graph current as edge
    batches arrive, touching only batch-local neighborhoods.

    The reference counts triangles per run (`apps/` triangle kernels,
    batch-only like the rest of GAE); a continuously-crawled link graph
    wants the delta formulation. Per batch, with U = old ∪ batch and the
    batch deduplicated against the accumulated canonical (a < b) edge
    table, every triangle gaining its FIRST batch edge must be counted
    exactly once. Triangles with k ∈ {1,2,3} batch edges appear k times
    among (batch edge, common-U-neighbor) wedges, C(k,2) times among
    batch-edge pairs closed by a U edge, and [k=3] times among pure-batch
    triangles — so

        ΔT = m1 − m2 + m3      (inclusion–exclusion: k − C(k,2) + [k=3] = 1)

    where m1 joins the batch against the accumulated adjacency twice
    (work ∝ Σ_batch deg), m2 pairs batch edges sharing a vertex and
    semi-joins the closing edge against U, and m3 counts triangles inside
    the batch alone. Nothing rescans old∖batch neighborhoods, so per-batch
    cost scales with the batch's wedge count, not the graph. The edge
    table is re-checkpointed per batch (`truncate_plan`) to keep lineage
    flat across thousands of batches.

    Correctness invariant (tests + gate): after any batch sequence,
    ``total`` equals batch ``total_triangles`` over the union of all
    batches.
    """

    def __init__(self, num_partitions: int = 32):
        self.num_partitions = num_partitions
        self.edges: DataFrame | None = None  # canonical (a, b), a < b
        self.total: int = 0

    def update(self, new_edges: DataFrame) -> int:
        """Fold one batch of (src, dst) edges in; returns the new total."""
        from graphscope_spark.bsp import release_truncated, truncate_plan

        canon = (
            new_edges.select(
                F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
                F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
            )
            .where(F.col("a") != F.col("b"))
            .where(F.col("a").isNotNull() & F.col("b").isNotNull())
            .distinct()
        )
        fresh = (
            canon
            if self.edges is None
            else canon.join(self.edges, ["a", "b"], "anti")
        ).persist()
        if fresh.count() == 0:
            fresh.unpersist()
            return self.total
        union = (
            fresh if self.edges is None else self.edges.unionByName(fresh)
        ).persist()
        usym = union.select(
            F.col("a").alias("s"), F.col("b").alias("t")
        ).unionByName(union.select(F.col("b").alias("s"), F.col("a").alias("t")))
        # m1: batch edge (a,b) + common neighbor c in U (wedge close ×2)
        ua = usym.select(F.col("s").alias("a"), F.col("t").alias("c"))
        ub = usym.select(F.col("s").alias("b"), F.col("t").alias("c"))
        m1 = fresh.join(ua, "a").join(ub, ["b", "c"]).count()
        # m2: two batch edges sharing v, (x, y) closed by any U edge
        fsym = fresh.select(
            F.col("a").alias("v"), F.col("b").alias("x")
        ).unionByName(fresh.select(F.col("b").alias("v"), F.col("a").alias("x")))
        pairs = (
            fsym.join(fsym.withColumnRenamed("x", "y"), "v")
            .where(F.col("x") < F.col("y"))
            .select(
                F.col("x").alias("a"), F.col("y").alias("b")
            )
        )
        m2 = pairs.join(union, ["a", "b"], "semi").count()
        # m3: triangles entirely inside the batch (a < b < c canonical walk)
        e1 = fresh
        e2 = fresh.select(F.col("a").alias("b"), F.col("b").alias("c"))
        e3 = fresh.select(F.col("a").alias("a"), F.col("b").alias("c"))
        m3 = e1.join(e2, "b").join(e3, ["a", "c"], "semi").count()
        self.total += m1 - m2 + m3
        prev = self.edges
        self.edges = truncate_plan(
            union.repartition(self.num_partitions, F.col("a"))
        )
        if prev is not None:
            release_truncated(prev)
        union.unpersist()
        fresh.unpersist()
        return self.total


def incremental_triangles_stream(
    edge_stream: DataFrame, state: IncrementalTriangles, checkpoint: str
):
    """Streaming surface twin of ``incremental_wcc_stream``: fold each
    microbatch into the triangle-count state via foreachBatch."""
    return (
        edge_stream.writeStream.foreachBatch(
            lambda batch_df, _id: (state.update(batch_df), None)[1]
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
