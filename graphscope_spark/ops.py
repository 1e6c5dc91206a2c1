"""Session DAG ops — the graph build/transform/query/serialize operators of
the reference's dataflow IR (SURVEY.md §2.1, `proto/types.proto:80-136`,
dispatch `analytical_engine/core/grape_instance.cc:1294-1515`), re-expressed
as DataFrame transformations over a LinkGraph.

| Reference op              | Here                                  |
|---------------------------|---------------------------------------|
| TO_UNDIRECTED / TO_DIRECTED (`grape_instance.cc:1389,1400`) | ``to_undirected`` / ``to_directed`` |
| INDUCE_SUBGRAPH (`dag_utils.create_subgraph:709`)           | ``induce_subgraph``  |
| PROJECT_TO_SIMPLE (`dag_utils:514`)                         | ``project_to_simple`` |
| ADD_COLUMN (`dag_utils:973`)                                | ``add_column``       |
| REPORT_GRAPH (`core/utils/fragment_reporter.h:69-399`)      | ``report_graph`` + point lookups |
| SERIALIZE/DESERIALIZE_GRAPH (`dag_utils:1115,1145`)         | ``serialize_graph`` / ``deserialize_graph`` |
| CONSOLIDATE_COLUMNS (`dag_utils:232`)                       | ``consolidate_columns`` |
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


def to_undirected(graph: LinkGraph) -> LinkGraph:
    """Symmetrized view: each edge present in both directions (self-loops
    preserved once)."""
    e = graph.edges.select("src", "dst")
    sym = e.union(
        e.where(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    ).distinct()
    return LinkGraph(graph.vertices, sym, graph.num_partitions)


def to_directed(graph: LinkGraph) -> LinkGraph:
    """Identity on an already-directed edge table (reference semantics: a
    view flip; kept for API parity)."""
    return LinkGraph(graph.vertices, graph.edges, graph.num_partitions)


def induce_subgraph(graph: LinkGraph, keep_vertices: DataFrame) -> LinkGraph:
    """Vertex-induced subgraph: semi-join both endpoints against
    ``keep_vertices(vid)``."""
    kv = keep_vertices.select("vid").distinct()
    verts = graph.vertices.join(kv, "vid", "semi")
    edges = (
        graph.edges.join(kv.withColumnRenamed("vid", "src"), "src", "semi")
        .join(kv.withColumnRenamed("vid", "dst"), "dst", "semi")
        .select("src", "dst")
    )
    return LinkGraph(verts, edges, graph.num_partitions)


def project_to_simple(graph: LinkGraph) -> LinkGraph:
    """≤1 vprop / ≤1 eprop simple view — our edges are already simple;
    dedup + column-prune for parity."""
    return LinkGraph(
        graph.vertices.select("vid", *[c for c in graph.vertices.columns if c == "url"]),
        graph.edges.select("src", "dst").distinct(),
        graph.num_partitions,
    )


def add_column(graph: LinkGraph, result: DataFrame, name: str | None = None) -> LinkGraph:
    """Join an algorithm result (vid, value) back as a vertex property —
    the reference's context→graph feedback edge."""
    cols = [c for c in result.columns if c != "vid"]
    if name and len(cols) == 1:
        result = result.withColumnRenamed(cols[0], name)
    verts = graph.vertices.join(result, "vid", "left")
    return LinkGraph(verts, graph.edges, graph.num_partitions)


def consolidate_columns(
    graph: LinkGraph, columns: list[str], into: str
) -> LinkGraph:
    """Merge vertex property columns into one array column."""
    verts = graph.vertices.withColumn(into, F.array(*[F.col(c) for c in columns]))
    return LinkGraph(verts, graph.edges, graph.num_partitions)


# -- REPORT_GRAPH (scalar queries) ---------------------------------------------


def report_graph(graph: LinkGraph) -> dict:
    """The REPORT_GRAPH scalar bundle: NODE_NUM, EDGE_NUM, SELFLOOPS_NUM
    (`proto/types.proto:282-300`)."""
    e = graph.edges.persist()
    out = {
        "node_num": graph.vertices.count(),
        "edge_num": e.count(),
        "selfloops_num": e.where(F.col("src") == F.col("dst")).count(),
    }
    e.unpersist()
    return out


def has_node(graph: LinkGraph, vid: int) -> bool:
    return graph.vertices.where(F.col("vid") == vid).limit(1).count() > 0


def has_edge(graph: LinkGraph, src: int, dst: int) -> bool:
    return (
        graph.edges.where((F.col("src") == src) & (F.col("dst") == dst))
        .limit(1)
        .count()
        > 0
    )


def successors(graph: LinkGraph, vid: int) -> list[int]:
    return [r["dst"] for r in graph.edges.where(F.col("src") == vid).select("dst").collect()]


def predecessors(graph: LinkGraph, vid: int) -> list[int]:
    return [r["src"] for r in graph.edges.where(F.col("dst") == vid).select("src").collect()]


# -- SERIALIZE / DESERIALIZE -----------------------------------------------------


def serialize_graph(graph: LinkGraph, path: str) -> None:
    """Parquet snapshot (vertices/ edges/ + MANIFEST.json) — the reference's
    graph serialization (`dag_utils.py:1115`), and the durable basis for
    resumable pipelines."""
    graph.vertices.write.mode("overwrite").parquet(os.path.join(path, "vertices"))
    graph.edges.write.mode("overwrite").parquet(os.path.join(path, "edges"))
    manifest = {
        "num_partitions": graph.num_partitions,
        "vertex_schema": graph.vertices.schema.json(),
        "edge_schema": graph.edges.schema.json(),
        "ts": time.time(),
    }
    tmp = os.path.join(path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "MANIFEST.json"))


def deserialize_graph(spark: SparkSession, path: str) -> LinkGraph:
    with open(os.path.join(path, "MANIFEST.json")) as f:
        manifest = json.load(f)
    return LinkGraph(
        vertices=spark.read.parquet(os.path.join(path, "vertices")),
        edges=spark.read.parquet(os.path.join(path, "edges")),
        num_partitions=manifest["num_partitions"],
    )


def archive_bucketed(graph: LinkGraph, table_prefix: str, buckets: int | None = None) -> None:
    """Persist the graph as BUCKETED tables — edges bucketed+sorted by src,
    vertices by vid — so every later src-keyed aggregate (out-degrees,
    frontier expansion) and vid-keyed join reads pre-partitioned data and
    runs with NO Exchange (pinned by ``tests/test_ops.py``). This is the
    co-located-join storage layout the reference gets from vineyard's
    hash-partitioned fragments (`analytical_engine/core/fragment/…`): at
    100 TB, paying the partition shuffle ONCE at ingest and never again is
    the difference between one scan and a full-corpus shuffle per query.

    ``bucketBy`` requires ``saveAsTable``; bucket metadata lives in the
    session catalog (persist it with a real metastore — HMS/Glue — in
    production; the in-memory catalog scopes it to this SparkSession).
    """
    b = int(buckets or graph.num_partitions)
    (
        graph.edges.write.mode("overwrite")
        .bucketBy(b, "src")
        .sortBy("src", "dst")
        .saveAsTable(f"{table_prefix}_edges")
    )
    (
        graph.vertices.write.mode("overwrite")
        .bucketBy(b, "vid")
        .sortBy("vid")
        .saveAsTable(f"{table_prefix}_vertices")
    )


def load_bucketed(spark: SparkSession, table_prefix: str) -> LinkGraph:
    """Reload a graph archived by :func:`archive_bucketed`. The returned
    frames carry bucket-aware output partitioning: ``edges.groupBy("src")``
    and vid-keyed vertex joins plan without an Exchange."""
    edges = spark.table(f"{table_prefix}_edges")
    verts = spark.table(f"{table_prefix}_vertices")
    n = spark.sql(f"DESCRIBE TABLE EXTENDED {table_prefix}_edges").where(
        F.col("col_name") == "Num Buckets"
    ).collect()
    buckets = int(n[0]["data_type"]) if n else verts.rdd.getNumPartitions()
    return LinkGraph(vertices=verts, edges=edges, num_partitions=buckets)
