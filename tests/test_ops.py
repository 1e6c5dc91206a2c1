"""Session DAG ops (graphscope_spark.ops): views, subgraphs, report
scalars, add_column feedback, serialize/deserialize round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark import ops
from graphscope_spark.algorithms import degree_centrality

from tests.conftest import TINY_EDGES, TINY_VERTICES


def _edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_to_undirected(tiny_graph):
    und = ops.to_undirected(tiny_graph)
    es = _edge_set(und.edges)
    assert (2, 1) in es and (1, 2) in es
    assert (7, 7) in es  # self-loop preserved once
    # symmetric
    assert all((b, a) in es for a, b in es if a != b)


def test_induce_subgraph(spark, tiny_graph):
    keep = spark.createDataFrame([(1,), (2,), (3,), (8,)], "vid long")
    sub = ops.induce_subgraph(tiny_graph, keep)
    assert {r["vid"] for r in sub.vertices.collect()} == {1, 2, 3, 8}
    assert _edge_set(sub.edges) == {(1, 2), (2, 3), (3, 1), (2, 8)}


def test_report_graph_and_lookups(tiny_graph):
    rep = ops.report_graph(tiny_graph)
    assert rep["node_num"] == len(TINY_VERTICES)
    assert rep["edge_num"] == len(set(TINY_EDGES))
    assert rep["selfloops_num"] == 1  # (7,7)
    assert ops.has_node(tiny_graph, 7) and not ops.has_node(tiny_graph, 999)
    assert ops.has_edge(tiny_graph, 1, 2) and not ops.has_edge(tiny_graph, 2, 1)
    assert set(ops.successors(tiny_graph, 1)) == {2, 4}
    assert set(ops.predecessors(tiny_graph, 3)) == {2, 5}


def test_add_column(tiny_graph):
    dc = degree_centrality(tiny_graph)
    g2 = ops.add_column(tiny_graph, dc, name="dc")
    assert "dc" in g2.vertices.columns
    assert g2.vertices.where(F.col("dc").isNull()).count() == 0


def test_serialize_roundtrip(spark, tiny_graph, tmp_path):
    path = str(tmp_path / "snap")
    ops.serialize_graph(tiny_graph, path)
    g2 = ops.deserialize_graph(spark, path)
    assert _edge_set(g2.edges) == _edge_set(tiny_graph.edges)
    assert g2.vertices.count() == tiny_graph.vertices.count()
    assert g2.num_partitions == tiny_graph.num_partitions


def test_consolidate_columns(tiny_graph):
    dc = degree_centrality(tiny_graph)
    g2 = ops.add_column(tiny_graph, dc, name="dc")
    g3 = ops.add_column(g2, dc.withColumnRenamed("dc", "dc2"))
    g4 = ops.consolidate_columns(g3, ["dc", "dc2"], into="props")
    row = g4.vertices.select("props").first()
    assert len(row["props"]) == 2


def test_bucketed_archive_colocated_plans(spark, tiny_graph):
    """Bucketed persistence: round-trip equality, then the two co-location
    contracts — a src-keyed aggregate plans with NO Exchange, and an
    edges⋈vertices SortMergeJoin reads both bucketed scans shuffle-free."""
    try:
        ops.archive_bucketed(tiny_graph, "t_bucket", buckets=4)
        g2 = ops.load_bucketed(spark, "t_bucket")
        assert _edge_set(g2.edges) == _edge_set(tiny_graph.edges)
        assert g2.num_partitions == 4

        deg_plan = (
            g2.edges.groupBy("src").count()._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in deg_plan
        assert "Bucketed: true" in deg_plan

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = g2.edges.join(g2.vertices.withColumnRenamed("vid", "src"), "src")
            jplan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in jplan
            assert "SortMergeJoin" in jplan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_edges")
        spark.sql("DROP TABLE IF EXISTS t_bucket_vertices")
