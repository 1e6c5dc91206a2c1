"""Louvain one-level local moves: structural + modularity-improvement checks
(no exact oracle — parallel Louvain is deterministic here but not equal to
sequential variants; see module docstring)."""

from __future__ import annotations

from graphscope_spark.algorithms.louvain import louvain, modularity
from graphscope_spark.graph import from_edge_df


def test_louvain_two_cliques(spark):
    # two 4-cliques joined by one bridge edge → two communities
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(5, 9) for b in range(5, 9) if a < b]
    edges = c1 + c2 + [(4, 5)]
    g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"), 4)
    comm = louvain(g)
    got = {r["vid"]: r["comm"] for r in comm.collect()}
    assert len({got[v] for v in (1, 2, 3, 4)}) == 1
    assert len({got[v] for v in (5, 6, 7, 8)}) == 1
    assert got[1] != got[8]


def test_louvain_improves_modularity(tiny_graph):
    comm = louvain(tiny_graph)
    q_final = modularity(tiny_graph, comm)
    singletons = tiny_graph.vertices.selectExpr("vid", "vid AS comm")
    q_init = modularity(tiny_graph, singletons)
    assert q_final > q_init
    assert q_final > 0
