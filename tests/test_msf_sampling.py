"""Boruvka MSF vs Python Kruskal; sampling_path determinism/structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark.algorithms.msf import minimum_spanning_forest
from graphscope_spark.algorithms.sampling import sampling_path
from tests.conftest import TINY_EDGES, TINY_VERTICES


def _kruskal(edges, weight):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    und = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    out = []
    for a, b in sorted(und, key=lambda e: (weight(*e), e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((a, b, weight(a, b)))
    return sorted(out)


def test_msf_matches_kruskal(tiny_graph):
    got = sorted((r["a"], r["b"], r["w"]) for r in minimum_spanning_forest(tiny_graph).collect())
    want = _kruskal(TINY_EDGES, lambda a, b: float((a + b) % 10 + 1))
    assert got == want
    # spanning forest size: n - #components (2 components, no isolated)
    assert len(got) == len(TINY_VERTICES) - 2


def test_sampling_path_walks_edges(tiny_graph, spark):
    roots = spark.createDataFrame([(1,), (10,)], "vid long")
    rows = sampling_path(tiny_graph, roots, length=4).collect()
    walks = {}
    for r in rows:
        walks.setdefault(r["root"], {})[r["step"]] = r["vid"]
    edge_set = {(a, b) for a, b in TINY_EDGES if a != b}
    for root, steps in walks.items():
        assert steps[0] == root
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # contiguous steps
        for k in ks[:-1]:
            assert (steps[k], steps[k + 1]) in edge_set
    # deterministic across invocations
    again = sampling_path(tiny_graph, roots, length=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
