"""HyperANF accuracy / determinism vs an exact Python neighborhood-function
oracle on the tiny fixture graph and the generated corpus graph."""

from __future__ import annotations

from graphscope_spark.algorithms.hyperanf import (
    effective_diameter,
    neighborhood_function,
)
from tests.conftest import TINY_EDGES, TINY_VERTICES


def _exact_nf(vertices, edges, t_max):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
    nf = {t: 0 for t in range(t_max + 1)}
    for v in vertices:
        dist = {v: 0}
        frontier = [v]
        t = 0
        while frontier and t < t_max:
            t += 1
            nxt = []
            for u in frontier:
                for x in adj.get(u, ()):
                    if x not in dist:
                        dist[x] = t
                        nxt.append(x)
            frontier = nxt
        for d in dist.values():
            for tt in range(d, t_max + 1):
                nf[tt] += 1
    return nf


def _nf_dict(df):
    return {r["t"]: r["nf"] for r in df.collect()}


def test_hyperanf_tiny_accuracy(tiny_graph):
    got = _nf_dict(neighborhood_function(tiny_graph, t_max=10, rel_tol=0.0))
    want = _exact_nf(TINY_VERTICES, TINY_EDGES, 10)
    for t in want:
        assert t in got
        # m=64 registers: per-vertex std err ~13%, summed NF much tighter;
        # the tiny graph has so few vertices the bound is loose
        assert abs(got[t] - want[t]) / want[t] < 0.35, (t, got[t], want[t])


def test_hyperanf_corpus_accuracy(corpus_graph):
    got = _nf_dict(neighborhood_function(corpus_graph, t_max=8, rel_tol=0.0))
    edges = [
        (r["src"], r["dst"])
        for r in corpus_graph.edges.select("src", "dst").distinct().collect()
    ]
    verts = [r["vid"] for r in corpus_graph.vertices.collect()]
    want = _exact_nf(verts, edges, 8)
    for t in want:
        assert abs(got[t] - want[t]) / want[t] < 0.12, (t, got[t], want[t])


def test_hyperanf_partition_invariance(spark, corpus_graph):
    from graphscope_spark.graph import from_edge_df

    a = _nf_dict(neighborhood_function(corpus_graph, t_max=5, rel_tol=0.0))
    g2 = from_edge_df(corpus_graph.edges, num_partitions=3)
    b = _nf_dict(neighborhood_function(g2, t_max=5, rel_tol=0.0))
    # xxhash64 is deterministic and register-max is associative/commutative:
    # the estimate must be bit-identical across partitionings
    assert a == b


def test_effective_diameter_monotone(tiny_graph):
    d50 = effective_diameter(tiny_graph, q=0.5, t_max=10)
    d90 = effective_diameter(tiny_graph, q=0.9, t_max=10)
    assert 0 <= d50 <= d90 <= 10
