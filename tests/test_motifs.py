"""Motif counts vs brute-force Python enumeration (independent method:
explicit instance enumeration, not the closed-form codegree identities the
engine uses)."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from graphscope_spark.algorithms.motifs import (
    acyclic_triangle_count,
    cycle_plus_triangle_count,
    cyclic_triangle_count,
    diamond_count,
    in_triangle_count,
    out_triangle_count,
    path3_count,
    tailed_triangle_count,
)
from graphscope_spark.graph import from_edge_df
from tests.conftest import TINY_EDGES


def _brute(edges):
    D = {(u, v) for u, v in edges if u != v}
    und = defaultdict(set)
    for u, v in D:
        und[u].add(v)
        und[v].add(u)
    verts = sorted(und)
    tris = [
        (x, y, z)
        for i, x in enumerate(verts)
        for y in (v for v in verts if v > x and v in und[x])
        for z in (v for v in verts if v > y and v in und[x] and v in und[y])
    ]
    # diamonds: unordered pairs of distinct triangles sharing an edge
    diamonds = 0
    for i in range(len(tris)):
        for j in range(i + 1, len(tris)):
            if len(set(tris[i]) & set(tris[j])) == 2:
                diamonds += 1
    # tailed: (triangle, corner, pendant w) instances
    tailed = sum(
        len(und[c] - set(t)) for t in tris for c in t
    )
    # 3-paths: middle edge {u,v}, a in N(u)\{v}, d in N(v)\{u}, a != d
    p3 = 0
    for u in verts:
        for v in und[u]:
            if u < v:
                for a in und[u] - {v}:
                    for d in und[v] - {u}:
                        if a != d:
                            p3 += 1
    cyc = sum(
        1
        for (a, b) in D
        for c in verts
        if (b, c) in D and (c, a) in D and a < b and a < c
    )
    acyc = sum(
        1 for (s, d) in D for x in verts if (s, x) in D and (d, x) in D
    )
    mutual = {(a, b) for (a, b) in D if (b, a) in D and a < b}
    in_t = sum(
        1 for (s, d) in mutual for x in verts if (s, x) in D and (d, x) in D
    )
    out_t = sum(
        1 for (s, d) in mutual for x in verts if (x, s) in D and (x, d) in D
    )
    # cycle-plus: ORDERED mutual pair (s, d) + cycle s->d->x->s
    mut_ord = {(a, b) for (a, b) in D if (b, a) in D}
    cyc_plus = sum(
        1 for (s, d) in mut_ord for x in verts
        if x not in (s, d) and (d, x) in D and (x, s) in D
    )
    return {
        "diamonds": diamonds,
        "tailed": tailed,
        "paths3": p3,
        "cyclic": cyc,
        "acyclic": acyc,
        "in_tri": in_t,
        "out_tri": out_t,
        "cycle_plus": cyc_plus,
    }


def _engine(g):
    return {
        "diamonds": diamond_count(g).collect()[0][0],
        "tailed": tailed_triangle_count(g).collect()[0][0],
        "paths3": path3_count(g).collect()[0][0],
        "cyclic": cyclic_triangle_count(g).collect()[0][0],
        "acyclic": acyclic_triangle_count(g).collect()[0][0],
        "in_tri": in_triangle_count(g).collect()[0][0],
        "out_tri": out_triangle_count(g).collect()[0][0],
        "cycle_plus": cycle_plus_triangle_count(g).collect()[0][0],
    }


def test_motifs_tiny(tiny_graph):
    assert _engine(tiny_graph) == _brute(TINY_EDGES)


@pytest.fixture(scope="module")
def dense_directed(spark):
    rng = random.Random(42)
    n = 40
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < 0.12
    ]
    return edges, from_edge_df(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )


def test_motifs_dense_directed(dense_directed):
    edges, g = dense_directed
    got, exp = _engine(g), _brute(edges)
    assert got == exp


def test_kclique_general(spark, tiny_graph):
    """kclique_count: K6 gives C(6,k); k=3 equals the triangle total;
    k=4 equals the unrolled kclique4 kernel; random-graph brute check."""
    from itertools import combinations
    from math import comb

    from graphscope_spark.algorithms import total_triangles
    from graphscope_spark.algorithms.subgraph import kclique4_count, kclique_count

    k6 = from_edge_df(
        spark.createDataFrame(
            [(u, v) for u in range(6) for v in range(6) if u < v],
            "src long, dst long",
        ),
        num_partitions=4,
    )
    for k in (3, 4, 5, 6):
        got = kclique_count(k6, k).collect()[0][f"cliques{k}"]
        assert got == comb(6, k), (k, got)

    assert (
        kclique_count(tiny_graph, 3).collect()[0]["cliques3"]
        == total_triangles(tiny_graph)
    )
    assert (
        kclique_count(tiny_graph, 4).collect()[0]["cliques4"]
        == kclique4_count(tiny_graph).collect()[0]["cliques4"]
    )

    rng = random.Random(7)
    n = 24
    edges = [(u, v) for u in range(n) for v in range(u + 1, n) if rng.random() < 0.3]
    g = from_edge_df(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    want5 = sum(
        1
        for c in combinations(range(n), 5)
        if all(b in adj[a] for a, b in combinations(c, 2))
    )
    assert kclique_count(g, 5).collect()[0]["cliques5"] == want5


def test_lcc_directed_brute_force(spark):
    """lcc_directed vs direct enumeration of directed edges among in∪out
    neighbourhoods (the LDBC directed-LCC definition) on a random
    directed graph."""
    from graphscope_spark.algorithms.motifs import lcc_directed

    rng = random.Random(11)
    n = 20
    edges = [
        (u, v)
        for u in range(n)
        for v in range(n)
        if u != v and rng.random() < 0.2
    ]
    g = from_edge_df(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )
    D = set(edges)
    nbrs = defaultdict(set)
    for u, v in D:
        nbrs[u].add(v)
        nbrs[v].add(u)
    want = {}
    for v in range(n):
        d = len(nbrs[v])
        if d < 2:
            want[v] = 0.0
        else:
            num = sum(
                1
                for u in nbrs[v]
                for w in nbrs[v]
                if u != w and (u, w) in D
            )
            want[v] = num / (d * (d - 1))
    got = {r["vid"]: r["lcc_directed"] for r in lcc_directed(g).collect()}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
