"""k-truss / truss decomposition vs a pure-Python support-peel oracle on
small random graphs plus the hand fixtures the reference's nx test_core
uses for shape intuition (test_core.py:175-190)."""

from __future__ import annotations

import random
from collections import defaultdict

from graphscope_spark.algorithms.ktruss import k_truss, truss_decomposition
from graphscope_spark.graph import from_edge_df


def _py_support(edges):
    """edges: set of canonical (a,b) a<b. Returns {edge: support}."""
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return {(a, b): len(adj[a] & adj[b]) for a, b in edges}


def _py_k_truss(edges, k):
    cur = set(edges)
    thresh = k - 2
    while True:
        sup = _py_support(cur)
        drop = {e for e, s in sup.items() if s < thresh}
        if not drop:
            return cur
        cur -= drop


def _py_truss_decomposition(edges):
    cur = set(edges)
    out = {}
    k = 3
    while cur:
        nxt = _py_k_truss(cur, k)
        for e in cur - nxt:
            out[e] = k - 1
        cur = nxt
        k += 1
    return out


def _rand_canonical(rng, n, m):
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    return sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})


def _graphs(spark):
    rng = random.Random(7771)
    for trial in range(3):
        n = 24 + 8 * trial
        # dense enough for triangles to stack (truss up to ~5)
        edges = _rand_canonical(rng, n, int(3.5 * n))
        edf = spark.createDataFrame(edges, "src long, dst long")
        g = from_edge_df(edf, 4)
        yield g, edges


def test_k_truss_matches_oracle(spark):
    for g, edges in _graphs(spark):
        for k in (3, 4):
            got = {
                (r["a"], r["b"]) for r in k_truss(g, k).collect()
            }
            assert got == _py_k_truss(edges, k), f"k={k}"


def test_k_truss_k2_is_whole_simple_graph(spark):
    g, edges = next(_graphs(spark))
    got = {(r["a"], r["b"]) for r in k_truss(g, 2).collect()}
    assert got == set(edges)


def test_truss_decomposition_matches_oracle(spark):
    for g, edges in _graphs(spark):
        got = {
            (r["a"], r["b"]): r["truss"]
            for r in truss_decomposition(g).collect()
        }
        assert got == _py_truss_decomposition(set(edges))


def test_truss_decomposition_triangle_plus_tail(spark):
    # K4 with a pendant edge: K4 edges have truss 4, the pendant truss 2
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    g = from_edge_df(edf, 2)
    got = {
        (r["a"], r["b"]): r["truss"] for r in truss_decomposition(g).collect()
    }
    assert got == {
        (0, 1): 4,
        (0, 2): 4,
        (0, 3): 4,
        (1, 2): 4,
        (1, 3): 4,
        (2, 3): 4,
        (3, 4): 2,
    }
