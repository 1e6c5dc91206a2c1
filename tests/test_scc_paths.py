"""SCC vs a pure-Python Kosaraju; shortest_path structural checks."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from graphscope_spark.algorithms.scc import scc
from graphscope_spark.algorithms.traversal import shortest_path, sssp
from tests.conftest import TINY_EDGES, TINY_VERTICES


def _python_scc(edges, vertices):
    fwd, rev = defaultdict(list), defaultdict(list)
    for u, v in edges:
        if u != v:
            fwd[u].append(v)
            rev[v].append(u)
    order, seen = [], set()
    for s in sorted(vertices):
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    break
            else:
                order.append(v)
                stack.pop()
    comp, assigned = {}, set()
    for s in reversed(order):
        if s in assigned:
            continue
        members, stack = [], [s]
        assigned.add(s)
        while stack:
            v = stack.pop()
            members.append(v)
            for w in rev[v]:
                if w not in assigned:
                    assigned.add(w)
                    stack.append(w)
        cid = min(members)
        for v in members:
            comp[v] = cid
    return comp


def test_scc_matches_python(tiny_graph):
    got = {r["vid"]: r["comp"] for r in scc(tiny_graph).collect()}
    want = _python_scc(TINY_EDGES, TINY_VERTICES)
    assert got == want


def test_scc_cycle_graph(spark):
    from graphscope_spark.graph import from_edge_df

    # 4-cycle + a tail: one SCC of 4, singletons for the tail
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6)]
    g = from_edge_df(spark.createDataFrame(edges, "src long, dst long"), 4)
    got = {r["vid"]: r["comp"] for r in scc(g).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6}


def test_scc_random_graphs(spark):
    """Randomized adversary for the doubled-min-label phase: sparse random
    digraphs mix long chains (exercises per-round contraction + LIFO
    fold-back), pure cycles (cycle_comp path), and nested SCC DAGs."""
    import random

    from graphscope_spark.graph import from_edge_df

    rng = random.Random(7)
    for trial in range(4):
        n = 24 + 8 * trial
        edges = set()
        # random sparse edges
        for _ in range(int(1.6 * n)):
            edges.add((rng.randrange(n), rng.randrange(n)))
        # a long directed chain (tendril) and a pure cycle, offset ids
        for i in range(8):
            edges.add((n + i, n + i + 1))
        for i in range(6):
            edges.add((2 * n + i, 2 * n + (i + 1) % 6))
        edges.add((rng.randrange(n), n))  # attach tendril head
        vertices = sorted({u for e in edges for u in e})
        edf = spark.createDataFrame(sorted(edges), "src long, dst long")
        g = from_edge_df(edf, 4)
        got = {r["vid"]: r["comp"] for r in scc(g).collect()}
        want = _python_scc(sorted(edges), vertices)
        assert got == want, f"trial {trial}"


def test_shortest_path_tiny(tiny_graph, spark):
    # unweighted (weight=1): path 1→7 follows 1→2→3→4→5→6→7? verify cost
    # consistency instead of a pinned route: endpoints correct, consecutive
    # pairs are edges, total weight equals sssp dist
    w = F.lit(1.0)
    path = shortest_path(tiny_graph, 1, 7, weight=w)
    rows = sorted((r["step"], r["vid"]) for r in path.collect())
    assert rows[0][1] == 1 and rows[-1][1] == 7
    edge_set = {(a, b) for a, b in TINY_EDGES}
    chain = [v for _, v in rows]
    for a, b in zip(chain[:-1], chain[1:]):
        assert (a, b) in edge_set
    dist = {r["vid"]: r["dist"] for r in sssp(tiny_graph, 1, weight=w).state.collect()}
    assert len(chain) - 1 == dist[7]


def test_shortest_path_unreachable(tiny_graph, spark):
    assert shortest_path(tiny_graph, 1, 10).count() == 0
