"""min_vertex_cover / color / fluid_community / k_center / densest_subgraph
/ dfs_preorder vs pure-Python mirrors and structural invariants."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

import pytest

from graphscope_spark.algorithms.coloring import color, fluid_community
from graphscope_spark.algorithms.dfs import dfs_preorder
from graphscope_spark.algorithms.kcenter import k_center
from graphscope_spark.algorithms.matching import min_vertex_cover
from graphscope_spark.algorithms.subgraph import densest_subgraph
from graphscope_spark.graph import from_edge_df
from tests.conftest import TINY_EDGES, TINY_VERTICES


def _und(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def rand_graph(spark):
    rng = random.Random(7)
    n = 60
    edges = [
        (u, v) for u in range(n) for v in range(n) if u != v and rng.random() < 0.06
    ]
    return edges, from_edge_df(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )


# -- min_vertex_cover ---------------------------------------------------------

def _py_min_cover(edges, vertices):
    adj = _und(edges)
    n = len(vertices)
    resid = {v: len(adj[v]) for v in adj}
    cover = set()
    nowd = n // 2
    while resid:
        winners = {v for v, d in resid.items() if d >= nowd}
        cover |= winners
        dec = defaultdict(int)
        for w in winners:
            for nb in adj[w]:
                dec[nb] += 1
        resid = {
            v: d - dec[v]
            for v, d in resid.items()
            if v not in winners and d - dec[v] > 0
        }
        nowd //= 2
    while True:
        cand = {v for v in cover if adj[v] <= cover}
        removable = {v for v in cand if not any(u in cand and u > v for u in adj[v])}
        if not removable:
            break
        cover -= removable
    return cover


def _check_cover(edges, cover):
    for u, v in edges:
        if u != v:
            assert u in cover or v in cover, (u, v)


def test_min_vertex_cover_tiny(tiny_graph):
    got = {r["vid"] for r in min_vertex_cover(tiny_graph).collect()}
    _check_cover(TINY_EDGES, got)
    assert got == _py_min_cover(TINY_EDGES, TINY_VERTICES)


def test_min_vertex_cover_rand(rand_graph):
    edges, g = rand_graph
    got = {r["vid"] for r in min_vertex_cover(g).collect()}
    _check_cover(edges, got)
    assert got == _py_min_cover(edges, set(range(60)))


def test_min_vertex_cover_distributed_path_matches_fast_path(rand_graph):
    """max_driver_edges=0 forces the round-parallel distributed prune; its
    fixpoint must equal the driver fast-path's sequential greedy."""
    edges, g = rand_graph
    dist = {r["vid"] for r in min_vertex_cover(g, max_driver_edges=0).collect()}
    fast = {r["vid"] for r in min_vertex_cover(g).collect()}
    assert dist == fast
    _check_cover(edges, dist)


# -- color --------------------------------------------------------------------

def _py_color(edges, vertices):
    adj = _und(edges)
    deg = {v: len(adj.get(v, ())) for v in vertices}
    okey = lambda v: (deg.get(v, 0), v)  # noqa: E731
    c = {v: 0 for v in vertices}
    for _ in range(200):
        nxt = {}
        for v in vertices:
            used = {c[u] for u in adj.get(v, ()) if okey(u) > okey(v)}
            m = 0
            while m in used:
                m += 1
            nxt[v] = m
        if nxt == c:
            break
        c = nxt
    return c


def test_color_tiny(tiny_graph):
    got = {r["vid"]: r["color"] for r in color(tiny_graph).collect()}
    exp = _py_color(TINY_EDGES, TINY_VERTICES)
    assert got == exp
    adj = _und(TINY_EDGES)
    for v, nbs in adj.items():
        for u in nbs:
            assert got[v] != got[u]


def test_color_rand_proper(rand_graph):
    edges, g = rand_graph
    got = {r["vid"]: r["color"] for r in color(g).collect()}
    assert got == _py_color(edges, set(range(60)))
    for u, v in edges:
        if u != v:
            assert got[u] != got[v]


# -- fluid_community ----------------------------------------------------------

def _py_fluid(edges, vertices, k=10, rounds=15):
    adj = _und(edges)
    seeds = sorted(vertices, key=lambda v: (_h60(str(v)), v))[:k]
    lab = {v: (v if v in seeds else None) for v in vertices}
    for _ in range(rounds):
        sizes = defaultdict(int)
        for v in vertices:
            if lab[v] is not None:
                sizes[lab[v]] += 1
        nxt = {}
        changed = 0
        for v in vertices:
            m = defaultdict(int)
            for u in adj.get(v, ()):
                if lab[u] is not None:
                    m[lab[u]] += 1
            if lab[v] is not None:
                m[lab[v]] += 1
            if not m:
                nxt[v] = lab[v]
                continue
            scored = sorted(
                ((cnt / sizes[L], -L) for L, cnt in m.items()), reverse=True
            )
            bs, blab = scored[0][0], -scored[0][1]
            if lab[v] is None or bs > m.get(lab[v], 0) / sizes[lab[v]]:
                nxt[v] = blab
            else:
                nxt[v] = lab[v]
            if nxt[v] != lab[v]:
                changed += 1
        lab = nxt
        if changed == 0:
            break
    return {v: (L if L is not None else -1) for v, L in lab.items()}


def test_fluid_tiny(tiny_graph):
    got = {r["vid"]: r["comm"] for r in fluid_community(tiny_graph, k=3).collect()}
    exp = _py_fluid(TINY_EDGES, TINY_VERTICES, k=3)
    assert got == exp


def test_fluid_rand(rand_graph):
    edges, g = rand_graph
    got = {r["vid"]: r["comm"] for r in fluid_community(g, k=5).collect()}
    exp = _py_fluid(edges, set(range(60)), k=5)
    assert got == exp


# -- k_center -----------------------------------------------------------------

_INF = 1 << 62


def _py_kcenter(edges, vertices, k=3):
    adj = _und(edges)
    deg = {v: len(adj.get(v, ())) for v in vertices}
    dis = {v: _INF for v in vertices}
    center = max(vertices, key=lambda v: (deg.get(v, 0), v))
    from collections import deque

    for _ in range(k):
        if dis[center] > 0:
            dis[center] = 0
        q = deque([center])
        while q:
            v = q.popleft()
            for u in adj.get(v, ()):
                if dis[u] > dis[v] + 1:
                    dis[u] = dis[v] + 1
                    q.append(u)
        center = max(vertices, key=lambda v: (dis[v], v))
    return dis


def test_k_center_tiny(tiny_graph):
    got = {r["vid"]: r["dis"] for r in k_center(tiny_graph, k=3).collect()}
    assert got == _py_kcenter(TINY_EDGES, TINY_VERTICES, k=3)


def test_k_center_rand(rand_graph):
    edges, g = rand_graph
    got = {r["vid"]: r["dis"] for r in k_center(g, k=4).collect()}
    assert got == _py_kcenter(edges, set(range(60)), k=4)


# -- densest_subgraph ---------------------------------------------------------

def _py_coreness(edges, vertices):
    adj = {v: set(nb) for v, nb in _und(edges).items()}
    for v in vertices:
        adj.setdefault(v, set())
    deg = {v: len(adj[v]) for v in adj}
    core = {}
    alive = set(adj)
    k = 0
    while alive:
        k_level = [v for v in alive if deg[v] <= k]
        if not k_level:
            k += 1
            continue
        while k_level:
            v = k_level.pop()
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        k_level.append(u)
            adj[v] = set()
    return core


def test_densest_subgraph_rand(rand_graph):
    edges, g = rand_graph
    row = densest_subgraph(g).collect()[0]
    core = _py_coreness(edges, set(range(60)))
    cmax = max(core.values())
    members = {v for v, c in core.items() if c == cmax}
    adj = _und(edges)
    ne = sum(1 for v in members for u in adj.get(v, ()) if u in members)
    assert row["nv"] == len(members)
    assert row["ne"] == ne
    assert abs(row["density"] - ne / len(members)) < 1e-12


# -- dfs_preorder -------------------------------------------------------------

def _py_dfs(edges, source):
    out = defaultdict(set)
    for u, v in edges:
        if u != v:
            out[u].add(v)
    rank, order = {}, [source]
    rank[source] = 0

    def rec(v):
        for w in sorted(out.get(v, ())):
            if w not in rank:
                rank[w] = len(rank)
                rec(w)

    rec(source)
    return rank


def test_dfs_preorder_tiny(tiny_graph):
    got = {r["vid"]: r["rank"] for r in dfs_preorder(tiny_graph, source=1).collect()}
    assert got == _py_dfs(TINY_EDGES, 1)


def test_dfs_preorder_rand(rand_graph):
    edges, g = rand_graph
    got = {r["vid"]: r["rank"] for r in dfs_preorder(g, source=0).collect()}
    assert got == _py_dfs(edges, 0)


def test_dfs_preorder_guard(tiny_graph):
    with pytest.raises(ValueError):
        dfs_preorder(tiny_graph, source=1, max_vertices=3)
