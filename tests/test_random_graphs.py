"""Randomized cross-checks: core kernels vs pure-Python oracles on small
random graphs (the scc kernel already has one in test_scc_paths.py — this
extends the adversary to wcc/wcc_log/triangles/kcore/pregel). Seeds fixed:
deterministic, but shapes none of the hand fixtures cover (self-loop-free
sparse digraphs with isolated vertices and multi-edges collapsed)."""

from __future__ import annotations

import random
from collections import defaultdict

from graphscope_spark.graph import from_edge_df


def _rand_graph(rng, n, m):
    edges = {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
    edges = {(a, b) for a, b in edges if a != b}
    verts = set(range(n))  # keep isolated vertices in the vertex set
    return sorted(edges), sorted(verts)


def _und(edges):
    return {(a, b) for a, b in edges} | {(b, a) for a, b in edges}


def _py_wcc(edges, verts):
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member id per component
    comp = defaultdict(list)
    for v in verts:
        comp[find(v)].append(v)
    return {v: min(ms) for ms in comp.values() for v in ms}


def _py_triangles(edges, verts):
    adj = defaultdict(set)
    for a, b in _und(edges):
        adj[a].add(b)
    count = 0
    for a, b in _und(edges):
        if a < b:
            count += len(adj[a] & adj[b])
    return count // 3  # each triangle counted once per its three a<b edges


def _py_kcore(edges, verts, k):
    adj = defaultdict(set)
    for a, b in _und(edges):
        adj[a].add(b)
    alive = set(verts)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            return alive
        alive -= drop


def _graphs(spark):
    rng = random.Random(1234)
    for trial in range(3):
        n = 30 + 10 * trial
        edges, verts = _rand_graph(rng, n, int(2.2 * n))
        edf = spark.createDataFrame(edges, "src long, dst long")
        vdf = spark.createDataFrame([(v,) for v in verts], "vid long")
        g = from_edge_df(edf, 4)
        g.vertices = vdf  # keep isolated vertices
        yield g, edges, verts


def test_wcc_and_log_and_pregel_random(spark):
    from graphscope_spark.algorithms import wcc
    from graphscope_spark.algorithms.wcc import wcc_log
    from graphscope_spark.pregel import min_label_program, run_pregel

    for g, edges, verts in _graphs(spark):
        want = _py_wcc(edges, verts)
        got = {r["vid"]: r["comp"] for r in wcc(g).state.collect()}
        assert got == want
        got_log = {r["vid"]: r["comp"] for r in wcc_log(g).collect()}
        assert got_log == want
        got_p = {r["vid"]: r["value"] for r in run_pregel(g, min_label_program()).state.collect()}
        assert got_p == want


def test_triangles_random(spark):
    from graphscope_spark.algorithms import total_triangles

    for g, edges, verts in _graphs(spark):
        assert total_triangles(g) == _py_triangles(edges, verts)


def test_kcore_random(spark):
    from graphscope_spark.algorithms.kcore import kcore

    for g, edges, verts in _graphs(spark):
        got = {r["vid"] for r in kcore(g, k=2).collect()}
        assert got == _py_kcore(edges, verts, 2)


def test_cdlp_and_pagerank_random(spark):
    """North-star kernels vs the FIXTURES.md oracles on random digraphs."""
    from graphscope_spark.algorithms import cdlp, pagerank
    from tests.oracles import cdlp_oracle, pagerank_oracle

    for g, edges, verts in _graphs(spark):
        want_l = cdlp_oracle(edges, set(verts), max_rounds=10)
        got_l = {r["vid"]: r["label"] for r in cdlp(g, max_rounds=10).state.collect()}
        assert got_l == want_l
        want_r = pagerank_oracle(edges, set(verts), alpha=0.85, tol=1e-10)
        got_r = {r["vid"]: r["rank"] for r in pagerank(g, tol=1e-10).state.collect()}
        assert set(got_r) == set(want_r)
        assert max(abs(got_r[v] - want_r[v]) for v in want_r) < 1e-8


def test_mega_hub_skew(spark):
    """A 5000-degree hub exercises the salted two-phase adjacency build and
    the skew-aware message aggregation: results must match the oracle."""
    from graphscope_spark.algorithms import pagerank, wcc
    from tests.oracles import pagerank_oracle

    edges = [(0, v) for v in range(1, 5001)] + [(v, 0) for v in range(1, 5001, 7)]
    edges += [(5000 + i, 5001 + i) for i in range(199)]  # a chain component
    verts = sorted({u for e in edges for u in e})
    edf = spark.createDataFrame(edges, "src long, dst long")
    g = from_edge_df(edf, 8)
    got_w = {r["vid"]: r["comp"] for r in wcc(g).state.collect()}
    assert got_w == _py_wcc(edges, verts)
    want_r = pagerank_oracle(edges, set(verts), alpha=0.85, tol=1e-10)
    got_r = {r["vid"]: r["rank"] for r in pagerank(g, tol=1e-10).state.collect()}
    assert max(abs(got_r[v] - want_r[v]) for v in want_r) < 1e-8


def test_multi_source_bfs_random(spark):
    """Fused-block multi-source BFS vs a driver-side BFS oracle, with a
    fused_rounds sweep (1 = the unfused round-per-job shape, 8 = default,
    64 > depth — whole BFS in very few blocks) to pin block-fusion
    equivalence."""
    from collections import deque

    from graphscope_spark.algorithms import multi_source_bfs

    for g, edges, verts in _graphs(spark):
        adj = defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
        want = {}
        roots = verts[::3]
        for r in roots:
            dist = {r: 0}
            q = deque([r])
            while q:
                u = q.popleft()
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        q.append(w)
            for v, d in dist.items():
                want[(r, v)] = d
        rdf = spark.createDataFrame([(v,) for v in roots], "vid long")
        for k in (1, 8, 64):
            got = {
                (r["root"], r["vid"]): r["dist"]
                for r in multi_source_bfs(g, rdf, fused_rounds=k).collect()
            }
            assert got == want, f"fused_rounds={k}"
