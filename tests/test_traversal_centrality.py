"""BFS / SSSP / centrality / k-core correctness vs pure-Python oracles on the
tiny fixture graph (FIXTURES.md F2 spirit: exact for integer results,
allclose for floats)."""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import functions as F

from graphscope_spark.algorithms import (
    bfs,
    coreness,
    degree_centrality,
    eigenvector_centrality,
    hits,
    katz,
    kcore,
    sssp,
)

from tests.conftest import TINY_EDGES, TINY_VERTICES


def _adj(edges, directed=True):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
    return adj


def _bfs_oracle(edges, source):
    adj = _adj([(s, d) for s, d in edges if s != d])
    dist = {source: 0}
    frontier = [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def _dijkstra_oracle(edges, source, w):
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, []).append((d, w(s, d)))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, wt in adj.get(u, []):
            nd = du + wt
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _collect(df, k, v):
    return {r[k]: r[v] for r in df.collect()}


def test_bfs_tiny(tiny_graph):
    got = _collect(bfs(tiny_graph, source=1).state, "vid", "dist")
    assert got == _bfs_oracle(TINY_EDGES, 1)


def test_sssp_tiny(tiny_graph):
    wfn = lambda s, d: float((s + d) % 10 + 1)
    got = _collect(sssp(tiny_graph, source=1).state, "vid", "dist")
    want = _dijkstra_oracle(TINY_EDGES, 1, wfn)
    assert set(got) == set(want)
    for v in want:
        assert np.isclose(got[v], want[v]), (v, got[v], want[v])


def test_bfs_fused_rounds_equivalent(tiny_graph):
    """fused_rounds=k must be result-identical to the one-job-per-round
    loop: BFS is monotone, so in-block overshoot past the fixpoint is a
    no-op (empty frontier => no messages)."""
    want = _collect(bfs(tiny_graph, source=1).state, "vid", "dist")
    for k in (3, 8, 100):
        got = _collect(bfs(tiny_graph, source=1, fused_rounds=k).state, "vid", "dist")
        assert got == want, k


def test_sssp_fused_rounds_equivalent(tiny_graph):
    want = _collect(sssp(tiny_graph, source=1).state, "vid", "dist")
    got = _collect(sssp(tiny_graph, source=1, fused_rounds=4).state, "vid", "dist")
    assert set(got) == set(want)
    for v in want:
        assert np.isclose(got[v], want[v]), v


def test_bfs_fused_checkpoint_resume(tiny_graph, tmp_path):
    """Durable checkpoints written by a fused run store TRUE superstep
    numbers, so a resume (even with a different fused_rounds) converges to
    the same result."""
    ck = str(tmp_path / "bfs_ck")
    # force an early stop mid-traversal, then resume with different fusion
    part = bfs(tiny_graph, source=1, max_rounds=1, fused_rounds=1,
               checkpoint_dir=ck, checkpoint_every=1)
    assert not part.converged
    full = bfs(tiny_graph, source=1, fused_rounds=4,
               checkpoint_dir=ck, checkpoint_every=1, resume=True)
    assert full.converged
    got = _collect(full.state, "vid", "dist")
    assert got == _bfs_oracle(TINY_EDGES, 1)


def test_degree_centrality_tiny(tiny_graph):
    got = _collect(degree_centrality(tiny_graph), "vid", "dc")
    # undirected simple-graph degrees, self-loops dropped
    und = {tuple(sorted(e)) for e in TINY_EDGES if e[0] != e[1]}
    deg = {v: 0 for v in TINY_VERTICES}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    n = len(TINY_VERTICES)
    for v in TINY_VERTICES:
        assert np.isclose(got[v], deg[v] / (n - 1))


def test_hits_tiny(tiny_graph):
    df = hits(tiny_graph, rounds=5)
    rows = df.collect()
    hubs = sum(r["hub"] for r in rows)
    auths = sum(r["auth"] for r in rows)
    assert np.isclose(hubs, 1.0, atol=1e-9)
    assert np.isclose(auths, 1.0, atol=1e-9)
    # oracle: numpy power iteration with identical normalization
    vids = sorted(TINY_VERTICES)
    idx = {v: i for i, v in enumerate(vids)}
    A = np.zeros((len(vids), len(vids)))
    for s, d in TINY_EDGES:
        A[idx[s], idx[d]] += 1
    h = np.ones(len(vids))
    a = np.ones(len(vids))
    for _ in range(5):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    got = _collect(df, "vid", "auth")
    for v in vids:
        assert np.isclose(got[v], a[idx[v]], atol=1e-9), v


def test_katz_eigen_shapes(tiny_graph):
    kz = _collect(katz(tiny_graph, rounds=5), "vid", "katz")
    ec = _collect(eigenvector_centrality(tiny_graph, rounds=5), "vid", "ec")
    assert set(kz) == TINY_VERTICES and set(ec) == TINY_VERTICES
    assert np.isclose(sum(v * v for v in kz.values()), 1.0, atol=1e-9)
    assert np.isclose(sum(v * v for v in ec.values()), 1.0, atol=1e-9)
    assert all(v >= 0 for v in kz.values())


def _kcore_oracle(edges, vertices, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    alive = set(vertices)
    while True:
        deg = {v: 0 for v in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {v for v in alive if deg[v] < k}
        if not drop:
            return alive
        alive -= drop


def test_kcore_tiny(tiny_graph):
    for k in (1, 2, 3):
        got = {r["vid"] for r in kcore(tiny_graph, k).collect()}
        assert got == _kcore_oracle(TINY_EDGES, TINY_VERTICES, k), k


def test_k_core_search_tiny(tiny_graph):
    from graphscope_spark.algorithms.kcore import k_core_search

    for k in (1, 2, 3):
        got = k_core_search(tiny_graph, k).collect()[0]["core_size"]
        assert got == len(_kcore_oracle(TINY_EDGES, TINY_VERTICES, k)), k


def test_coreness_tiny(tiny_graph):
    got = _collect(coreness(tiny_graph), "vid", "core")
    for v in TINY_VERTICES:
        want = max(
            (k for k in range(1, 10) if v in _kcore_oracle(TINY_EDGES, TINY_VERTICES, k)),
            default=0,
        )
        assert got[v] == want, v


def test_bfs_tree_tiny(tiny_graph):
    from graphscope_spark.algorithms import (
        bfs_edges,
        bfs_predecessors,
        bfs_successors,
        bfs_tree,
    )

    t = {r["vid"]: (r["dist"], r["parent"]) for r in bfs_tree(tiny_graph, 1).collect()}
    dist = _bfs_oracle(TINY_EDGES, 1)
    # parent(v) = min src over edges with dist(src)+1 == dist(v)
    want_parent = {}
    for v, dv in dist.items():
        preds = [s for s, d in TINY_EDGES if d == v and s != d and dist.get(s) == dv - 1]
        want_parent[v] = min(preds) if preds else None
    assert set(t) == set(dist)
    for v in dist:
        assert t[v] == (dist[v], want_parent[v]), v
    # projections agree with the tree
    te = {(r["src"], r["dst"]) for r in bfs_edges(tiny_graph, 1).collect()}
    assert te == {(p, v) for v, (_, p) in t.items() if p is not None}
    tp = {(r["vid"], r["pred"]) for r in bfs_predecessors(tiny_graph, 1).collect()}
    assert tp == {(v, p) for v, (_, p) in t.items() if p is not None}
    ts = {r["vid"]: r["successors"] for r in bfs_successors(tiny_graph, 1).collect()}
    want_succ = {}
    for v, (_, p) in t.items():
        if p is not None:
            want_succ.setdefault(p, []).append(v)
    assert ts == {k: sorted(v) for k, v in want_succ.items()}


def test_numeric_assortativity_tiny(tiny_graph, spark):
    from graphscope_spark.algorithms import numeric_assortativity

    # numeric attr = vid * 2 + (vid % 3); oracle = numpy Pearson over edges
    attr = {v: v * 2 + (v % 3) for v, in [(r["vid"],) for r in tiny_graph.vertices.collect()]}
    attrs = spark.createDataFrame(
        [(v, float(a)) for v, a in attr.items()], "vid long, attr double"
    )
    got = numeric_assortativity(tiny_graph, attrs)
    xs, ys = zip(*[(attr[s], attr[d]) for s, d in TINY_EDGES])
    want = float(np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1])
    assert abs(got - want) < 1e-9


def test_all_simple_edge_paths_tiny(tiny_graph):
    from graphscope_spark.algorithms import all_simple_edge_paths
    from graphscope_spark.algorithms.paths import all_simple_paths

    vp = {r["path"] for r in all_simple_paths(tiny_graph, 1, 5, 4).collect()}
    ep = {r["epath"] for r in all_simple_edge_paths(tiny_graph, 1, 5, 4).collect()}
    assert ep == {
        "|".join(f"{a}->{b}" for a, b in zip(p.split("->")[:-1], p.split("->")[1:]))
        for p in vp
    }
    assert len(ep) > 0
