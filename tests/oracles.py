"""Single-process oracle implementations of the north-star algorithms.

Tiny, obviously-correct transliterations of the reference C++ semantics
(FIXTURES.md F3) used as golden-output generators — the analog of the
reference's checked-in LDBC Graphalytics goldens
(`/root/reference/python/graphscope/tests/conftest.py:732-800`). Pure Python
dicts/sets; no Spark, no pandas — intentionally a different implementation
style from the engine so bugs can't be correlated.
"""

from __future__ import annotations

from collections import Counter, defaultdict


def pagerank_oracle(
    edges: list[tuple[int, int]],
    vertices: set[int],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_rounds: int = 100,
) -> dict[int, float]:
    """`apps/pagerank/pagerank_networkx.h:54-163` semantics."""
    n = len(vertices)
    out_deg = Counter(s for s, _ in edges)
    in_nbrs = defaultdict(list)
    for s, d in edges:
        in_nbrs[d].append(s)
    r = {v: 1.0 / n for v in vertices}
    for _ in range(max_rounds):
        dangling = sum(r[v] for v in vertices if out_deg[v] == 0)
        base = (1.0 - alpha) / n + alpha * dangling / n
        nr = {}
        for v in vertices:
            s = sum(r[u] / out_deg[u] for u in in_nbrs[v])
            nr[v] = base + alpha * s
        delta = sum(abs(nr[v] - r[v]) for v in vertices)
        r = nr
        if delta < n * tol:
            break
    return r


def wcc_oracle(edges: list[tuple[int, int]], vertices: set[int]) -> dict[int, int]:
    """Min-member component id (`apps/projected/wcc_projected.h:62-183`
    fixpoint result), via union-find."""
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        if s == d:
            continue
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comps = defaultdict(list)
    for v in vertices:
        comps[find(v)].append(v)
    out = {}
    for members in comps.values():
        m = min(members)
        for v in members:
            out[v] = m
    return out


def cdlp_oracle(
    edges: list[tuple[int, int]], vertices: set[int], max_rounds: int = 10
) -> dict[int, int]:
    """LDBC CDLP (`apps/flash/clustering/lpa.h:33-81`): synchronous rounds,
    both directions per directed edge, most-frequent label, ties → smallest.
    Self-loops dropped."""
    nbrs = defaultdict(list)
    for s, d in edges:
        if s == d:
            continue
        nbrs[s].append(d)
        nbrs[d].append(s)
    label = {v: v for v in vertices}
    for _ in range(max_rounds):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            freq = Counter(label[u] for u in nbrs[v])
            best = max(freq.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == label:
            break
        label = new
    return label


def triangles_oracle(
    edges: list[tuple[int, int]], vertices: set[int]
) -> dict[int, int]:
    """`apps/clustering/triangles.h:30-159`: undirected simple graph,
    degree-ordered orientation, per-vertex counts."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    adj_plus = defaultdict(set)
    for a, b in und:
        # orient from smaller to larger under (deg, id)
        if (deg[a], a) < (deg[b], b):
            adj_plus[a].add(b)
        else:
            adj_plus[b].add(a)
    tri = Counter({v: 0 for v in vertices})
    for u in list(adj_plus):
        for v in adj_plus[u]:
            for w in adj_plus[u] & adj_plus[v]:
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    return dict(tri)


def pagerank_weighted_oracle(
    edges_w: list[tuple[int, int, float]],
    vertices: set[int],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_rounds: int = 100,
) -> dict[int, float]:
    """Weighted power iteration: contribution r(u)*w(u,v)/Σw(u,·); dangling
    = no out-edges (positive weights). NetworkX pagerank(weight=...)
    semantics, as the reference's nx layer exposes."""
    n = len(vertices)
    wsum = Counter()
    in_nbrs = defaultdict(list)
    for s, d, w in edges_w:
        wsum[s] += w
        in_nbrs[d].append((s, w))
    r = {v: 1.0 / n for v in vertices}
    for _ in range(max_rounds):
        dangling = sum(r[v] for v in vertices if wsum[v] == 0)
        base = (1.0 - alpha) / n + alpha * dangling / n
        nr = {}
        for v in vertices:
            s = sum(r[u] * w / wsum[u] for u, w in in_nbrs[v])
            nr[v] = base + alpha * s
        delta = sum(abs(nr[v] - r[v]) for v in vertices)
        r = nr
        if delta < n * tol:
            break
    return r
