"""Brandes betweenness vs a pure-Python reference implementation."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
from pyspark.sql import functions as F

from graphscope_spark.algorithms.betweenness import betweenness_sampled
from tests.conftest import TINY_EDGES, TINY_VERTICES


def _python_brandes(edges, vertices, roots):
    """Textbook Brandes dependency sums over the undirected simple graph,
    restricted to the given source set (no normalization)."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    bc = dict.fromkeys(vertices, 0.0)
    for s in roots:
        stack, preds = [], defaultdict(list)
        sigma = dict.fromkeys(vertices, 0.0)
        dist = dict.fromkeys(vertices, -1)
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = dict.fromkeys(vertices, 0.0)
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def test_betweenness_all_roots_matches_python(spark, tiny_graph):
    roots = tiny_graph.vertices.select("vid")
    got = {
        r["vid"]: r["bc"] for r in betweenness_sampled(tiny_graph, roots).collect()
    }
    want = _python_brandes(TINY_EDGES, TINY_VERTICES, sorted(TINY_VERTICES))
    assert set(got) == set(want)
    for v in want:
        assert np.isclose(got[v], want[v], atol=1e-9), (v, got[v], want[v])


def test_betweenness_sampled_roots(spark, tiny_graph):
    roots = spark.createDataFrame([(1,), (10,)], "vid long")
    got = {
        r["vid"]: r["bc"] for r in betweenness_sampled(tiny_graph, roots).collect()
    }
    want = _python_brandes(TINY_EDGES, TINY_VERTICES, [1, 10])
    for v in want:
        assert np.isclose(got[v], want[v], atol=1e-9), (v, got[v], want[v])
