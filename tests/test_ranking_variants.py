"""ArticleRank / personalized PageRank / lpa_u2i vs pure-Python recurrences."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms.centrality import articlerank, personalized_pagerank
from graphscope_spark.algorithms.lpa_u2i import lpa_u2i
from tests.conftest import TINY_EDGES, TINY_VERTICES


def test_articlerank_matches_python(tiny_graph):
    d = 0.85
    out = defaultdict(list)
    for u, v in set(TINY_EDGES):
        out[u].append(v)
    n = len(TINY_VERTICES)
    deg = {v: len(out[v]) for v in TINY_VERTICES}
    avg = sum(deg.values()) / n
    val = dict.fromkeys(TINY_VERTICES, 0.0)
    for _ in range(10):
        nxt = dict.fromkeys(TINY_VERTICES, 0.0)
        for u in TINY_VERTICES:
            for v in out[u]:
                nxt[v] += d * val[u] / (deg[u] + avg)
        val = {v: nxt[v] + (1 - d) for v in TINY_VERTICES}
    got = {r["vid"]: r["ar"] for r in articlerank(tiny_graph, d, rounds=10).collect()}
    for v in TINY_VERTICES:
        assert np.isclose(got[v], val[v], atol=1e-9), (v, got[v], val[v])


def test_ppr_matches_python(tiny_graph):
    adj = defaultdict(set)
    for u, v in TINY_EDGES:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    src = 1
    val = {v: (1.0 if v == src else 0.0) for v in TINY_VERTICES}
    for _ in range(10):
        nxt = dict.fromkeys(TINY_VERTICES, 0.0)
        for u in TINY_VERTICES:
            for v in adj[u]:
                nxt[v] += 0.5 * val[u] / len(adj[u])
        nxt[src] += 0.5
        val = nxt
    got = {
        r["vid"]: r["ppr"]
        for r in personalized_pagerank(tiny_graph, src, 0.5, rounds=10).collect()
    }
    for v in TINY_VERTICES:
        assert np.isclose(got[v], val[v], atol=1e-9), (v, got[v], val[v])


def test_lpa_u2i_matches_python(spark):
    # 3 users, 2 items; user 0 seeded 1.0, user 2 seeded 0.0, user 1 free
    edges = [(0, 10, 1.0), (0, 11, 2.0), (1, 10, 1.0), (2, 11, 1.0)]
    labels = [(0, 0, 1.0), (1, 0, 0.5), (2, 0, 0.0)]
    e_df = spark.createDataFrame(edges, "uid long, iid long, w double")
    l_df = spark.createDataFrame(labels, "uid long, prop_id long, val double")

    odeg = {0: 2, 1: 1, 2: 1}
    ideg = {10: 2, 11: 2}
    onids = {0: ideg[10] + ideg[11], 1: ideg[10], 2: ideg[11]}
    val = {0: 1.0, 1: 0.5, 2: 0.0}
    for _ in range(4):
        ival = defaultdict(float)
        for u, i, w in edges:
            ival[i] += w * val[u]
        tmp = defaultdict(float)
        for u, i, w in edges:
            tmp[u] += w * ival[i]
        nxt = {}
        for u in val:
            if val[u] in (0.0, 1.0):
                nxt[u] = val[u]
            elif onids[u] != odeg[u]:
                nxt[u] = (tmp[u] - odeg[u] * val[u]) / (onids[u] - odeg[u])
            else:
                nxt[u] = val[u]
        val = nxt
    got = {r["uid"]: r["val"] for r in lpa_u2i(l_df, e_df, rounds=4).collect()}
    for u in val:
        assert np.isclose(got[u], val[u], atol=1e-9), (u, got[u], val[u])


def test_trustrank_matches_python_oracle(corpus_graph):
    from graphscope_spark.algorithms.centrality import trustrank

    E = {
        (r["src"], r["dst"])
        for r in corpus_graph.edges.select("src", "dst").distinct().collect()
        if r["src"] != r["dst"]
    }
    V = [r["vid"] for r in corpus_graph.vertices.collect()]
    seeds = sorted(V)[:3]
    alpha, rounds = 0.85, 10
    out = {}
    for u, v in E:
        out.setdefault(u, []).append(v)
    ns = len(seeds)
    val = {v: (1.0 / ns if v in set(seeds) else 0.0) for v in V}
    for _ in range(rounds):
        dang = sum(val[v] for v in V if v not in out)
        nxt = {v: 0.0 for v in V}
        for u, targets in out.items():
            share = alpha * val[u] / len(targets)
            for t in targets:
                nxt[t] += share
        tele = (1.0 - alpha) + alpha * dang
        for s in seeds:
            nxt[s] += tele / ns
        val = nxt
    got = {
        r["vid"]: r["trust"]
        for r in trustrank(corpus_graph, seeds=seeds).collect()
    }
    assert got.keys() == val.keys()
    for v in V:
        assert got[v] == pytest.approx(val[v], abs=1e-9)
    # total trust mass is conserved at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_simrank_mc_properties(spark, tiny_graph):
    """MC SimRank: self-similarity 1, component-locality, determinism,
    scores in (0, 1]."""
    from graphscope_spark.algorithms.simrank import simrank_mc

    q = spark.createDataFrame([(3,), (10,)], "vid long")
    res = {
        (r.q, r.vid): r.score
        for r in simrank_mc(
            tiny_graph, q, c=0.6, walk_length=5, num_walks=8, seed=2
        ).collect()
    }
    assert res[(3, 3)] == 1.0 and res[(10, 10)] == 1.0
    assert all(0.0 < s <= 1.0 for s in res.values())
    # walks never cross components: q=10's matches stay in {10,11,12}
    assert all(v >= 10 for (qq, v) in res if qq == 10)
    assert all(v < 10 for (qq, v) in res if qq == 3)
    again = {
        (r.q, r.vid): r.score
        for r in simrank_mc(
            tiny_graph, q, c=0.6, walk_length=5, num_walks=8, seed=2
        ).collect()
    }
    assert res == again
    import pytest as _pytest

    with _pytest.raises(ValueError):
        simrank_mc(tiny_graph, q, c=1.5)
