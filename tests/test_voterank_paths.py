"""VoteRank and simple-path checks vs pure-Python oracles."""

from __future__ import annotations

from graphscope_spark.algorithms.paths import is_simple_path
from graphscope_spark.algorithms.voterank import voterank

from tests.conftest import TINY_EDGES, TINY_VERTICES


def _voterank_oracle(edges, vertices, num):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {v: set() for v in vertices}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    n_sym = 2 * len(und)
    avg_k = n_sym / len(vertices)
    penalty = 1.0 / avg_k
    ability = {v: 1.0 for v in vertices}
    excluded = set()
    out = []
    for rnd in range(1, num + 1):
        scores = {
            v: sum(ability[u] for u in adj[v]) for v in vertices if adj[v]
        }
        cand = [(round(s, 9), -v, v) for v, s in scores.items() if v not in excluded]
        if not cand:
            break
        _, _, winner = max(cand)
        out.append((rnd, winner))
        excluded.add(winner)
        ability[winner] = 0.0
        for u in adj[winner]:
            ability[u] = max(ability[u] - penalty, 0.0)
    return out


def test_voterank_tiny(tiny_graph):
    got = [(r["rank"], r["vid"]) for r in voterank(tiny_graph, 5).orderBy("rank").collect()]
    assert got == _voterank_oracle(TINY_EDGES, TINY_VERTICES, 5)


def test_is_simple_path_tiny(tiny_graph):
    assert is_simple_path(tiny_graph, [1, 2, 3])
    assert is_simple_path(tiny_graph, [1, 2, 3, 4, 5])
    assert is_simple_path(tiny_graph, [7])
    assert not is_simple_path(tiny_graph, [1, 3])       # no edge 1→3
    assert not is_simple_path(tiny_graph, [1, 2, 3, 1])  # repeated vertex
    assert not is_simple_path(tiny_graph, [999, 1])      # missing vertex
    assert not is_simple_path(tiny_graph, [])
