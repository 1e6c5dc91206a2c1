"""Pregel vertex-program surface: programs must reproduce the dedicated
algorithm kernels (the reference validates its pregel variants the same way
— pagerank_pregel vs pagerank, `apps/pregel/`)."""

from __future__ import annotations

from graphscope_spark.algorithms import wcc
from graphscope_spark.algorithms.traversal import bfs
from graphscope_spark.pregel import (
    hop_distance_program,
    min_label_program,
    run_pregel,
)


def _m(df, v="value"):
    return {r["vid"]: r[v] for r in df.collect()}


def test_pregel_min_label_equals_wcc(tiny_graph):
    res = run_pregel(tiny_graph, min_label_program())
    assert res.converged
    assert _m(res.state) == _m(wcc(tiny_graph).state, "comp")


def test_pregel_hop_distance_equals_bfs(tiny_graph):
    src = tiny_graph.vertices.agg({"vid": "min"}).collect()[0][0]
    res = run_pregel(tiny_graph, hop_distance_program(src))
    assert res.converged
    want = _m(bfs(tiny_graph, source=src).state, "dist")
    got = {k: v for k, v in _m(res.state).items() if v is not None}
    want = {k: v for k, v in want.items() if v is not None and v >= 0}
    assert got == want


def test_pregel_checkpoint_resume(tiny_graph, tmp_path):
    ck = str(tmp_path / "ck")
    part = run_pregel(tiny_graph, min_label_program(), max_rounds=2,
                      checkpoint_dir=ck, checkpoint_every=1)
    assert not part.converged
    res = run_pregel(tiny_graph, min_label_program(), checkpoint_dir=ck,
                     checkpoint_every=1, resume=True)
    assert res.converged
    assert _m(res.state) == _m(wcc(tiny_graph).state, "comp")
