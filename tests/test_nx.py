"""NetworkX-compatible mutation layer vs a pure-python dict mirror.

Every scripted mutation sequence runs on BOTH graphscope_spark.nx and a
~20-line dict implementation of the same nx contracts; node sets, canonical
edge sets, attrs, and degrees must agree exactly."""

from __future__ import annotations

import pytest

from graphscope_spark.nx import DiGraph, Graph


class PyMirror:
    def __init__(self, directed=False):
        self.directed = directed
        self.nodes: dict[int, dict] = {}
        self.edges: dict[tuple, dict] = {}

    def canon(self, u, v):
        return (u, v) if self.directed or u <= v else (v, u)

    def add_node(self, n, **a):
        self.nodes.setdefault(n, {}).update({k: str(v) for k, v in a.items()})

    def add_edge(self, u, v, **a):
        self.edges.setdefault(self.canon(u, v), {}).update(
            {k: str(v2) for k, v2 in a.items()}
        )
        self.add_node(u)
        self.add_node(v)

    def remove_node(self, n):
        del self.nodes[n]
        self.edges = {e: d for e, d in self.edges.items() if n not in e}

    def remove_edge(self, u, v):
        del self.edges[self.canon(u, v)]

    def degree(self):
        d = {n: 0 for n in self.nodes}
        for a, b in self.edges:
            d[a] += 1
            d[b] += 1  # self-loop counts twice
        return d


def _assert_same(g: Graph, m: PyMirror):
    got_nodes = {r["vid"]: dict(r["attrs"]) for r in g.nodes().collect()}
    assert got_nodes == m.nodes
    got_edges = {(r["src"], r["dst"]): dict(r["attrs"]) for r in g.edges().collect()}
    assert got_edges == m.edges
    got_deg = {r["vid"]: r["degree"] for r in g.degree().collect()}
    assert got_deg == m.degree()


def test_mutation_roundtrip_undirected(spark):
    g, m = Graph(spark, num_partitions=4), PyMirror()
    for t in (g, m):
        t.add_node(1, color="red")
        t.add_node(2)
        t.add_edge(1, 2, w=3)
        t.add_edge(3, 1)            # implicit endpoint 3
        t.add_edge(2, 1, w=5)       # same undirected edge: attr merge, w -> 5
        t.add_node(1, size=7)       # attr merge on node
        t.add_edge(4, 4)            # self-loop
    _assert_same(g, m)
    for t in (g, m):
        t.remove_node(3)            # takes edge (1,3) with it
        t.add_edge(5, 6)
        t.remove_edge(5, 6)
    _assert_same(g, m)
    assert g.get_node_data(1) == {"color": "red", "size": "7"}
    assert g.get_edge_data(1, 2) == {"w": "5"}
    assert g.number_of_selfloops() == 1
    assert g.size(weight="w") == pytest.approx(5.0 + 1.0)  # (1,2)=5, loop default 1


def test_strict_single_lenient_bulk(spark):
    g = Graph(spark, num_partitions=4)
    g.add_edges_from([(1, 2), (2, 3)])
    with pytest.raises(KeyError):
        g.remove_node(99)
    with pytest.raises(KeyError):
        g.remove_edge(1, 3)
    g.remove_nodes_from([99, 3])        # lenient: 99 skipped, 3 removed
    g.remove_edges_from([(1, 3), (1, 2)])
    assert g.number_of_nodes() == 2     # 1 and 2 survive as isolated nodes
    assert g.number_of_edges() == 0


def test_digraph_direction_and_views(spark):
    g = DiGraph(spark, num_partitions=4)
    g.add_edges_from([(1, 2), (2, 1), (1, 3)])
    assert g.number_of_edges() == 3     # (1,2) and (2,1) are distinct
    assert g.has_edge(1, 3) and not g.has_edge(3, 1)
    assert {r["vid"] for r in g.successors(1).collect()} == {2, 3}
    assert {r["vid"] for r in g.predecessors(1).collect()} == {2}
    outd = {r["vid"]: r["out_degree"] for r in g.out_degree().collect()}
    ind = {r["vid"]: r["in_degree"] for r in g.in_degree().collect()}
    assert outd == {1: 2, 2: 1, 3: 0} and ind == {1: 1, 2: 1, 3: 1}


def test_bulk_df_paths_and_linkgraph(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(5, 3), (9, 2)], "src long, dst long"
    )
    g = Graph.from_dataframes(edges=edges, num_partitions=4)
    assert g.number_of_nodes() == 21 and g.number_of_edges() == 22
    g.remove_nodes_df(spark.createDataFrame([(0,), (20,)], "vid long"))
    assert g.number_of_nodes() == 19 and g.number_of_edges() == 20
    g.add_edges_df(spark.createDataFrame([(100, 101), (101, 102)], "src long, dst long"))
    assert g.number_of_nodes() == 22 and g.number_of_edges() == 22
    # bridge to the analytical engine: WCC over the mutated graph
    from graphscope_spark.algorithms import wcc

    res = wcc(g.to_link_graph())
    assert res.state.select("comp").distinct().count() == 2


def test_long_mutation_history_stays_flat(spark):
    """200 interleaved mutations: plans stay bounded (flush truncation)."""
    g, m = Graph(spark, num_partitions=4), PyMirror()
    for i in range(100):
        for t in (g, m):
            t.add_edge(i, i + 1, step=i)
    for i in range(0, 100, 3):
        for t in (g, m):
            t.remove_edge(i, i + 1)
    _assert_same(g, m)


def test_multigraph_parallel_edges_vs_networkx(spark):
    """MultiGraph semantics vs networkx.MultiGraph on the same edge bag:
    counts with multiplicity, per-pair multiplicities, single-copy and
    all-copies removal, simple-graph collapse."""
    import networkx as nx

    from graphscope_spark.nx import MultiGraph

    bag = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 4), (4, 3), (5, 5)]
    mg = MultiGraph(spark.createDataFrame(bag, "src long, dst long"), num_partitions=4)
    ref = nx.MultiGraph()
    ref.add_edges_from(bag)
    assert mg.is_multigraph() and not mg.is_directed()
    assert mg.number_of_nodes() == ref.number_of_nodes()
    assert mg.number_of_edges() == ref.number_of_edges()
    assert mg.number_of_edges(1, 2) == ref.number_of_edges(1, 2) == 3
    assert {(r.a, r.b): r.m for r in mg.edge_multiplicity().collect()} == {
        (1, 2): 3, (2, 3): 1, (3, 4): 2, (5, 5): 1
    }
    got_deg = {r.vid: r.degree for r in mg.degree().collect()}
    assert got_deg == dict(ref.degree())  # self-loop counts twice
    # remove one parallel copy, then all copies
    mg.remove_edge(1, 2)
    ref.remove_edge(1, 2)
    assert mg.number_of_edges(1, 2) == ref.number_of_edges(1, 2) == 2
    mg.remove_edges_between(3, 4)
    assert mg.number_of_edges(3, 4) == 0
    # bulk add extends keys past existing ones (no key collisions)
    mg.add_edges_df(spark.createDataFrame([(1, 2), (9, 8)], "src long, dst long"))
    assert mg.number_of_edges(1, 2) == 3
    keys = [r.key for r in mg._e.where("a = 1 AND b = 2").collect()]
    assert len(set(keys)) == 3
    # collapse
    simple = mg.to_graph()
    assert simple.number_of_edges() == mg.edge_multiplicity().count()
    import pytest as _pytest

    with _pytest.raises(KeyError):
        mg.remove_edge(1, 99)
