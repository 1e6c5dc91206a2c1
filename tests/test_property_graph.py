"""ADD_LABELS / PROJECT / GraphAr-style archive round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.algorithms import pagerank
from graphscope_spark.property_graph import (
    PropertyGraph,
    archive_graph,
    load_archived_graph,
)


@pytest.fixture(scope="module")
def pg(spark):
    users = spark.createDataFrame(
        [(1, "ann"), (2, "bo"), (3, "cy")], "vid long, name string"
    )
    items = spark.createDataFrame(
        [(100, 9.5), (101, 3.0)], "vid long, price double"
    )
    bought = spark.createDataFrame(
        [(1, 100, 2), (2, 100, 1), (3, 101, 4)], "src long, dst long, qty long"
    )
    follows = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    return (
        PropertyGraph(num_partitions=4)
        .add_vertices("user", users)
        .add_vertices("item", items)
        .add_edges("user", "bought", "item", bought)
        .add_edges("user", "follows", "user", follows)
    )


def test_add_labels_validation(spark, pg):
    with pytest.raises(ValueError):
        pg.add_vertices("user", pg.vertices["user"])
    with pytest.raises(ValueError):
        pg.add_edges("user", "x", "ghost", pg.edges[("user", "follows", "user")])
    assert pg.schema() == {
        "vertices": {"user": ["name"], "item": ["price"]},
        "edges": {"user/bought/item": ["qty"], "user/follows/user": []},
    }


def test_project_runs_apps(pg):
    g = pg.project("user", ("user", "follows", "user"))
    res = pagerank(g, max_rounds=20, tol=1e-9)
    ranks = {r["vid"]: r["rank"] for r in res.state.collect()}
    # 3-cycle → uniform
    assert ranks.keys() == {1, 2, 3}
    assert max(ranks.values()) - min(ranks.values()) < 1e-9


def test_archive_roundtrip(spark, pg, tmp_path):
    path = str(tmp_path / "ar")
    archive_graph(pg, path)
    back = load_archived_graph(spark, path)
    assert set(back.vertices) == {"user", "item"}
    assert set(back.edges) == {("user", "bought", "item"), ("user", "follows", "user")}
    got = sorted(
        (r["src"], r["dst"], r["qty"])
        for r in back.edges[("user", "bought", "item")].collect()
    )
    assert got == [(1, 100, 2), (2, 100, 1), (3, 101, 4)]
    names = {r["vid"]: r["name"] for r in back.vertices["user"].collect()}
    assert names == {1: "ann", 2: "bo", 3: "cy"}


def test_graphar_layout_conformance(spark, pg, tmp_path):
    """The archive must be the documented gar/v1 layout: graph/vertex/edge
    yaml descriptors with the spec's required keys, exactly-one-file
    chunked vertex data (chunk_size rows per chunk, last one ragged),
    vertex_count / edge_count files, and per-vertex-chunk CSR offset
    arrays that are monotone and account for every edge."""
    import glob
    import os

    import yaml

    from graphscope_spark.property_graph import archive_graph

    path = str(tmp_path / "gar")
    archive_graph(pg, path, name="toy", vertex_chunk_size=2, edge_chunk_size=2)

    with open(os.path.join(path, "toy.graph.yml")) as f:
        gd = yaml.safe_load(f)
    assert gd["version"] == "gar/v1"
    assert set(gd) >= {"name", "prefix", "vertices", "edges", "version"}

    for vf in gd["vertices"]:
        with open(os.path.join(path, vf)) as f:
            vd = yaml.safe_load(f)
        assert set(vd) >= {
            "label", "chunk_size", "prefix", "property_groups", "version"
        }
        pgroup = vd["property_groups"][0]
        assert pgroup["file_type"] == "parquet"
        names = {p["name"] for p in pgroup["properties"]}
        assert "vid" in names and "_index" in names
        vdir = os.path.join(path, vd["prefix"], pgroup["prefix"].rstrip("/"))
        chunks = sorted(glob.glob(os.path.join(vdir, "chunk*")))
        assert chunks, vdir
        with open(os.path.join(path, vd["prefix"], "vertex_count")) as f:
            n = int(f.read())
        # chunk files: every chunk exactly chunk_size rows except the last
        import pyarrow.parquet as pq

        sizes = {
            int(os.path.basename(c)[5:]): pq.read_table(c).num_rows
            for c in chunks
        }
        assert sum(sizes.values()) == n
        for i, sz in sizes.items():
            if i < max(sizes):
                assert sz == vd["chunk_size"], (i, sz)
        # rows are ordered by the internal index within each chunk
        t0 = pq.read_table(chunks[0]).to_pydict()["_index"]
        assert t0 == sorted(t0) and t0[0] == 0

    for ef in gd["edges"]:
        with open(os.path.join(path, ef)) as f:
            ed = yaml.safe_load(f)
        assert set(ed) >= {
            "src_label", "edge_label", "dst_label", "chunk_size",
            "src_chunk_size", "dst_chunk_size", "directed", "prefix",
            "adj_lists", "version",
        }
        adj = ed["adj_lists"][0]
        assert adj["aligned_by"] == "src" and adj["ordered"] is True
        edir = os.path.join(path, ed["prefix"], "ordered_by_source")
        with open(os.path.join(edir, "edge_count")) as f:
            m = int(f.read())
        import pyarrow.parquet as pq

        achunks = glob.glob(os.path.join(edir, "adj_list", "part*", "chunk*"))
        rows = sum(pq.read_table(c).num_rows for c in achunks)
        assert rows == m
        # offsets: monotone per chunk, final value = that chunk's edges
        total_from_offsets = 0
        for oc in glob.glob(os.path.join(edir, "offset", "chunk*")):
            offs = pq.read_table(oc).to_pydict()["offset"]
            assert offs == sorted(offs) and offs[0] == 0
            total_from_offsets += offs[-1]
        assert total_from_offsets == m


def test_graph_store_versioned_mutations(spark, pg, tmp_path):
    """groot-lite store: commit → mutate (nx layer) → commit; both
    versions independently loadable, snapshot isolation holds, manifest
    records the history."""
    from graphscope_spark.store import GraphStore

    store = GraphStore(str(tmp_path / "store"))
    v1 = store.commit(pg, message="initial")
    assert v1 == 1

    # mutate: drop one edge triple's rows for user 1, add a vertex
    pg2 = pg
    new_user = spark.createDataFrame(
        [(99, "zed")], pg.vertices["user"].schema
    )
    pg2 = PropertyGraph(
        {**pg.vertices, "user": pg.vertices["user"].unionByName(new_user)},
        dict(pg.edges),
        pg.num_partitions,
    )
    v2 = store.commit(pg2, message="add user 99")
    assert v2 == 2

    back1 = store.load(spark, version=1)
    back2 = store.load(spark, version=2)
    n1 = back1.vertices["user"].count()
    n2 = back2.vertices["user"].count()
    assert n2 == n1 + 1
    assert 99 in {r["vid"] for r in back2.vertices["user"].collect()}
    assert 99 not in {r["vid"] for r in back1.vertices["user"].collect()}
    # latest = v2; manifest history intact
    assert store.latest_version() == 2
    msgs = [e["message"] for e in store.versions()]
    assert msgs == ["initial", "add user 99"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        store.load(spark, version=7)


def test_graph_store_stale_lock_reclaim(spark, pg, tmp_path):
    """A crashed committer's stale lock (old mtime) is reclaimed; a
    completed commit leaves no lock behind."""
    import os

    from graphscope_spark.store import GraphStore

    store = GraphStore(str(tmp_path / "locked"))
    lock = os.path.join(store.path, ".commit.lock")
    open(lock, "w").close()
    os.utime(lock, (1, 1))  # ancient mtime — stale
    v = store.commit(pg, message="after crash")
    assert v == 1
    assert not os.path.exists(lock)


def test_archive_empty_label_roundtrip(spark, tmp_path):
    """A zero-row vertex label and a zero-row edge triple must round-trip
    (partitionBy writes no chunk files; the loader rebuilds empty frames
    from the yaml schema)."""
    from graphscope_spark.property_graph import (
        archive_graph,
        load_archived_graph,
    )

    users = spark.createDataFrame([(1, "a")], "vid long, name string")
    ghosts = spark.createDataFrame([], "vid long, tag string")
    e_empty = spark.createDataFrame([], "src long, dst long, w double")
    pg = (
        PropertyGraph(num_partitions=2)
        .add_vertices("user", users)
        .add_vertices("ghost", ghosts)
        .add_edges("user", "haunts", "ghost", e_empty)
    )
    path = str(tmp_path / "empty_ar")
    archive_graph(pg, path)
    back = load_archived_graph(spark, path)
    assert back.num_partitions == 2
    assert back.vertices["ghost"].count() == 0
    assert [f.name for f in back.vertices["ghost"].schema.fields] == ["vid", "tag"]
    assert back.edges[("user", "haunts", "ghost")].count() == 0
    assert set(back.edges[("user", "haunts", "ghost")].columns) == {"src", "dst", "w"}
    assert back.vertices["user"].count() == 1


def test_graph_store_nx_mutation_loop(spark, tmp_path):
    """The groot loop: load_nx a snapshot → mutate via the nx layer →
    commit_nx; history preserved, attrs survive the GraphAr round-trip."""
    from graphscope_spark.nx import Graph
    from graphscope_spark.store import GraphStore

    g = Graph(spark, num_partitions=2)
    g.add_edges_from([(1, 2), (2, 3)])
    g.add_node(9, kind="isolated")
    store = GraphStore(str(tmp_path / "nxstore"))
    v1 = store.commit_nx(g, message="init")

    g2 = store.load_nx(spark, v1)
    g2.add_edge(3, 9)
    g2.remove_node(1)
    v2 = store.commit_nx(g2, message="mutate")

    back1 = store.load_nx(spark, v1)
    back2 = store.load_nx(spark, v2)
    assert back1.number_of_nodes() == 4 and back1.number_of_edges() == 2
    assert back2.number_of_nodes() == 3 and back2.number_of_edges() == 2
    vids2 = {r["vid"] for r in back2.vertices.collect()}
    assert vids2 == {2, 3, 9}
    attrs = {
        r["vid"]: dict(r["attrs"] or {}) for r in back2.vertices.collect()
    }
    assert attrs[9].get("kind") == "isolated"
    assert [e["message"] for e in store.versions()] == ["init", "mutate"]


def test_graphar_roundtrip_fuzz(spark, tmp_path):
    """Randomized GraphAr round-trips: random small property graphs
    (labels × typed columns × chunk sizes) must archive and reload to
    identical contents. Deterministic seed."""
    import random

    from graphscope_spark.property_graph import (
        archive_graph,
        load_archived_graph,
    )

    rng = random.Random(5)
    for case in range(4):
        n_u = rng.randint(0, 12)
        users = spark.createDataFrame(
            [(i, f"u{i}", rng.random()) for i in range(n_u)],
            "vid long, name string, score double",
        )
        items = spark.createDataFrame(
            [(100 + i, rng.randint(0, 5)) for i in range(rng.randint(1, 6))],
            "vid long, stock long",
        )
        n_i = items.count()
        edges = spark.createDataFrame(
            [
                (rng.randrange(n_u), 100 + rng.randrange(n_i), rng.random())
                for _ in range(rng.randint(0, 20))
                if n_u > 0
            ] or [],
            "src long, dst long, w double",
        )
        pg = (
            PropertyGraph(num_partitions=rng.choice([2, 3, 5]))
            .add_vertices("user", users)
            .add_vertices("item", items)
            .add_edges("user", "bought", "item", edges)
        )
        path = str(tmp_path / f"fz{case}")
        archive_graph(
            pg, path,
            vertex_chunk_size=rng.choice([2, 4, 1000]),
            edge_chunk_size=rng.choice([3, 1000]),
        )
        back = load_archived_graph(spark, path)
        assert back.num_partitions == pg.num_partitions
        for lbl in ("user", "item"):
            a = sorted(tuple(r) for r in pg.vertices[lbl].collect())
            b = sorted(tuple(r) for r in back.vertices[lbl].collect())
            assert a == b, (case, lbl)
        key = ("user", "bought", "item")
        a = sorted(tuple(r) for r in pg.edges[key].select("src", "dst", "w").collect())
        b = sorted(tuple(r) for r in back.edges[key].select("src", "dst", "w").collect())
        assert a == b, case


def test_archive_dangling_edge_raises(spark, tmp_path):
    """Edges referencing vertices absent from their label's table must
    fail the archive loudly (the index join would silently drop them —
    the data-loss mode the round-trip fuzz caught)."""
    from graphscope_spark.property_graph import archive_graph

    users = spark.createDataFrame([(1, "a")], "vid long, name string")
    items = spark.createDataFrame([(100, 1)], "vid long, stock long")
    dangling = spark.createDataFrame(
        [(1, 100, 1.0), (1, 999, 2.0)], "src long, dst long, w double"
    )
    pg = (
        PropertyGraph(num_partitions=2)
        .add_vertices("user", users)
        .add_vertices("item", items)
        .add_edges("user", "bought", "item", dangling)
    )
    with pytest.raises(ValueError, match="not in the"):
        archive_graph(pg, str(tmp_path / "dang"))
