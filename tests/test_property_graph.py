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
