"""Cypher front end (graphscope_spark.cypher) — textual MATCH/WHERE/RETURN
must produce exactly what the equivalent Traversal chain produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.cypher import CypherParseError, cypher
from graphscope_spark.property_graph import PropertyGraph
from graphscope_spark.traversal import P, traversal


@pytest.fixture(scope="module")
def pg(spark):
    people = spark.createDataFrame(
        [(1, "ann", 31), (2, "bob", 27), (3, "cat", 45), (4, "dan", 27)],
        "vid long, name string, age long",
    )
    posts = spark.createDataFrame(
        [(10, "x"), (11, "y"), (12, "z")], "vid long, topic string"
    )
    knows = spark.createDataFrame(
        [(1, 2, 2020), (2, 3, 2021), (3, 1, 2019), (1, 3, 2022), (4, 1, 2020)],
        "src long, dst long, since long",
    )
    wrote = spark.createDataFrame(
        [(1, 10), (2, 11), (2, 12)], "src long, dst long"
    )
    return (
        PropertyGraph(num_partitions=4)
        .add_vertices("person", people)
        .add_vertices("post", posts)
        .add_edges("person", "knows", "person", knows)
        .add_edges("person", "wrote", "post", wrote)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_match_where_return(pg):
    got = cypher(
        pg,
        "MATCH (a:person)-[:knows]->(b:person) WHERE a.age > 27 "
        "RETURN a.name AS an, b.name AS bn",
    )
    want = [("ann", "bob"), ("ann", "cat"), ("cat", "ann")]
    assert _rows(got) == sorted(want)


def test_inline_props_and_var_return(pg):
    got = cypher(pg, "MATCH (a:person {name: 'bob'})-[:knows]->(b:person) RETURN b")
    assert _rows(got) == [(3,)]
    got = cypher(pg, "MATCH (a:person {age: 27}) RETURN a.name AS n ORDER BY n")
    assert [r["n"] for r in got.collect()] == ["bob", "dan"]


def test_two_hop_count_implicit_group(pg):
    got = cypher(
        pg,
        "MATCH (a:person)-[:knows]->()-[:knows]->(c:person) "
        "RETURN a AS a, c AS c, count(*) AS n",
    )
    t = traversal(pg, "person").as_("a").out("knows").out("knows").as_("c")
    want = (
        t.frame.groupBy(F.col("p_a").alias("a"), F.col("p_c").alias("c"))
        .agg(F.count("*").alias("n"))
    )
    assert _rows(got) == _rows(want)


def test_where_forms(pg):
    got = cypher(
        pg,
        "MATCH (a:person) WHERE a.age IN [27, 45] AND a.name CONTAINS 'a' "
        "RETURN a.name AS n",
    )
    assert _rows(got) == [("cat",), ("dan",)]
    got = cypher(
        pg, "MATCH (a:person) WHERE a.name STARTS WITH 'b' RETURN a.name AS n"
    )
    assert _rows(got) == [("bob",)]


def test_var_to_var_neq(pg):
    got = cypher(
        pg,
        "MATCH (a:person)-[:knows]->()-[:knows]->(c:person) "
        "WHERE a <> c RETURN a AS a, c AS c, count(*) AS n",
    )
    t = (
        traversal(pg, "person").as_("a").out("knows").out("knows").as_("c")
        .where(F.col("p_a") != F.col("p_c"))
    )
    want = t.frame.groupBy(
        F.col("p_a").alias("a"), F.col("p_c").alias("c")
    ).agg(F.count("*").alias("n"))
    assert _rows(got) == _rows(want)


def test_incoming_and_undirected(pg):
    got = cypher(pg, "MATCH (a:person {name: 'cat'})<-[:knows]-(b:person) RETURN b")
    want = traversal(pg, "person").has("name", "cat").in_("knows").to_df()
    assert sorted(r[0] for r in got.collect()) == sorted(
        r["v"] for r in want.collect()
    )
    both = cypher(
        pg, "MATCH (a:person {name: 'ann'})-[:knows]-(b:person) RETURN count(*) AS n"
    )
    wantn = traversal(pg, "person").has("name", "ann").both("knows").count()
    assert both.collect()[0]["n"] == wantn.collect()[0]["count"]


def test_cross_label_distinct_limit(pg):
    got = cypher(
        pg,
        "MATCH (a:person)-[:wrote]->(p:post) RETURN DISTINCT a.name AS n "
        "ORDER BY n DESC LIMIT 1",
    )
    assert [r["n"] for r in got.collect()] == ["bob"]


def test_parse_errors(pg):
    for bad in (
        "MATCH (a:person RETURN a",
        "MATCH (a:person) RETURN a.name + 1",
        "MATCH (a:person)-[:knows]->(b) WHERE a.age XOR 3 RETURN a",
        "CREATE (a:person) RETURN a",
    ):
        with pytest.raises(CypherParseError):
            cypher(pg, bad)


def test_whitespace_between_pattern_elements(pg):
    """Standard openCypher spacing: (a) -[:knows]-> (b)."""
    got = cypher(
        pg,
        "MATCH (a:person) -[:knows]-> (b:person) WHERE a.age > 27 "
        "RETURN a.name AS an, b.name AS bn",
    )
    assert _rows(got) == sorted(
        [("ann", "bob"), ("ann", "cat"), ("cat", "ann")]
    )


def test_unbound_var_comparison_raises(pg):
    with pytest.raises(CypherParseError, match="unknown variable"):
        cypher(
            pg,
            "MATCH (a:person)-[:knows]->(b:person) WHERE a <> x "
            "RETURN a AS a, count(*) AS n",
        )
