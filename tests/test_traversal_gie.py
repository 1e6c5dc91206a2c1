"""GIE-lite traversal steps vs hand-computed results on a typed toy graph
(step semantics from the reference's supported_gremlin_steps.md: bag
traversers, dedup as an explicit step, PathExpand as hop-range union)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.property_graph import PropertyGraph
from graphscope_spark.traversal import traversal


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
        [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)], "src long, dst long"
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


def test_out_bag_and_dedup(pg):
    t = traversal(pg, "person").out("knows").out("knows")
    # 2-hop bag: 1→2→3, 1→3→1, 2→3→1, 3→1→2, 3→1→3, 4→1→2, 4→1→3 = 7 rows
    assert t.count().collect()[0]["count"] == 7
    heads = sorted(r["v"] for r in t.dedup().to_df().collect())
    assert heads == [1, 2, 3]  # bag collapses to the 3 distinct heads


def test_has_and_values(pg):
    names = sorted(
        r["name"]
        for r in traversal(pg, "person").has("age", 27).values("name").collect()
    )
    assert names == ["bob", "dan"]
    # predicate-column form
    n = (
        traversal(pg, "person")
        .has("age", F.col("age") > 30)
        .count()
        .collect()[0]["count"]
    )
    assert n == 2  # ann(31), cat(45)


def test_cross_label_hop_and_group_count(pg):
    # person -wrote-> post: label of the head flips to 'post'
    topics = sorted(
        r["topic"] for r in traversal(pg, "person").out("wrote").values("topic").collect()
    )
    assert topics == ["x", "y", "z"]
    gc = {
        r["key"]: r["count"]
        for r in traversal(pg, "person").out("knows").group_count("name").collect()
    }
    assert gc == {"ann": 2, "bob": 1, "cat": 2}


def test_in_and_both(pg):
    # who wrote post 11? in_ from posts
    writers = sorted(
        r["name"] for r in traversal(pg, "post").in_("wrote").dedup().values("name").collect()
    )
    assert writers == ["ann", "bob"]
    n_both = traversal(pg, "person").both("knows").count().collect()[0]["count"]
    assert n_both == 10  # 5 edges × 2 directions


def test_path_expand(pg):
    t = traversal(pg, "person").has("name", "dan").path_expand(1, 2, "knows")
    rows = sorted((r["hops"], r["v"]) for r in t.to_df().collect())
    # dan→1 (1 hop); dan→1→2, dan→1→3 (2 hops)
    assert rows == [(1, 1), (2, 2), (2, 3)]


def test_traversal_matches_sql_two_hop(pg, spark):
    """The join-chain the traversal builds must equal the SQL a relational
    user would write — the GIE-to-DataFrame compilation contract."""
    knows = pg.edges[("person", "knows", "person")]
    knows.createOrReplaceTempView("knows_e")
    want = spark.sql(
        "SELECT COUNT(*) AS count FROM knows_e a JOIN knows_e b ON a.dst = b.src"
    ).collect()[0]["count"]
    got = traversal(pg, "person").out("knows").out("knows").count().collect()[0]["count"]
    assert got == want


def test_as_select_path(pg):
    """as/select path projection: 2-hop paths with both steps labeled."""
    t = (
        traversal(pg, "person").as_("a").out("knows").as_("b").out("knows")
    )
    rows = sorted(
        (r["a"], r["b"], r["c"])
        for r in t.as_("c").select("a", "b", "c").collect()
    )
    assert rows == sorted(
        [(1, 2, 3), (1, 3, 1), (2, 3, 1), (3, 1, 2), (3, 1, 3), (4, 1, 2), (4, 1, 3)]
    )


def test_where_cross_step(pg):
    """where(neq('a')): drop 2-hop paths that return to the start."""
    t = traversal(pg, "person").as_("a").out("knows").out("knows").where("!a")
    rows = sorted(r["v"] for r in t.to_df().collect())
    # 7 paths minus the two that return to the start (1→3→1, 3→1→3)
    assert rows == [1, 2, 2, 3, 3]
    # eq form keeps exactly the returning paths
    t2 = traversal(pg, "person").as_("a").out("knows").out("knows").where("a")
    assert t2.count().collect()[0]["count"] == 2  # 1→3→1 and 3→1→3


def test_select_head_refocus(pg):
    """select('a') mid-traversal re-focuses the head with its label."""
    t = (
        traversal(pg, "person")
        .has("name", "bob")
        .as_("a")
        .out("wrote")  # head now post
        .select_head("a")  # back to bob
    )
    assert t.head_label == "person"
    assert sorted(r for (r,) in t.values("name").collect()) == ["bob", "bob"]


def test_edge_source(pg):
    from graphscope_spark.traversal import edge_traversal

    assert edge_traversal(pg, "knows").count().collect()[0]["count"] == 5
    outs = sorted(r["v"] for r in edge_traversal(pg, "knows").out_v().to_df().collect())
    assert outs == [1, 1, 2, 3, 4]
    writers = sorted(
        r
        for (r,) in edge_traversal(pg, "wrote").in_v().dedup().to_df().collect()
    )
    assert writers == [10, 11, 12]


def test_union_step(pg):
    a = traversal(pg, "person").has("name", "ann").out("knows")
    b = traversal(pg, "person").has("name", "dan").out("knows")
    u = a.union(b)
    assert sorted(r["v"] for r in u.to_df().collect()) == [1, 2, 3]
    assert u.head_label == "person"


def test_both_label_asymmetric(pg):
    """both() on a label-asymmetric triple traverses only the direction(s)
    whose endpoint label matches the head — no spurious traversers from
    reversed rows in a different label's id space."""
    # person -wrote-> post: from person, both('wrote') == out('wrote')
    from_person = sorted(
        r["v"] for r in traversal(pg, "person").both("wrote").to_df().collect()
    )
    assert from_person == [10, 11, 12]
    # from post, both('wrote') == in_('wrote')
    from_post = sorted(
        r["v"] for r in traversal(pg, "post").both("wrote").to_df().collect()
    )
    assert from_post == [1, 2, 2]


def test_to_subgraph_feeds_algorithms(pg):
    """GREMLIN_TO_SUBGRAPH: induce the subgraph of people known by ann's
    circle and run an analytical app on it (the reference's
    dag_utils.py:1048 materialization contract)."""
    from graphscope_spark.algorithms.wcc import wcc

    sub = (
        traversal(pg, "person")
        .has("age", F.col("age") >= 27)
        .to_subgraph("knows")
    )
    assert sub.vertices.count() == 4
    assert sub.edges.count() == 5
    comps = {r["vid"]: r["comp"] for r in wcc(sub).state.collect()}
    assert len(set(comps.values())) == 1  # all connected


def test_match_triangle_and_cross_label(pg):
    """match(): the directed 3-cycle pattern must find exactly the rotations
    of the knows-triangle 1->2->3->1; a cross-label pattern (person wrote
    post) composes with it through the shared alias."""
    from graphscope_spark.traversal import match_patterns, traversal as trav

    p1 = trav(pg, "person").as_("a").out("knows").as_("b")
    p2 = trav(pg, "person").as_("b").out("knows").as_("c")
    p3 = trav(pg, "person").as_("c").out("knows").as_("a")
    tri = match_patterns(p1, p2, p3)
    got = sorted(
        (r["a"], r["b"], r["c"]) for r in tri.select("a", "b", "c").collect()
    )
    assert got == [(1, 2, 3), (2, 3, 1), (3, 1, 2)]
    # conjunctive composition across labels: cycle members who wrote a post
    p4 = trav(pg, "person").as_("a").out("wrote").as_("p")
    both = match_patterns(p1, p2, p3, p4)
    rows = sorted(
        (r["a"], r["p"]) for r in both.select("a", "p").collect()
    )
    assert rows == [(1, 10), (2, 11), (2, 12)]


def test_match_requires_shared_alias(pg):
    from graphscope_spark.traversal import match_patterns, traversal as trav

    import pytest as _pytest

    p1 = trav(pg, "person").as_("a").out("knows").as_("b")
    p2 = trav(pg, "person").as_("x").out("knows").as_("y")
    with _pytest.raises(ValueError):
        match_patterns(p1, p2)


def test_aggregate_steps(pg):
    """sum/min/max/mean over values (bag semantics) and group().by(key)."""
    from graphscope_spark.traversal import traversal as trav

    t = trav(pg, "person").out("knows")  # heads: 2,3,1,3,1 (bag)
    assert t.sum_("age").collect()[0]["sum"] == 27 + 45 + 31 + 45 + 31
    assert t.min_("age").collect()[0]["min"] == 27
    assert t.max_("age").collect()[0]["max"] == 45
    assert t.mean_("age").collect()[0]["mean"] == (27 + 45 + 31 + 45 + 31) / 5
    grouped = {r["key"]: r["values"] for r in
               trav(pg, "person").group("age", "name").collect()}
    assert grouped == {31: ["ann"], 27: ["bob", "dan"], 45: ["cat"]}
    by_id = {r["key"]: r["values"] for r in t.group("age").collect()}
    assert by_id == {27: [2], 31: [1, 1], 45: [3, 3]}
