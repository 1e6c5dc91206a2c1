"""GIE-lite traversal steps vs hand-computed results on a typed toy graph
(step semantics from the reference's supported_gremlin_steps.md: bag
traversers, dedup as an explicit step, PathExpand as hop-range union)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_out_e_has_other_v(pg):
    """outE().has(prop, P).otherV(): edge-property filter mid-chain, then
    the not-traversed-from endpoint (== inV for outE)."""
    from graphscope_spark.traversal import P

    t = (
        traversal(pg, "person")
        .has("name", "ann")
        .out_e("knows")
        .has("since", P.gte(2021))
        .other_v()
    )
    assert t.head_label == "person"
    assert sorted(r["v"] for r in t.to_df().collect()) == [3]  # only 1→3 (2022)
    # existence form and values projection
    ys = sorted(
        r["since"]
        for r in traversal(pg, "person").out_e("knows").has("since").values("since").collect()
    )
    assert ys == [2019, 2020, 2020, 2021, 2022]


def test_both_e_other_v_equals_both(pg):
    """bothE().otherV() ≡ both() — same bag of heads (reference
    supported_gremlin_steps.md otherV example)."""
    via_edges = sorted(
        r["v"] for r in traversal(pg, "person").both_e("knows").other_v().to_df().collect()
    )
    direct = sorted(
        r["v"] for r in traversal(pg, "person").both("knows").to_df().collect()
    )
    assert via_edges == direct


def test_in_e_out_v_and_both_v(pg):
    """inE().outV() ≡ in_(); bothV() emits both endpoints per edge."""
    via_edges = sorted(
        r["v"] for r in traversal(pg, "post").in_e("wrote").out_v().to_df().collect()
    )
    direct = sorted(r["v"] for r in traversal(pg, "post").in_("wrote").to_df().collect())
    assert via_edges == direct == [1, 2, 2]
    bv = sorted(
        r["v"]
        for r in traversal(pg, "person")
        .has("name", "ann")
        .out_e("wrote")
        .both_v()
        .to_df()
        .collect()
    )
    assert bv == [1, 10]  # ann -wrote-> post 10: both endpoints


def test_edge_hop_carries_path(pg):
    """as_('a') before an edge detour survives to the endpoint traversal."""
    t = (
        traversal(pg, "person")
        .as_("a")
        .out_e("knows")
        .other_v()
        .as_("b")
    )
    rows = sorted((r["a"], r["b"]) for r in t.select("a", "b").collect())
    assert rows == [(1, 2), (1, 3), (2, 3), (3, 1), (4, 1)]
    # cross-label labels resolve: person -wrote-> post flips endpoint labels
    te = traversal(pg, "person").out_e("wrote")
    assert te.in_v().head_label == "post"
    assert te.out_v().head_label == "person"


def test_fold_unfold_path(pg):
    """fold() barriers the bag into one list; unfold() restores it;
    path() projects the labeled history + head."""
    folded = traversal(pg, "person").fold().to_df().collect()
    assert folded[0]["folded"] == [1, 2, 3, 4]
    back = sorted(
        r["v"] for r in traversal(pg, "person").fold().unfold().to_df().collect()
    )
    assert back == [1, 2, 3, 4]
    paths = sorted(
        tuple(r["path"])
        for r in traversal(pg, "person").as_("a").out("knows").as_("b").path().collect()
    )
    assert paths == [(1, 2, 2), (1, 3, 3), (2, 3, 3), (3, 1, 1), (4, 1, 1)]


def test_coalesce_optional(pg):
    """coalesce: first branch with results wins per start traverser;
    optional passes misses through unchanged."""
    # person-wrote: only ann(1), bob(2) wrote; cat/dan fall to branch 2
    t = traversal(pg, "person").coalesce_(
        lambda s: s.out("wrote"), lambda s: s.identity()
    )
    got = sorted(r["v"] for r in t.to_df().collect())
    assert got == [3, 4, 10, 11, 12]  # writers' posts + non-writers themselves
    # optional == coalesce(branch, identity)
    opt = sorted(
        r["v"] for r in traversal(pg, "person").optional(lambda s: s.out("wrote")).to_df().collect()
    )
    assert opt == got
    # single-branch coalesce == the branch itself
    one = sorted(
        r["v"]
        for r in traversal(pg, "person").coalesce_(lambda s: s.out("wrote")).to_df().collect()
    )
    assert one == [10, 11, 12]


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


def test_p_predicates(pg):
    """P.xxx predicate forms of has() (supported_gremlin_steps.md:147-170)."""
    from graphscope_spark.traversal import P

    def names(t):
        return sorted(r["name"] for r in t.values("name").collect())

    t0 = traversal(pg, "person")
    assert names(t0.has("age", P.eq(27))) == ["bob", "dan"]
    assert names(t0.has("age", P.neq(27))) == ["ann", "cat"]
    assert names(t0.has("age", P.gt(31))) == ["cat"]
    assert names(t0.has("age", P.gte(31))) == ["ann", "cat"]
    assert names(t0.has("age", P.lt(31))) == ["bob", "dan"]
    assert names(t0.has("age", P.lte(27))) == ["bob", "dan"]
    assert names(t0.has("age", P.within([27, 45]))) == ["bob", "cat", "dan"]
    assert names(t0.has("age", P.without([27, 45]))) == ["ann"]
    assert names(t0.has("age", P.inside(27, 45))) == ["ann"]  # exclusive
    assert names(t0.has("age", P.outside(27, 45))) == []
    assert names(t0.has("age", P.not_(P.eq(27)))) == ["ann", "cat"]


def test_textp_predicates(pg):
    from graphscope_spark.traversal import TextP

    def names(pred):
        return sorted(
            r["name"]
            for r in traversal(pg, "person").has("name", pred).values("name").collect()
        )

    assert names(TextP.starting_with("a")) == ["ann"]
    assert names(TextP.ending_with("n")) == ["ann", "dan"]
    assert names(TextP.containing("a")) == ["ann", "cat", "dan"]
    assert names(TextP.not_starting_with("a")) == ["bob", "cat", "dan"]
    assert names(TextP.not_ending_with("n")) == ["bob", "cat"]
    assert names(TextP.not_containing("a")) == ["bob"]


def test_has_existence_and_has_not(pg, spark):
    """has('p') keeps traversers with the property; hasNot('p') the rest."""
    from graphscope_spark.property_graph import PropertyGraph

    people = spark.createDataFrame(
        [(1, "ann", 31), (2, "bob", None), (3, None, 45)],
        "vid long, name string, age long",
    )
    g = PropertyGraph(num_partitions=2).add_vertices("person", people)
    t0 = traversal(g, "person")
    assert sorted(r["v"] for r in t0.has("age").to_df().collect()) == [1, 3]
    assert sorted(r["v"] for r in t0.has_not("age").to_df().collect()) == [2]
    assert sorted(r["v"] for r in t0.has("name").to_df().collect()) == [1, 2]


def test_has_id_has_label_is(pg):
    t0 = traversal(pg, "person")
    assert sorted(r["v"] for r in t0.has_id(1, 3).to_df().collect()) == [1, 3]
    assert t0.has_label("person").count().collect()[0]["count"] == 4
    assert t0.has_label("post").count().collect()[0]["count"] == 0
    assert t0.has_label("post", "person").count().collect()[0]["count"] == 4
    from graphscope_spark.traversal import P

    assert sorted(r["v"] for r in t0.is_(P.gt(2)).to_df().collect()) == [3, 4]
    assert sorted(r["v"] for r in t0.is_(2).to_df().collect()) == [2]


def test_projection_steps(pg):
    """id()/label()/constant()/valueMap()/elementMap() projections."""
    t = traversal(pg, "person").has("age", 27)
    assert sorted(r["id"] for r in t.id_().collect()) == [2, 4]
    assert [r["label"] for r in t.label_().collect()] == ["person", "person"]
    assert [r["constant"] for r in t.constant(7).collect()] == [7, 7]
    vm = sorted(
        (r["name"], r["age"]) for r in t.value_map("name", "age").collect()
    )
    assert vm == [("bob", 27), ("dan", 27)]
    # all-props form
    assert sorted(t.value_map().columns) == ["age", "name"]
    em = sorted(
        (r["id"], r["label"], r["name"]) for r in t.element_map("name").collect()
    )
    assert em == [(2, "person", "bob"), (4, "person", "dan")]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.value_map("nope")


def test_identity_coin_sample(pg):
    t0 = traversal(pg, "person")
    assert t0.identity() is t0
    # coin(1.0) keeps everything, coin(0.0) nothing; deterministic per seed
    assert t0.coin(1.0).count().collect()[0]["count"] == 4
    assert t0.coin(0.0).count().collect()[0]["count"] == 0
    a = sorted(r["v"] for r in t0.coin(0.5, seed=7).to_df().collect())
    b = sorted(r["v"] for r in t0.coin(0.5, seed=7).to_df().collect())
    assert a == b  # same seed, same sample
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t0.coin(1.5)
    # sample(n): exactly n, deterministic, a subset of the bag
    s = sorted(r["v"] for r in t0.sample(2, seed=3).to_df().collect())
    assert len(s) == 2 and set(s) <= {1, 2, 3, 4}
    assert s == sorted(r["v"] for r in t0.sample(2, seed=3).to_df().collect())


def test_order_by_property(pg):
    got = [
        r["v"]
        for r in traversal(pg, "person").order_by(prop="name", desc=True).to_df().collect()
    ]
    assert got == [4, 3, 2, 1]  # dan, cat, bob, ann
    got_asc = [
        r["v"] for r in traversal(pg, "person").order_by(prop="age").to_df().collect()
    ]
    assert got_asc[-1] == 3  # cat(45) last; 27-ties first in some order
    assert set(got_asc[:2]) == {2, 4}


def test_match_not_pattern(pg):
    """match(..., not(pattern)): 1-hop pairs with no edge back (the
    reference's negation binder, supported_gremlin_steps.md:544)."""
    from graphscope_spark.traversal import match_patterns, traversal as trav

    p1 = trav(pg, "person").as_("a").out("knows").as_("b")
    p_back = trav(pg, "person").as_("b").out("knows").as_("a")
    got = sorted(
        (r["a"], r["b"])
        for r in match_patterns(p1, anti=(p_back,)).select("a", "b").collect()
    )
    # knows: 1->2, 2->3, 3->1, 1->3, 4->1; mutual pairs: (1,3)/(3,1). Non-mutual:
    assert got == [(1, 2), (2, 3), (4, 1)]
    import pytest as _pytest

    p_far = trav(pg, "person").as_("x").out("knows").as_("y")
    with _pytest.raises(ValueError):
        match_patterns(p1, anti=(p_far,))


def test_repeat_until_and_times(pg):
    """repeat(out).until(pred): do-while exits with bag multiplicity;
    repeat(out).times(n): pure n-hop expansion; emit adds intermediates."""
    # times only == 2-hop expansion (bag)
    t2 = traversal(pg, "person").repeat(lambda t: t.out("knows"), times=2)
    manual = traversal(pg, "person").out("knows").out("knows")
    assert sorted(r.v for r in t2.frame.collect()) == sorted(
        r.v for r in manual.frame.collect()
    )
    # until: every exiting traverser satisfies the predicate (age == 27)
    tu = traversal(pg, "person").repeat(
        lambda t: t.out("knows"), times=3, until=("age", P.eq(27))
    )
    ages = {r.age for r in tu.values("age").collect()}
    assert ages <= {27} and ages
    # first-hop exits: ann->bob(27), cat->... ; every exit head is bob or dan
    heads = {r.v for r in tu.frame.collect()}
    assert heads <= {2, 4}
    # emit includes intermediates -> at least as many traversers as plain
    te = traversal(pg, "person").repeat(
        lambda t: t.out("knows"), times=2, emit=True
    )
    assert te.frame.count() >= t2.frame.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        traversal(pg, "person").repeat(lambda t: t.out("knows"))


def test_repeat_emit_until_no_double_count(pg):
    """emit + until together: an exiting traverser appears exactly ONCE
    (TinkerPop repeat().until().emit() — emit applies to the traversers
    that keep looping; the until branch is the only exit). Hand-traced on
    the toy graph, knows = 1→2, 2→3, 3→1, 1→3, 4→1, age 27 = {2, 4}:

    round 1 bag {2,3,3,1,1}: exit [2], emit survivors [3,3,1,1]
    round 2 from survivors → {1,1,2,3,2,3}: exit [2,2], emit [1,1,3,3]
    total = [2] + [3,3,1,1] + [2,2] + [1,1,3,3] (11 rows)."""
    t = traversal(pg, "person").repeat(
        lambda t: t.out("knows"), times=2, until=("age", P.eq(27)), emit=True
    )
    heads = sorted(r.v for r in t.frame.collect())
    assert heads == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3]
