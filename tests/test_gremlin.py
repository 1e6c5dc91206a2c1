"""String-Gremlin front end (graphscope_spark.gremlin) — textual queries
must produce exactly what the equivalent programmatic Traversal chain
produces (the parser adds NO execution semantics of its own)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphscope_spark.gremlin import GremlinParseError, gremlin
from graphscope_spark.property_graph import PropertyGraph
from graphscope_spark.traversal import P, TextP, traversal


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


def test_source_filter_values(pg):
    got = gremlin(pg, "g.V().hasLabel('person').has('age', 27).values('name')")
    want = traversal(pg, "person").has("age", 27).values("name")
    assert _rows(got) == _rows(want) == [("bob",), ("dan",)]


def test_predicates(pg):
    got = gremlin(pg, "g.V().hasLabel('person').has('age', gt(30)).count()")
    assert got.collect()[0]["count"] == 2
    got = gremlin(
        pg, "g.V().hasLabel('person').has('age', P.within(27, 45)).count()"
    )
    assert got.collect()[0]["count"] == 3
    got = gremlin(
        pg,
        "g.V().hasLabel('person').has('name', TextP.containing('a')).values('name')",
    )
    assert _rows(got) == [("ann",), ("cat",), ("dan",)]
    got = gremlin(
        pg, "g.V().hasLabel('person').has('age', P.not(eq(27))).count()"
    )
    assert got.collect()[0]["count"] == 2


def test_hops_and_dedup(pg):
    got = gremlin(pg, "g.V().hasLabel('person').out('knows').out('knows').count()")
    assert got.collect()[0]["count"] == 7
    got = gremlin(
        pg, "g.V().hasLabel('person').out('knows').out('knows').dedup().count()"
    )
    assert got.collect()[0]["count"] == 3
    got = gremlin(pg, "g.V().hasLabel('person').both('knows').count()")
    want = traversal(pg, "person").both("knows").count()
    assert got.collect()[0]["count"] == want.collect()[0]["count"]


def test_v_with_ids_and_is(pg):
    got = gremlin(pg, "g.V(1, 4).hasLabel('person').values('name')")
    assert _rows(got) == [("ann",), ("dan",)]
    got = gremlin(pg, "g.V().hasLabel('person').is(P.gt(2)).id()")
    assert _rows(got) == [(3,), (4,)]


def test_edge_steps(pg):
    got = gremlin(pg, "g.V().hasLabel('person').outE('knows').has('since', gte(2021)).inV().id()")
    want = (
        traversal(pg, "person")
        .out_e("knows")
        .has("since", P.gte(2021))
        .in_v()
        .id_()
    )
    assert _rows(got) == _rows(want)


def test_aggregates(pg):
    got = gremlin(pg, "g.V().hasLabel('person').values('age').sum()")
    assert got.collect()[0]["sum"] == 31 + 27 + 45 + 27
    got = gremlin(pg, "g.V().hasLabel('person').values('age').mean()")
    assert abs(got.collect()[0]["mean"] - 32.5) < 1e-9
    got = gremlin(pg, "g.V().hasLabel('person').groupCount().by('age')")
    assert _rows(got) == [(27, 2), (31, 1), (45, 1)]
    got = gremlin(pg, "g.V().hasLabel('person').group().by('age').by('name')")
    want = traversal(pg, "person").group("age", "name")
    assert _rows(got) == _rows(want)


def test_order_limit(pg):
    got = gremlin(
        pg, "g.V().hasLabel('person').order().by('age', desc).limit(2).values('age')"
    )
    assert sorted(r["age"] for r in got.collect()) == [31, 45]


def test_as_select_where(pg):
    q = (
        "g.V().hasLabel('person').as('a').out('knows').out('knows')"
        ".where(neq('a')).as('b').select('a', 'b')"
    )
    got = gremlin(pg, q)
    want = (
        traversal(pg, "person")
        .as_("a")
        .out("knows")
        .out("knows")
        .where("!a")
        .as_("b")
        .select("a", "b")
    )
    assert _rows(got) == _rows(want)


def test_repeat_times_until_emit(pg):
    got = gremlin(
        pg, "g.V().hasLabel('person').repeat(out('knows')).times(2).count()"
    )
    assert got.collect()[0]["count"] == 7
    got = gremlin(
        pg,
        "g.V().hasLabel('person')"
        ".repeat(__.out('knows')).times(2).until(has('age', eq(27))).emit().count()",
    )
    want = (
        traversal(pg, "person")
        .repeat(lambda t: t.out("knows"), times=2, until=("age", P.eq(27)), emit=True)
        .count()
    )
    assert got.collect()[0]["count"] == want.collect()[0]["count"]


def test_union_coalesce_optional(pg):
    got = gremlin(
        pg, "g.V().hasLabel('person').union(out('knows'), in('knows')).count()"
    )
    t = traversal(pg, "person")
    want = t.out("knows").union(t.in_("knows")).count()
    assert got.collect()[0]["count"] == want.collect()[0]["count"]
    got = gremlin(
        pg,
        "g.V().hasLabel('person').coalesce(out('wrote'), out('knows')).count()",
    )
    want = t.coalesce_(
        lambda x: x.out("wrote"), lambda x: x.out("knows")
    ).count()
    assert got.collect()[0]["count"] == want.collect()[0]["count"]
    got = gremlin(
        pg, "g.V().hasLabel('person').optional(out('wrote')).count()"
    )
    want = t.optional(lambda x: x.out("wrote")).count()
    assert got.collect()[0]["count"] == want.collect()[0]["count"]


def test_projections(pg):
    got = gremlin(pg, "g.V().hasLabel('person').valueMap('name', 'age')")
    want = traversal(pg, "person").value_map("name", "age")
    assert _rows(got) == _rows(want)
    got = gremlin(pg, "g.V().hasLabel('person').has('age', 27).label()")
    assert {r["label"] for r in got.collect()} == {"person"}
    got = gremlin(pg, "g.V().hasLabel('person').constant(1).count()")
    assert got.collect()[0]["count"] == 4


def test_parse_errors(pg):
    for bad in (
        "V().count()",                        # no g.
        "g.V().hasLabel('person').frobnicate()",  # unknown step
        "g.V().hasLabel('person').has('age',",    # unterminated
        "g.V().hasLabel('person').where(gt(3))",  # unsupported where form
    ):
        with pytest.raises(GremlinParseError):
            gremlin(pg, bad)


def test_string_escapes_and_doubles(pg):
    got = gremlin(pg, 'g.V().hasLabel("person").has("name", "ann").id()')
    assert _rows(got) == [(1,)]


def test_union_of_projection_branches(pg):
    """union() whose branches end in projections: same-named columns union
    by name (3+ branches supported); mismatched columns raise."""
    got = gremlin(
        pg,
        "g.V().hasLabel('person').union(values('age'), values('age'), values('age')).count()",
    )
    assert got.collect()[0]["count"] == 12
    with pytest.raises(GremlinParseError):
        gremlin(
            pg,
            "g.V().hasLabel('person').union(values('age'), values('name'))",
        )
    with pytest.raises(GremlinParseError):
        gremlin(
            pg,
            "g.V().hasLabel('person').union(values('age'), out('knows'))",
        )


def test_fuzz_parser_matches_programmatic(pg):
    """Property-style fuzz: random valid step chains built from a small
    grammar must parse and produce exactly what the equivalent
    programmatic Traversal produces. Deterministic seed; each case is a
    real Spark run, so the sample count is kept modest."""
    import random

    rng = random.Random(20260821)
    hops = [
        (".out('knows')", lambda t: t.out("knows")),
        (".in('knows')", lambda t: t.in_("knows")),
        (".both('knows')", lambda t: t.both("knows")),
    ]
    filters = [
        (".has('age', gt(26))", lambda t: t.has("age", P.gt(26))),
        (".has('age', P.within(27, 31))", lambda t: t.has("age", P.within([27, 31]))),
        (".has('name', TextP.containing('a'))", lambda t: t.has("name", TextP.containing("a"))),
        (".dedup()", lambda t: t.dedup()),
        (".is(P.lt(4))", lambda t: t.is_(P.lt(4))),
    ]
    for _ in range(12):
        text = "g.V().hasLabel('person')"
        t = traversal(pg, "person")
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.5:
                frag, fn = rng.choice(hops)
            else:
                frag, fn = rng.choice(filters)
            text += frag
            t = fn(t)
        got = sorted(r["id"] for r in gremlin(pg, text + ".id()").collect())
        want = sorted(r["id"] for r in t.id_().collect())
        assert got == want, text
