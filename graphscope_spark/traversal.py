"""GIE-lite: a Gremlin-style traversal surface over the property graph.

GraphScope's second engine (GIE, `interactive_engine/`) executes Gremlin
traversals; its supported step inventory is
`docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:25-570` —
V/E sources, out/in/both expands, has/is/where filters, values projections,
count/group/groupCount aggregates, order/limit, dedup, and the PathExpand
sugar (`out('1..3')`). SURVEY.md §2.9 places the full engine out of scope;
this module covers the step kernel those traversals compile down to,
re-expressed the Spark-first way: a traversal IS a lazily-built DataFrame
join chain, so Catalyst owns planning (predicate pushdown into the vertex
scans, broadcast of small frontiers, AQE everywhere) and the same traversal
runs unchanged at any scale.

Semantics notes (matching TinkerPop):

* traversers are a BAG — ``out()`` emits one row per edge, duplicates
  preserved; ``dedup()`` collapses them (Gremlin's own step).
* ``has`` on a hop head resolves properties from the head's vertex label
  frame (a join the optimizer turns into a semi-join when only filtering).
* ``path_expand(lo, hi)`` = union of the lo..hi-hop frontiers with a
  ``hops`` column — GIE's PathExpand sugar, BFS-unrolled (bounded).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphscope_spark.property_graph import PropertyGraph


@dataclass(frozen=True)
class _Pred:
    """A deferred predicate: a function Column -> boolean Column, applied by
    ``has``/``is_`` to whichever property column the step resolves."""

    fn: object

    def __call__(self, col: Column) -> Column:
        return self.fn(col)


class P:
    """Gremlin's predicate vocabulary for ``has(key, P.xxx(...))`` — the
    reference documents the full set at
    docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:147-170.
    Every predicate compiles to a single Catalyst expression, so it pushes
    into the vertex-property scan like any native filter."""

    @staticmethod
    def eq(v) -> _Pred:
        return _Pred(lambda c: c == F.lit(v))

    @staticmethod
    def neq(v) -> _Pred:
        return _Pred(lambda c: c != F.lit(v))

    @staticmethod
    def gt(v) -> _Pred:
        return _Pred(lambda c: c > F.lit(v))

    @staticmethod
    def lt(v) -> _Pred:
        return _Pred(lambda c: c < F.lit(v))

    @staticmethod
    def gte(v) -> _Pred:
        return _Pred(lambda c: c >= F.lit(v))

    @staticmethod
    def lte(v) -> _Pred:
        return _Pred(lambda c: c <= F.lit(v))

    @staticmethod
    def within(vals) -> _Pred:
        vals = list(vals)
        return _Pred(lambda c: c.isin(vals))

    @staticmethod
    def without(vals) -> _Pred:
        vals = list(vals)
        return _Pred(lambda c: ~c.isin(vals))

    @staticmethod
    def inside(lo, hi) -> _Pred:
        """Exclusive on both ends (TinkerPop: lo < x < hi)."""
        return _Pred(lambda c: (c > F.lit(lo)) & (c < F.lit(hi)))

    @staticmethod
    def outside(lo, hi) -> _Pred:
        return _Pred(lambda c: (c < F.lit(lo)) | (c > F.lit(hi)))

    @staticmethod
    def not_(p: "_Pred") -> _Pred:
        return _Pred(lambda c: ~p(c))


class TextP:
    """Gremlin's text predicates (supported_gremlin_steps.md:166-171)."""

    @staticmethod
    def starting_with(s: str) -> _Pred:
        return _Pred(lambda c: c.startswith(s))

    @staticmethod
    def ending_with(s: str) -> _Pred:
        return _Pred(lambda c: c.endswith(s))

    @staticmethod
    def containing(s: str) -> _Pred:
        return _Pred(lambda c: c.contains(s))

    @staticmethod
    def not_starting_with(s: str) -> _Pred:
        return _Pred(lambda c: ~c.startswith(s))

    @staticmethod
    def not_ending_with(s: str) -> _Pred:
        return _Pred(lambda c: ~c.endswith(s))

    @staticmethod
    def not_containing(s: str) -> _Pred:
        return _Pred(lambda c: ~c.contains(s))


def _resolve_triple(
    pg: PropertyGraph, edge_label: str | None, head: str | None, end: int = 0
):
    """Pick the (src,edge,dst) triple matching ``edge_label`` whose ``end``
    endpoint (0=src for out/both, 2=dst for in) is the current head label
    (or any, if the head is unknown)."""
    cands = [
        k
        for k in pg.edges
        if (edge_label is None or k[1] == edge_label)
        and (head is None or k[end] == head)
    ]
    if not cands:
        raise ValueError(f"no edge triple matches label={edge_label!r} from {head!r}")
    if len(cands) > 1:
        raise ValueError(f"ambiguous edge label {edge_label!r}: {cands} — name it")
    return cands[0]


@dataclass(frozen=True)
class Traversal:
    """Immutable builder: every step returns a new Traversal whose ``frame``
    has a ``v`` column (current vertex id) plus any carried columns
    (``as_`` path aliases are carried as ``p_<name>`` columns)."""

    pg: PropertyGraph
    frame: DataFrame
    head_label: str | None  # vertex label of `v`, when known
    aliases: tuple = ()  # ((name, vertex_label_or_None), ...) from as_()

    # -- expand steps -------------------------------------------------------

    def _hop(self, edge_label: str | None, direction: str) -> "Traversal":
        carried = [c for c in self.frame.columns if c != "v"]
        if direction in ("out", "in"):
            trip = _resolve_triple(
                self.pg, edge_label, self.head_label, end=2 if direction == "in" else 0
            )
            e = self.pg.edges[trip].select("src", "dst")
            if direction == "out":
                joined = self.frame.join(e, self.frame["v"] == e["src"])
                nxt, lbl = F.col("dst"), trip[2]
            else:
                joined = self.frame.join(e, self.frame["v"] == e["dst"])
                nxt, lbl = F.col("src"), trip[0]
            return replace(
                self, frame=joined.select(nxt.alias("v"), *carried), head_label=lbl
            )
        # both(): resolve each direction independently — the head may match
        # a label-asymmetric triple at only ONE endpoint, and reversing rows
        # joined on the other endpoint's id space would produce spurious
        # traversers when vid ranges overlap across vertex labels.
        def _cands(end: int):
            return [
                k
                for k in self.pg.edges
                if (edge_label is None or k[1] == edge_label)
                and (self.head_label is None or k[end] == self.head_label)
            ]

        out_c, in_c = _cands(0), _cands(2)
        if not out_c and not in_c:
            raise ValueError(
                f"no edge triple matches label={edge_label!r} at either "
                f"endpoint of {self.head_label!r}"
            )
        if len(out_c) > 1 or len(in_c) > 1:
            raise ValueError(
                f"ambiguous edge label {edge_label!r}: {out_c + in_c} — name it"
            )
        frames, labels = [], []
        if out_c:
            e = self.pg.edges[out_c[0]].select("src", "dst")
            frames.append(
                self.frame.join(e, self.frame["v"] == e["src"]).select(
                    F.col("dst").alias("v"), *carried
                )
            )
            labels.append(out_c[0][2])
        if in_c:
            e = self.pg.edges[in_c[0]].select("src", "dst")
            frames.append(
                self.frame.join(e, self.frame["v"] == e["dst"]).select(
                    F.col("src").alias("v"), *carried
                )
            )
            labels.append(in_c[0][0])
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        lbl = labels[0] if len(set(labels)) == 1 else None
        return replace(self, frame=out, head_label=lbl)

    def out(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "out")

    def in_(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "in")

    def both(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "both")

    def _edge_hop(self, edge_label: str | None, direction: str) -> "MidEdgeTraversal":
        """Shared body of outE/inE/bothE (reference Expand inventory,
        docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:46-95):
        traversers become INCIDENT EDGES, carrying every edge property
        column plus the path (``p_*``) columns, so edge-property filters
        (``has``) and endpoint moves (``outV/inV/otherV/bothV``) compose.
        ``_dir`` records which endpoint we arrived from — what otherV needs."""
        carried = [c for c in self.frame.columns if c != "v"]

        def _cands(end: int):
            return [
                k
                for k in self.pg.edges
                if (edge_label is None or k[1] == edge_label)
                and (self.head_label is None or k[end] == self.head_label)
            ]

        want_out = direction in ("out", "both")
        want_in = direction in ("in", "both")
        out_c = _cands(0) if want_out else []
        in_c = _cands(2) if want_in else []
        if not out_c and not in_c:
            raise ValueError(
                f"no edge triple matches label={edge_label!r} from "
                f"{self.head_label!r} ({direction})"
            )
        if len(out_c) > 1 or len(in_c) > 1:
            raise ValueError(
                f"ambiguous edge label {edge_label!r}: {out_c + in_c} — name it"
            )
        frames, trips, prop_sets = [], [], []
        if out_c:
            e = self.pg.edges[out_c[0]]
            props = [c for c in e.columns if c not in ("src", "dst")]
            frames.append(
                self.frame.join(e, self.frame["v"] == e["src"]).select(
                    "src", "dst", *props, F.lit("out").alias("_dir"), *carried
                )
            )
            trips.append(out_c[0])
            prop_sets.append(props)
        if in_c:
            e = self.pg.edges[in_c[0]]
            props = [c for c in e.columns if c not in ("src", "dst")]
            frames.append(
                self.frame.join(e, self.frame["v"] == e["dst"]).select(
                    "src", "dst", *props, F.lit("in").alias("_dir"), *carried
                )
            )
            trips.append(in_c[0])
            prop_sets.append(props)
        props = [p for p in prop_sets[0] if all(p in s for s in prop_sets)]
        if len(frames) == 2 and set(frames[0].columns) != set(frames[1].columns):
            # label-asymmetric bothE over triples with different prop sets:
            # keep the shared columns (src/dst/_dir/path always survive)
            shared = [c for c in frames[0].columns if c in set(frames[1].columns)]
            frames = [f.select(*shared) for f in frames]
        frame = frames[0]
        for f in frames[1:]:
            frame = frame.unionByName(f)
        out_trip = trips[0] if out_c else None
        in_trip = trips[-1] if in_c else None
        return MidEdgeTraversal(
            pg=self.pg,
            frame=frame,
            out_trip=out_trip,
            in_trip=in_trip,
            aliases=self.aliases,
            props=tuple(props),
        )

    def out_e(self, edge_label: str | None = None) -> "MidEdgeTraversal":
        """``outE('links')`` — map each head to its outgoing incident edges."""
        return self._edge_hop(edge_label, "out")

    def in_e(self, edge_label: str | None = None) -> "MidEdgeTraversal":
        """``inE('links')`` — map each head to its incoming incident edges."""
        return self._edge_hop(edge_label, "in")

    def both_e(self, edge_label: str | None = None) -> "MidEdgeTraversal":
        """``bothE('links')`` — incident edges in either direction."""
        return self._edge_hop(edge_label, "both")

    def path_expand(
        self, lo: int, hi: int, edge_label: str | None = None
    ) -> "Traversal":
        """GIE PathExpand `out('lo..hi')`: union of the lo..hi-hop bags with
        a ``hops`` column. Bounded unrolling — each hop is one join."""
        if not (0 <= lo <= hi):
            raise ValueError("need 0 <= lo <= hi")
        cur, parts = self, []
        for h in range(1, hi + 1):
            cur = cur._hop(edge_label, "out")
            if h >= lo:
                parts.append(cur.frame.withColumn("hops", F.lit(h)))
        if lo == 0:
            parts.insert(0, self.frame.withColumn("hops", F.lit(0)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return replace(self, frame=out, head_label=cur.head_label)

    # -- filter / project steps ----------------------------------------------

    def _props(self) -> DataFrame:
        if self.head_label is None:
            raise ValueError("head label unknown — property steps unavailable")
        return self.pg.vertices[self.head_label]

    _HAS_MISSING = object()

    def has(self, prop: str, value=_HAS_MISSING) -> "Traversal":
        """``has('name')`` (existence) / ``has('lang', 'en')`` (equality) /
        ``has('age', P.gt(10))`` / ``has('name', TextP.containing('ar'))`` /
        ``has('n', Column predicate)`` — the reference's has() forms
        (supported_gremlin_steps.md:140-199)."""
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        if value is Traversal._HAS_MISSING:
            pred = F.col(prop).isNotNull()
        elif isinstance(value, _Pred):
            pred = value(F.col(prop))
        elif isinstance(value, Column):
            pred = value
        else:
            pred = F.col(prop) == F.lit(value)
        keep = p.where(pred).select("v")
        return replace(self, frame=self.frame.join(keep, "v"))

    def has_not(self, prop: str) -> "Traversal":
        """``hasNot('age')`` — keep traversers whose head lacks the property
        (null in the label frame)."""
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        keep = p.where(F.col(prop).isNull()).select("v")
        return replace(self, frame=self.frame.join(keep, "v"))

    def has_id(self, *ids) -> "Traversal":
        """``hasId(1, 2, 3)`` = ``g.V(1, 2, 3)``."""
        return replace(self, frame=self.frame.where(F.col("v").isin(list(ids))))

    def has_label(self, *labels: str) -> "Traversal":
        """``hasLabel('person')``: with one vertex frame per label, this is
        a set test on the (known) head label — identity if it matches, the
        empty bag otherwise."""
        if self.head_label is None:
            raise ValueError("head label unknown — hasLabel unavailable")
        if self.head_label in labels:
            return self
        return replace(self, frame=self.frame.where(F.lit(False)))

    def is_(self, value) -> "Traversal":
        """``is(P.gt(10))`` / ``is(5)`` — filter on the head id itself."""
        pred = (
            value(F.col("v"))
            if isinstance(value, _Pred)
            else (F.col("v") == F.lit(value))
        )
        return replace(self, frame=self.frame.where(pred))

    def values(self, prop: str) -> DataFrame:
        """Project the head's property — one row per traverser (bag)."""
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        return self.frame.join(p, "v").select(prop)

    def id_(self) -> DataFrame:
        """``id()`` projection — the head's vertex id, bag semantics."""
        return self.frame.select(F.col("v").alias("id"))

    def label_(self) -> DataFrame:
        """``label()`` projection — the head's vertex label."""
        if self.head_label is None:
            raise ValueError("head label unknown — label() unavailable")
        return self.frame.select(F.lit(self.head_label).alias("label"))

    def constant(self, value) -> DataFrame:
        """``constant(x)`` projection — x once per traverser."""
        return self.frame.select(F.lit(value).alias("constant"))

    def value_map(self, *props: str) -> DataFrame:
        """``valueMap('a','b')`` — one row per traverser with the named
        head properties as columns (all properties if none named).
        Relational shape: GIE returns a map per traverser; columns are the
        Spark-native equivalent and what select()/oracles compare."""
        frame_props = [c for c in self._props().columns if c != "vid"]
        cols = list(props) if props else frame_props
        missing = [c for c in cols if c not in frame_props]
        if missing:
            raise ValueError(f"unknown properties {missing}; have {frame_props}")
        p = self._props().select(F.col("vid").alias("v"), *cols)
        return self.frame.join(p, "v").select(*cols)

    def element_map(self, *props: str) -> DataFrame:
        """``elementMap(...)`` — id + label + the named properties."""
        if self.head_label is None:
            raise ValueError("head label unknown — elementMap unavailable")
        vm_cols = (
            list(props)
            if props
            else [c for c in self._props().columns if c != "vid"]
        )
        p = self._props().select(F.col("vid").alias("v"), *vm_cols)
        return self.frame.join(p, "v").select(
            F.col("v").alias("id"), F.lit(self.head_label).alias("label"), *vm_cols
        )

    def dedup(self) -> "Traversal":
        return replace(self, frame=self.frame.distinct())

    # -- path steps: as_ / select / where -------------------------------------

    def as_(self, name: str) -> "Traversal":
        """``as('a')`` — label the current head; carried through later hops
        as a ``p_<name>`` column (GIE models this the same way: path
        projection columns materialized into the traverser record,
        supported_gremlin_steps.md:281)."""
        if any(n == name for n, _ in self.aliases):
            raise ValueError(f"alias {name!r} already bound")
        return replace(
            self,
            frame=self.frame.withColumn(f"p_{name}", F.col("v")),
            aliases=self.aliases + ((name, self.head_label),),
        )

    def select(self, *names: str) -> DataFrame:
        """``select('a', 'b')`` — project the labeled path steps (one row
        per traverser, bag semantics). Column names = alias names."""
        bound = dict(self.aliases)
        for n in names:
            if n not in bound:
                raise ValueError(f"unknown alias {n!r}; bound: {sorted(bound)}")
        return self.frame.select(*[F.col(f"p_{n}").alias(n) for n in names])

    def select_head(self, name: str) -> "Traversal":
        """``select('a')`` used mid-traversal — re-focus the head on the
        labeled step (its vertex label is restored from the binding)."""
        bound = dict(self.aliases)
        if name not in bound:
            raise ValueError(f"unknown alias {name!r}; bound: {sorted(bound)}")
        carried = [c for c in self.frame.columns if c != "v"]
        return replace(
            self,
            frame=self.frame.select(F.col(f"p_{name}").alias("v"), *carried),
            head_label=bound[name],
        )

    def where(self, pred) -> "Traversal":
        """Cross-step predicate over the traverser record: a Column over
        ``v`` (current head) and ``p_<alias>`` columns, or a shorthand
        string ``'a'``/``'!a'`` for head ==/!= that alias (Gremlin's
        ``where(eq('a'))`` / ``where(neq('a'))``)."""
        if isinstance(pred, str):
            neg = pred.startswith("!")
            name = pred[1:] if neg else pred
            if all(n != name for n, _ in self.aliases):
                raise ValueError(f"unknown alias {name!r}")
            col = F.col(f"p_{name}")
            pred = (F.col("v") != col) if neg else (F.col("v") == col)
        return replace(self, frame=self.frame.where(pred))

    def union(self, *others: "Traversal") -> "Traversal":
        """``union(t1, t2)`` — bag union of traverser frames (the branches
        must carry the same columns, i.e. the same alias set)."""
        out = self.frame
        lbls = {self.head_label}
        for o in others:
            if set(o.frame.columns) != set(self.frame.columns):
                raise ValueError(
                    f"union branches carry different columns: "
                    f"{sorted(self.frame.columns)} vs {sorted(o.frame.columns)}"
                )
            out = out.unionByName(o.frame)
            lbls.add(o.head_label)
        return replace(
            self,
            frame=out,
            head_label=next(iter(lbls)) if len(lbls) == 1 else None,
        )

    def repeat(
        self,
        body,
        times: int | None = None,
        until: tuple | None = None,
        max_times: int = 20,
        emit: bool = False,
    ) -> "Traversal":
        """Gremlin ``repeat(body).times(n)`` / ``repeat(body).until(pred)``
        (+ ``emit()``) — the loop step (reference
        docs/interactive_engine/tinkerpop/supported_gremlin_steps.md, Loop
        section; PathExpand covers the fixed-hop special case, this is the
        general form).

        ``body`` is a callable ``Traversal -> Traversal`` (e.g.
        ``lambda t: t.out('links')``). Do-while semantics (TinkerPop's
        ``repeat().until()``): after each application, traversers whose
        head satisfies ``until = (prop, P-pred)`` EXIT with their current
        state; the rest loop, up to ``times`` (or ``max_times``)
        applications. ``emit=True`` additionally outputs every
        intermediate traverser. With no ``until``, traversers surviving
        ``times`` applications are the result. Traversers whose head
        property is NULL drop at the until-check (the ``has`` contract).
        Bounded unrolling — each application composes the body's joins
        into the one declarative plan; no driver round-trips."""
        if times is None and until is None:
            raise ValueError("repeat() needs times= and/or until=")
        bound = times if times is not None else max_times
        if bound < 1:
            raise ValueError(f"need at least one application, got {bound}")
        parts: list[DataFrame] = []
        cur = self
        for k in range(bound):
            cur = body(cur)
            if until is not None:
                # exiting traversers are output exactly ONCE (TinkerPop
                # repeat().until().emit(): emit applies to traversers that
                # keep looping; an until-satisfier leaves via the until
                # branch only — emitting the full post-body frame here
                # would double-count it)
                prop, pred = until
                parts.append(cur.has(prop, pred).frame)
                cur = cur.has(prop, P.not_(pred))
                if emit:
                    parts.append(cur.frame)
            elif emit and k < bound - 1:
                parts.append(cur.frame)
        if until is None:
            parts.append(cur.frame)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return replace(self, frame=out, head_label=cur.head_label)

    # -- GREMLIN_TO_SUBGRAPH ---------------------------------------------------

    def to_subgraph(self, edge_label: str | None = None):
        """Materialize the traversal result as a new simple graph
        (reference GREMLIN_TO_SUBGRAPH, `framework/dag_utils.py:1048`):
        the distinct heads induce a subgraph of the head label's edge
        triple, returned as a LinkGraph so any analytical app can run on
        it. Requires a same-label triple (src == dst == head)."""
        from graphscope_spark.graph import LinkGraph

        if self.head_label is None:
            raise ValueError("head label unknown — cannot induce a subgraph")
        trip = _resolve_triple(self.pg, edge_label, self.head_label, end=0)
        if trip[2] != self.head_label:
            raise ValueError(
                f"triple {trip} is not an endo-relation on {self.head_label!r}"
            )
        keep = self.frame.select(F.col("v").alias("vid")).distinct()
        verts = self.pg.vertices[self.head_label].join(keep, "vid", "semi")
        e = self.pg.edges[trip].select("src", "dst")
        edges = (
            e.join(keep.withColumnRenamed("vid", "src"), "src", "semi")
            .join(keep.withColumnRenamed("vid", "dst"), "dst", "semi")
            .select("src", "dst")
        )
        return LinkGraph(
            verts.select("vid"), edges, self.pg.num_partitions
        )

    def limit(self, n: int) -> "Traversal":
        return replace(self, frame=self.frame.limit(n))

    def identity(self) -> "Traversal":
        """``identity()`` — maps each traverser to itself
        (supported_gremlin_steps.md:558)."""
        return self

    def coin(self, probability: float, seed: int = 42) -> "Traversal":
        """``coin(p)`` — biased coin-toss filter
        (supported_gremlin_steps.md:493). Spark rendering: a deterministic
        per-traverser hash in [0,1) compared to p, so the same seed yields
        the same sample at any parallelism (Gremlin's coin is nondeterministic;
        determinism is what makes the step testable and resumable)."""
        if not 0.0 <= probability <= 1.0:
            raise ValueError("probability must be in [0, 1]")
        u = (
            F.pmod(F.xxhash64(F.col("v"), F.lit(seed)), F.lit(1_000_000_007))
            / F.lit(1_000_000_007.0)
        )
        return replace(self, frame=self.frame.where(u < F.lit(probability)))

    def sample(self, n: int, seed: int = 42) -> "Traversal":
        """``sample(n)`` — n deterministic pseudo-random traversers: order
        by a per-row hash, take n (one global top-n, no full sort — Spark
        plans orderBy+limit as TakeOrderedAndProject)."""
        h = F.xxhash64(F.col("v"), F.lit(seed))
        return replace(self, frame=self.frame.orderBy(h).limit(n))

    def order_by(
        self, col: str = "v", desc: bool = False, prop: str | None = None
    ) -> "Traversal":
        """``order().by()`` / ``order().by('name', desc)`` — order by a
        frame column or by a head property (supported_gremlin_steps.md:462)."""
        if prop is not None:
            p = self._props().select(F.col("vid").alias("v"), F.col(prop))
            joined = self.frame.join(p, "v")
            c = F.col(prop).desc() if desc else F.col(prop).asc()
            ordered = joined.orderBy(c).drop(prop)
            return replace(self, frame=ordered)
        c = F.col(col).desc() if desc else F.col(col).asc()
        return replace(self, frame=self.frame.orderBy(c))

    # -- aggregate steps ------------------------------------------------------

    def count(self) -> DataFrame:
        return self.frame.agg(F.count("*").alias("count"))

    def group_count(self, prop: str | None = None) -> DataFrame:
        """groupCount(): by vertex id, or by a head property."""
        if prop is None:
            return self.frame.groupBy(F.col("v").alias("key")).agg(
                F.count("*").alias("count")
            )
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        return (
            self.frame.join(p, "v")
            .groupBy(F.col(prop).alias("key"))
            .agg(F.count("*").alias("count"))
        )

    def _values_agg(self, prop: str, agg) -> DataFrame:
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        return self.frame.join(p, "v").agg(agg(F.col(prop)).alias(agg.__name__))

    def sum_(self, prop: str) -> DataFrame:
        """Gremlin ``values(p).sum()`` — bag semantics (each traverser
        contributes; supported_gremlin_steps.md aggregate section)."""
        return self._values_agg(prop, F.sum)

    def min_(self, prop: str) -> DataFrame:
        return self._values_agg(prop, F.min)

    def max_(self, prop: str) -> DataFrame:
        return self._values_agg(prop, F.max)

    def mean_(self, prop: str) -> DataFrame:
        return self._values_agg(prop, F.mean)

    def group(self, key_prop: str, value_prop: str | None = None) -> DataFrame:
        """Gremlin ``group().by(key).by(values(v).fold())`` — keyed
        collection; the fold lands as a sorted array column (deterministic
        for oracle comparison)."""
        cols = [key_prop] + ([value_prop] if value_prop else [])
        p = self._props().select(F.col("vid").alias("v"), *cols)
        j = self.frame.join(p, "v")
        val = F.col(value_prop) if value_prop else F.col("v")
        return j.groupBy(F.col(key_prop).alias("key")).agg(
            F.sort_array(F.collect_list(val)).alias("values")
        )

    def fold(self) -> "FoldedTraversal":
        """``fold()`` (reference supported_gremlin_steps.md Aggregate
        section): barrier — collect the traverser bag into ONE list
        traverser. Spark rendering: a single-row sorted array (sorted so
        the fold is deterministic at any parallelism)."""
        return FoldedTraversal(
            pg=self.pg,
            frame=self.frame.agg(F.sort_array(F.collect_list("v")).alias("folded")),
            head_label=self.head_label,
        )

    def path(self) -> DataFrame:
        """``path()`` (reference lists it under To-be-Supported,
        supported_gremlin_steps.md:934): the traverser's path history as an
        array column over the LABELED steps (``as_`` aliases, in binding
        order) plus the current head — the relational rendering of GIE's
        path, which materializes the same alias columns."""
        cols = [F.col(f"p_{n}") for n, _ in self.aliases] + [F.col("v")]
        return self.frame.select(F.array(*cols).alias("path"))

    def coalesce_(self, *branches) -> "Traversal":
        """``coalesce(b1, b2, ...)`` — per start traverser, the first branch
        that yields any traverser wins; later branches only fire for
        traversers every earlier branch missed. Each branch is a function
        Traversal -> Traversal. Spark shape: tag each start traverser with a
        content hash of its record, run every branch from the tagged frame,
        anti-join branch k's starts against branches 1..k-1's matched tags,
        union — set algebra, no per-traverser control flow. The tag is a
        CONTENT hash (not monotonically_increasing_id, whose values can
        shift between re-evaluations of the same plan): identical traverser
        records always take identical branches, so collapsing them onto one
        tag for the anti-join preserves bag semantics exactly."""
        if not branches:
            raise ValueError("coalesce needs at least one branch")
        tag = F.xxhash64(*[F.col(c) for c in self.frame.columns])
        tagged = replace(self, frame=self.frame.withColumn("_tid", tag))
        outs = []
        matched: DataFrame | None = None
        lbls = set()
        for fn in branches:
            src = tagged
            if matched is not None:
                src = replace(
                    tagged,
                    frame=tagged.frame.join(matched, "_tid", "anti"),
                )
            res = fn(src)
            outs.append(res.frame)
            lbls.add(res.head_label)
            got = res.frame.select("_tid").distinct()
            matched = got if matched is None else matched.unionByName(got).distinct()
        out = outs[0]
        for f in outs[1:]:
            if set(f.columns) != set(out.columns):
                raise ValueError("coalesce branches carry different columns")
            out = out.unionByName(f)
        return replace(
            self,
            frame=out.drop("_tid"),
            head_label=next(iter(lbls)) if len(lbls) == 1 else None,
        )

    def optional(self, branch) -> "Traversal":
        """``optional(step)`` = coalesce(step, identity): traversers the
        branch misses pass through unchanged."""
        return self.coalesce_(branch, lambda t: t)

    def to_df(self) -> DataFrame:
        return self.frame


@dataclass(frozen=True)
class FoldedTraversal:
    """The list traverser ``fold()`` produces: one row, one array column."""

    pg: PropertyGraph
    frame: DataFrame
    head_label: str | None

    def unfold(self) -> Traversal:
        """``unfold()`` — explode the list back into a linear bag
        (reference To-be-Supported, supported_gremlin_steps.md:941)."""
        return Traversal(
            pg=self.pg,
            frame=self.frame.select(F.explode("folded").alias("v")),
            head_label=self.head_label,
        )

    def to_df(self) -> DataFrame:
        return self.frame


def match_patterns(*patterns: Traversal, anti: tuple = ()) -> Traversal:
    """Gremlin ``match(p1, p2, ...)`` (reference
    docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:531):
    conjunctive pattern matching — every pattern is itself a Traversal whose
    ``as_`` aliases name the pattern variables, and the match result is the
    set of alias bindings satisfying ALL patterns simultaneously.
    ``anti`` patterns are Gremlin's ``match(..., not(pattern))`` form
    (supported_gremlin_steps.md:544): bindings matching ANY anti pattern are
    excluded — an anti-join on the shared aliases.

    Spark shape: each pattern's traverser frame is projected to its alias
    columns (set semantics per binding tuple, the conjunctive-query model
    GIE compiles match to) and the frames are inner-joined on shared
    aliases — a multi-way relational join Catalyst/AQE is free to reorder,
    which IS the scale story: pattern matching over 10^11 edges degenerates
    to the same shuffle-join plans as any analytical query, no backtracking
    engine needed. The head re-focuses on the first pattern's first alias;
    ``select``/``where``/further hops compose as usual."""
    if not patterns:
        raise ValueError("match needs at least one pattern")
    alias_labels: dict[str, str | None] = {}
    frames = []
    for p in patterns:
        cols = [c for c in p.frame.columns if c.startswith("p_")]
        if not cols:
            raise ValueError("every match pattern must bind >= 1 alias (as_)")
        frames.append(p.frame.select(*cols).distinct())
        for n, lbl in p.aliases:
            alias_labels.setdefault(n, lbl)
    out, bound = frames[0], set(frames[0].columns)
    for f in frames[1:]:
        shared = sorted(bound & set(f.columns))
        if not shared:
            raise ValueError(
                "match pattern shares no alias with the preceding patterns "
                f"(bound: {sorted(c[2:] for c in bound)})"
            )
        out = out.join(f, shared)
        bound |= set(f.columns)
    for a in anti:
        cols = [c for c in a.frame.columns if c.startswith("p_")]
        shared = sorted(bound & set(cols))
        if not shared:
            raise ValueError("anti pattern shares no alias with the match")
        out = out.join(a.frame.select(*shared).distinct(), shared, "anti")
    lead = patterns[0].aliases[0][0]
    return Traversal(
        pg=patterns[0].pg,
        frame=out.withColumn("v", F.col(f"p_{lead}")),
        head_label=alias_labels[lead],
        aliases=tuple(alias_labels.items()),
    )


def traversal(pg: PropertyGraph, vertex_label: str | None = None) -> Traversal:
    """``g.V()`` / ``g.V().hasLabel(l)`` source step."""
    if vertex_label is None:
        if len(pg.vertices) != 1:
            raise ValueError("multiple vertex labels — name one")
        vertex_label = next(iter(pg.vertices))
    frame = pg.vertices[vertex_label].select(F.col("vid").alias("v"))
    return Traversal(pg=pg, frame=frame, head_label=vertex_label)


@dataclass(frozen=True)
class MidEdgeTraversal:
    """Mid-chain edge traversers produced by ``outE``/``inE``/``bothE``
    (reference docs/interactive_engine/tinkerpop/supported_gremlin_steps.md:46-95).
    ``frame`` carries (src, dst, <edge props…>, _dir, <p_* path columns>);
    ``_dir`` ∈ {'out','in'} marks which endpoint the traverser arrived from,
    which is exactly the path history ``otherV()`` consults. Endpoint moves
    return vertex Traversals that keep the path columns, so ``as_``/``select``
    compose across the edge detour."""

    pg: PropertyGraph
    frame: DataFrame
    out_trip: tuple | None  # triple matched in the out direction
    in_trip: tuple | None  # triple matched in the in direction
    aliases: tuple = ()
    props: tuple = ()  # edge property column names (explicit — a property
    # named like a path column must still resolve)

    def _prop_col(self, prop: str) -> str:
        if prop not in self.props:
            raise ValueError(f"unknown edge property {prop!r}; have {list(self.props)}")
        return prop

    def has(self, prop: str, value=Traversal._HAS_MISSING) -> "MidEdgeTraversal":
        """``outE().has('weight', P.gt(10))`` — edge-property filter; the
        full has() predicate vocabulary (existence / literal / P / TextP /
        raw Column), one pushed Catalyst filter."""
        c = F.col(self._prop_col(prop))
        if value is Traversal._HAS_MISSING:
            pred = c.isNotNull()
        elif isinstance(value, _Pred):
            pred = value(c)
        elif isinstance(value, Column):
            pred = value
        else:
            pred = c == F.lit(value)
        return replace(self, frame=self.frame.where(pred))

    def values(self, prop: str) -> DataFrame:
        """Project an edge property — one row per edge traverser (bag)."""
        return self.frame.select(self._prop_col(prop))

    def _to_vertex(self, v_col: Column, label: str | None) -> Traversal:
        carried = [c for c in self.frame.columns if c.startswith("p_")]
        return Traversal(
            pg=self.pg,
            frame=self.frame.select(v_col.alias("v"), *carried),
            head_label=label,
            aliases=self.aliases,
        )

    def _endpoint_label(self, end: int) -> str | None:
        lbls = {t[end] for t in (self.out_trip, self.in_trip) if t is not None}
        return next(iter(lbls)) if len(lbls) == 1 else None

    def out_v(self) -> Traversal:
        """``outV()`` — the tail (source) endpoint of each edge traverser."""
        return self._to_vertex(F.col("src"), self._endpoint_label(0))

    def in_v(self) -> Traversal:
        """``inV()`` — the head (destination) endpoint."""
        return self._to_vertex(F.col("dst"), self._endpoint_label(2))

    def other_v(self) -> Traversal:
        """``otherV()`` — the endpoint NOT traversed from (path history);
        ``bothE().otherV()`` ≡ ``both()``."""
        if self.out_trip is not None and self.in_trip is not None:
            lbl = (
                self.out_trip[2]
                if self.out_trip[2] == self.in_trip[0]
                else None
            )
        elif self.out_trip is not None:
            lbl = self.out_trip[2]
        else:
            lbl = self.in_trip[0]
        v = F.when(F.col("_dir") == "out", F.col("dst")).otherwise(F.col("src"))
        return self._to_vertex(v, lbl)

    def both_v(self) -> Traversal:
        """``bothV()`` — both endpoints (two vertex traversers per edge)."""
        a, b = self.out_v(), self.in_v()
        lbl = a.head_label if a.head_label == b.head_label else None
        return Traversal(
            pg=self.pg,
            frame=a.frame.unionByName(b.frame),
            head_label=lbl,
            aliases=self.aliases,
        )

    def dedup(self) -> "MidEdgeTraversal":
        return replace(self, frame=self.frame.distinct())

    def limit(self, n: int) -> "MidEdgeTraversal":
        return replace(self, frame=self.frame.limit(n))

    def count(self) -> DataFrame:
        return self.frame.agg(F.count("*").alias("count"))

    def to_df(self) -> DataFrame:
        return self.frame.drop("_dir")


@dataclass(frozen=True)
class EdgeTraversal:
    """``g.E()`` source (supported_gremlin_steps.md:25): traversers are
    edges — ``frame`` carries (src, dst, <edge props…>). ``out_v``/``in_v``
    move to an endpoint, yielding a vertex Traversal."""

    pg: PropertyGraph
    frame: DataFrame
    trip: tuple  # the (src_label, edge_label, dst_label) triple

    def has(self, prop: str, value=Traversal._HAS_MISSING) -> "EdgeTraversal":
        """Edge-property filter — same predicate vocabulary as the vertex
        ``has`` (existence / literal / P / TextP / raw Column)."""
        c = F.col(prop)
        if value is Traversal._HAS_MISSING:
            pred = c.isNotNull()
        elif isinstance(value, _Pred):
            pred = value(c)
        elif isinstance(value, Column):
            pred = value
        else:
            pred = c == F.lit(value)
        return replace(self, frame=self.frame.where(pred))

    def out_v(self) -> Traversal:
        """outV(): the source endpoint of each edge traverser."""
        return Traversal(
            pg=self.pg,
            frame=self.frame.select(F.col("src").alias("v")),
            head_label=self.trip[0],
        )

    def in_v(self) -> Traversal:
        """inV(): the destination endpoint of each edge traverser."""
        return Traversal(
            pg=self.pg,
            frame=self.frame.select(F.col("dst").alias("v")),
            head_label=self.trip[2],
        )

    def count(self) -> DataFrame:
        return self.frame.agg(F.count("*").alias("count"))

    def dedup(self) -> "EdgeTraversal":
        return replace(self, frame=self.frame.distinct())

    def limit(self, n: int) -> "EdgeTraversal":
        return replace(self, frame=self.frame.limit(n))

    def to_df(self) -> DataFrame:
        return self.frame


def edge_traversal(pg: PropertyGraph, edge_label: str | None = None) -> EdgeTraversal:
    """``g.E()`` / ``g.E().hasLabel(l)`` source step."""
    cands = [k for k in pg.edges if edge_label is None or k[1] == edge_label]
    if not cands:
        raise ValueError(f"no edge triple matches label={edge_label!r}")
    if len(cands) > 1:
        raise ValueError(f"ambiguous edge label {edge_label!r}: {cands} — name it")
    return EdgeTraversal(pg=pg, frame=pg.edges[cands[0]], trip=cands[0])
