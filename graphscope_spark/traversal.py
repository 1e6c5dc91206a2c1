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
    has a ``v`` column (current vertex id) plus any carried columns."""

    pg: PropertyGraph
    frame: DataFrame
    head_label: str | None  # vertex label of `v`, when known

    # -- expand steps -------------------------------------------------------

    def _hop(self, edge_label: str | None, direction: str) -> "Traversal":
        trip = _resolve_triple(
            self.pg, edge_label, self.head_label, end=2 if direction == "in" else 0
        )
        e = self.pg.edges[trip].select("src", "dst")
        if direction == "out":
            joined = self.frame.join(e, self.frame["v"] == e["src"])
            nxt, lbl = F.col("dst"), trip[2]
        elif direction == "in":
            joined = self.frame.join(e, self.frame["v"] == e["dst"])
            nxt, lbl = F.col("src"), trip[0]
        else:  # both
            sym = e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            joined = self.frame.join(sym, self.frame["v"] == sym["src"])
            nxt = F.col("dst")
            lbl = trip[2] if trip[0] == trip[2] else None
        carried = [c for c in self.frame.columns if c != "v"]
        out = joined.select(nxt.alias("v"), *carried)
        return replace(self, frame=out, head_label=lbl)

    def out(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "out")

    def in_(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "in")

    def both(self, edge_label: str | None = None) -> "Traversal":
        return self._hop(edge_label, "both")

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

    def has(self, prop: str, value) -> "Traversal":
        """``has('lang', 'en')`` or ``has('n', Column predicate)``."""
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        pred = value if isinstance(value, Column) else (F.col(prop) == F.lit(value))
        keep = p.where(pred).select("v")
        return replace(self, frame=self.frame.join(keep, "v"))

    def values(self, prop: str) -> DataFrame:
        """Project the head's property — one row per traverser (bag)."""
        p = self._props().select(F.col("vid").alias("v"), F.col(prop))
        return self.frame.join(p, "v").select(prop)

    def dedup(self) -> "Traversal":
        return replace(self, frame=self.frame.distinct())

    def limit(self, n: int) -> "Traversal":
        return replace(self, frame=self.frame.limit(n))

    def order_by(self, col: str = "v", desc: bool = False) -> "Traversal":
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

    def to_df(self) -> DataFrame:
        return self.frame


def traversal(pg: PropertyGraph, vertex_label: str | None = None) -> Traversal:
    """``g.V()`` / ``g.V().hasLabel(l)`` source step."""
    if vertex_label is None:
        if len(pg.vertices) != 1:
            raise ValueError("multiple vertex labels — name one")
        vertex_label = next(iter(pg.vertices))
    frame = pg.vertices[vertex_label].select(F.col("vid").alias("v"))
    return Traversal(pg=pg, frame=frame, head_label=vertex_label)
