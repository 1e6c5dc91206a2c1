"""NetworkX-compatible mutable graph layer (the reference's MODIFY_VERTICES
/ MODIFY_EDGES surface).

Reference semantics: `python/graphscope/nx/classes/graph.py:629-1042`
(add_node/add_nodes_from/remove_node/remove_nodes_from/add_edge/
add_edges_from/add_weighted_edges_from/remove_edge/remove_edges_from/
set_node_data/set_edge_data) over a DynamicFragment. NetworkX contracts
kept exactly:

* single-item ``remove_node`` / ``remove_edge`` raise ``KeyError`` when the
  target is absent; bulk ``remove_nodes_from`` / ``remove_edges_from``
  silently skip absent items;
* ``add_edge`` implicitly adds missing endpoints;
* repeated ``add_node``/``add_edge`` MERGE attribute dicts (later wins per
  key);
* removing a node removes its incident edges;
* undirected ``Graph`` stores one canonical row per edge and counts a
  self-loop twice in ``degree``.

Spark shape — this is NOT an adjacency dict. State is two DataFrames
(``vid, attrs map<string,string>`` / ``src, dst, attrs``); mutations buffer
driver-side (cheap python appends, exactly the single-row call pattern the
nx API produces) and FLUSH as batched unionByName / anti-join / full-join
``map_concat`` transforms the first time anything reads the graph, so a
burst of k mutations costs O(batches) Spark plans, not O(k). Attribute
merge uses ``map_concat`` under ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` —
the nx dict-update rule evaluated JVM-side. After every flush the two
frames are plan-truncated (``truncate_plan``), so arbitrarily long mutation
histories keep O(1) plan depth — the union/anti-join analog of the
reference's in-place DynamicFragment edits. Bulk paths accept DataFrames
(``add_edges_df`` / ``remove_nodes_df``) so a 10^9-row mutation never
transits the driver.

Node ids are 64-bit ints (the engine's vid domain); attribute values are
stored as strings (cast on write, parse on read) — the portable
lowest-common-denominator for the DuckDB oracle parity the gate needs.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.graph import LinkGraph

_V_SCHEMA = "vid long, attrs map<string,string>"
_E_SCHEMA = "src long, dst long, attrs map<string,string>"


def _attrs(d: dict) -> dict:
    return {str(k): str(v) for k, v in d.items()}


class Graph:
    """Mutable undirected simple graph with string-map attributes."""

    directed = False

    def __init__(self, spark: SparkSession, num_partitions: int = 32):
        self.spark = spark
        self.num_partitions = num_partitions
        self._v = spark.createDataFrame([], _V_SCHEMA)
        self._e = spark.createDataFrame([], _E_SCHEMA)
        self._ops: list[tuple[str, list]] = []  # (kind, payload) batches

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_dataframes(
        cls,
        vertices: DataFrame | None = None,
        edges: DataFrame | None = None,
        num_partitions: int = 32,
    ) -> "Graph":
        """Bulk constructor: ``vertices(vid[, attrs])`` and/or
        ``edges(src, dst[, attrs])``; endpoints absent from ``vertices`` are
        added implicitly (nx add_edge contract)."""
        if vertices is None and edges is None:
            raise ValueError("need vertices and/or edges")
        spark = (vertices if vertices is not None else edges).sparkSession
        g = cls(spark, num_partitions)
        empty_map = F.create_map().cast("map<string,string>")
        if edges is not None:
            e = edges.select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                (
                    F.col("attrs")
                    if "attrs" in edges.columns
                    else empty_map
                ).alias("attrs"),
            )
            if not cls.directed:
                e = e.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "attrs",
                )
            g._e = truncate_plan(
                e.groupBy("src", "dst").agg(F.first("attrs").alias("attrs"))
            )
        ep = g._e.select(F.col("src").alias("vid")).unionByName(
            g._e.select(F.col("dst").alias("vid"))
        )
        v = ep
        if vertices is not None:
            v = v.unionByName(vertices.select(F.col("vid").cast("long")))
        v = v.distinct().select("vid", empty_map.alias("attrs"))
        if vertices is not None and "attrs" in vertices.columns:
            v = (
                v.drop("attrs")
                .join(vertices.select("vid", "attrs"), "vid", "left")
                .select("vid", F.coalesce("attrs", empty_map).alias("attrs"))
            )
        g._v = truncate_plan(v)
        return g

    # -- mutation buffer ------------------------------------------------------

    def _push(self, kind: str, item) -> None:
        if self._ops and self._ops[-1][0] == kind:
            self._ops[-1][1].append(item)
        else:
            self._ops.append((kind, [item]))

    def _canon(self, u: int, v: int) -> tuple[int, int]:
        u, v = int(u), int(v)
        return (u, v) if self.directed or u <= v else (v, u)

    def _flush(self) -> None:
        if not self._ops:
            return
        ops, self._ops = self._ops, []
        dedup_saved = self.spark.conf.get("spark.sql.mapKeyDedupPolicy", None)
        self.spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        try:
            for kind, items in ops:
                getattr(self, f"_apply_{kind}")(items)
        finally:
            if dedup_saved is not None:
                self.spark.conf.set("spark.sql.mapKeyDedupPolicy", dedup_saved)
            else:
                self.spark.conf.unset("spark.sql.mapKeyDedupPolicy")
        self._v = truncate_plan(self._v)
        self._e = truncate_plan(self._e)

    @staticmethod
    def _merge_attr(old, new):
        empty = F.create_map().cast("map<string,string>")
        return F.map_concat(F.coalesce(old, empty), F.coalesce(new, empty))

    def _apply_add_nodes(self, items: list) -> None:
        merged: dict[int, dict] = {}
        for vid, attrs in items:
            merged.setdefault(vid, {}).update(attrs)
        new = self.spark.createDataFrame(
            [(v, a) for v, a in merged.items()], _V_SCHEMA
        )
        self._v = (
            self._v.withColumnRenamed("attrs", "_old")
            .join(new.withColumnRenamed("attrs", "_new"), "vid", "full")
            .select("vid", self._merge_attr(F.col("_old"), F.col("_new")).alias("attrs"))
        )

    def _apply_add_edges(self, items: list) -> None:
        merged: dict[tuple, dict] = {}
        for u, v, attrs in items:
            merged.setdefault(self._canon(u, v), {}).update(attrs)
        new = self.spark.createDataFrame(
            [(u, v, a) for (u, v), a in merged.items()], _E_SCHEMA
        )
        self._e = (
            self._e.withColumnRenamed("attrs", "_old")
            .join(new.withColumnRenamed("attrs", "_new"), ["src", "dst"], "full")
            .select(
                "src", "dst", self._merge_attr(F.col("_old"), F.col("_new")).alias("attrs")
            )
        )
        # nx contract: endpoints are added implicitly, existing attrs kept
        eps = sorted({w for uv in merged for w in uv})
        self._apply_add_nodes([(w, {}) for w in eps])

    def _apply_remove_nodes(self, items: list) -> None:
        gone = self.spark.createDataFrame([(int(v),) for v in items], "vid long")
        self._v = self._v.join(F.broadcast(gone), "vid", "anti")
        self._e = self._e.join(
            F.broadcast(gone.withColumnRenamed("vid", "src")), "src", "anti"
        ).join(F.broadcast(gone.withColumnRenamed("vid", "dst")), "dst", "anti")

    def _apply_remove_edges(self, items: list) -> None:
        gone = self.spark.createDataFrame(
            [self._canon(u, v) for u, v in items], "src long, dst long"
        )
        self._e = self._e.join(F.broadcast(gone), ["src", "dst"], "anti")

    # -- MODIFY_VERTICES ------------------------------------------------------

    def add_node(self, n: int, **attr) -> None:
        self._push("add_nodes", (int(n), _attrs(attr)))

    def add_nodes_from(self, nodes: Iterable, **attr) -> None:
        for n in nodes:
            if isinstance(n, tuple):
                n, d = n
                self._push("add_nodes", (int(n), {**_attrs(attr), **_attrs(d)}))
            else:
                self._push("add_nodes", (int(n), _attrs(attr)))

    def set_node_data(self, n: int, data: dict) -> None:
        if not self.has_node(n):
            raise KeyError(n)
        self._push("add_nodes", (int(n), _attrs(data)))

    def remove_node(self, n: int) -> None:
        if not self.has_node(n):
            raise KeyError(f"node {n} not in graph")
        self._push("remove_nodes", int(n))

    def remove_nodes_from(self, nodes: Iterable) -> None:
        for n in nodes:
            self._push("remove_nodes", int(n))

    def remove_nodes_df(self, vids: DataFrame) -> None:
        """Bulk distributed removal — never collects to the driver."""
        self._flush()
        gone = vids.select(F.col("vid").cast("long"))
        self._v = truncate_plan(self._v.join(gone, "vid", "anti"))
        self._e = truncate_plan(
            self._e.join(gone.withColumnRenamed("vid", "src"), "src", "anti").join(
                gone.withColumnRenamed("vid", "dst"), "dst", "anti"
            )
        )

    # -- MODIFY_EDGES ---------------------------------------------------------

    def add_edge(self, u: int, v: int, **attr) -> None:
        self._push("add_edges", (int(u), int(v), _attrs(attr)))

    def add_edges_from(self, ebunch: Iterable, **attr) -> None:
        for e in ebunch:
            if len(e) == 3:
                u, v, d = e
                self._push("add_edges", (int(u), int(v), {**_attrs(attr), **_attrs(d)}))
            else:
                u, v = e
                self._push("add_edges", (int(u), int(v), _attrs(attr)))

    def add_weighted_edges_from(self, ebunch: Iterable, weight: str = "weight") -> None:
        for u, v, w in ebunch:
            self._push("add_edges", (int(u), int(v), {weight: str(w)}))

    def add_edges_df(self, edges: DataFrame) -> None:
        """Bulk distributed edge add (``src, dst[, attrs]``) — endpoints
        added implicitly; existing edge attrs are REPLACED for edges in the
        batch (batch wins, the nx update rule applied set-wise)."""
        self._flush()
        empty_map = F.create_map().cast("map<string,string>")
        e = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            (F.col("attrs") if "attrs" in edges.columns else empty_map).alias("_new"),
        )
        if not self.directed:
            e = e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "_new",
            )
        e = e.groupBy("src", "dst").agg(F.first("_new").alias("_new"))
        dedup_saved = self.spark.conf.get("spark.sql.mapKeyDedupPolicy", None)
        self.spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        try:
            self._e = truncate_plan(
                self._e.withColumnRenamed("attrs", "_old")
                .join(e, ["src", "dst"], "full")
                .select(
                    "src",
                    "dst",
                    self._merge_attr(F.col("_old"), F.col("_new")).alias("attrs"),
                )
            )
            eps = (
                e.select(F.col("src").alias("vid"))
                .unionByName(e.select(F.col("dst").alias("vid")))
                .distinct()
            )
            self._v = truncate_plan(
                self._v.join(eps, "vid", "full").select(
                    "vid",
                    F.coalesce("attrs", F.create_map().cast("map<string,string>")).alias(
                        "attrs"
                    ),
                )
            )
        finally:
            if dedup_saved is not None:
                self.spark.conf.set("spark.sql.mapKeyDedupPolicy", dedup_saved)
            else:
                self.spark.conf.unset("spark.sql.mapKeyDedupPolicy")

    def set_edge_data(self, u: int, v: int, data: dict) -> None:
        if not self.has_edge(u, v):
            raise KeyError((u, v))
        self._push("add_edges", (int(u), int(v), _attrs(data)))

    def remove_edge(self, u: int, v: int) -> None:
        if not self.has_edge(u, v):
            raise KeyError(f"edge ({u}, {v}) not in graph")
        self._push("remove_edges", (int(u), int(v)))

    def remove_edges_from(self, ebunch: Iterable) -> None:
        for u, v in ebunch:
            self._push("remove_edges", (int(u), int(v)))

    # -- REPORT_GRAPH ---------------------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        self._flush()
        return self._v

    @property
    def edge_frame(self) -> DataFrame:
        self._flush()
        return self._e

    def nodes(self) -> DataFrame:
        return self.vertices

    def edges(self) -> DataFrame:
        return self.edge_frame

    def number_of_nodes(self) -> int:
        return self.vertices.count()

    order = number_of_nodes

    def number_of_edges(self) -> int:
        return self.edge_frame.count()

    def number_of_selfloops(self) -> int:
        return self.edge_frame.where(F.col("src") == F.col("dst")).count()

    def size(self, weight: str | None = None) -> float:
        if weight is None:
            return self.number_of_edges()
        s = self.edge_frame.agg(
            F.sum(F.coalesce(F.element_at("attrs", weight).cast("double"), F.lit(1.0)))
        ).collect()[0][0]
        return float(s or 0.0)

    def has_node(self, n: int) -> bool:
        self._flush()
        return not self._v.where(F.col("vid") == int(n)).isEmpty()

    def has_edge(self, u: int, v: int) -> bool:
        self._flush()
        a, b = self._canon(u, v)
        return not self._e.where(
            (F.col("src") == a) & (F.col("dst") == b)
        ).isEmpty()

    def get_edge_data(self, u: int, v: int, default=None):
        self._flush()
        a, b = self._canon(u, v)
        row = self._e.where((F.col("src") == a) & (F.col("dst") == b)).collect()
        return dict(row[0]["attrs"]) if row else default

    def get_node_data(self, n: int, default=None):
        self._flush()
        row = self._v.where(F.col("vid") == int(n)).collect()
        return dict(row[0]["attrs"]) if row else default

    def degree(self) -> DataFrame:
        """(vid, degree) for every node; self-loops count twice (nx rule)."""
        ends = self.edge_frame.select(F.col("src").alias("vid")).unionByName(
            self.edge_frame.select(F.col("dst").alias("vid"))
        )
        d = ends.groupBy("vid").agg(F.count("*").cast("long").alias("degree"))
        return self.vertices.select("vid").join(d, "vid", "left").select(
            "vid", F.coalesce("degree", F.lit(0)).cast("long").alias("degree")
        )

    def neighbors(self, n: int) -> DataFrame:
        self._flush()
        n = int(n)
        out = self._e.where(F.col("src") == n).select(F.col("dst").alias("vid"))
        if self.directed:
            return out.distinct()
        inn = self._e.where(F.col("dst") == n).select(F.col("src").alias("vid"))
        return out.unionByName(inn).where(F.col("vid") != n).distinct()

    # -- bridges to the analytical engine --------------------------------------

    def to_link_graph(self) -> LinkGraph:
        """Project to the analytical engine's LinkGraph (undirected graphs
        emit both directions, the TO_UNDIRECTED representation)."""
        e = self.edge_frame.select("src", "dst")
        if not self.directed:
            e = e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            ).distinct()
        e = e.repartition(
            self.num_partitions, F.pmod(F.col("src"), F.lit(self.num_partitions))
        )
        return LinkGraph(
            vertices=self.vertices.select("vid"),
            edges=e,
            num_partitions=self.num_partitions,
        )

    def copy(self) -> "Graph":
        self._flush()
        g = type(self)(self.spark, self.num_partitions)
        g._v, g._e = self._v, self._e
        return g

    def subgraph(self, nodes: Iterable) -> "Graph":
        self._flush()
        keep = self.spark.createDataFrame([(int(n),) for n in nodes], "vid long")
        g = type(self)(self.spark, self.num_partitions)
        g._v = self._v.join(F.broadcast(keep), "vid", "semi")
        g._e = self._e.join(
            F.broadcast(keep.withColumnRenamed("vid", "src")), "src", "semi"
        ).join(F.broadcast(keep.withColumnRenamed("vid", "dst")), "dst", "semi")
        return g

    def clear(self) -> None:
        self._ops = []
        self._v = self.spark.createDataFrame([], _V_SCHEMA)
        self._e = self.spark.createDataFrame([], _E_SCHEMA)

    def clear_edges(self) -> None:
        self._flush()
        self._e = self.spark.createDataFrame([], _E_SCHEMA)

    def is_directed(self) -> bool:
        return self.directed

    def is_multigraph(self) -> bool:
        return False


class DiGraph(Graph):
    """Directed variant: edges stored as given; ``degree`` = in + out."""

    directed = True

    def in_degree(self) -> DataFrame:
        d = self.edge_frame.groupBy(F.col("dst").alias("vid")).agg(
            F.count("*").cast("long").alias("in_degree")
        )
        return self.vertices.select("vid").join(d, "vid", "left").select(
            "vid", F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree")
        )

    def out_degree(self) -> DataFrame:
        d = self.edge_frame.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").cast("long").alias("out_degree")
        )
        return self.vertices.select("vid").join(d, "vid", "left").select(
            "vid", F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree")
        )

    def successors(self, n: int) -> DataFrame:
        self._flush()
        return (
            self._e.where(F.col("src") == int(n))
            .select(F.col("dst").alias("vid"))
            .distinct()
        )

    def predecessors(self, n: int) -> DataFrame:
        self._flush()
        return (
            self._e.where(F.col("dst") == int(n))
            .select(F.col("src").alias("vid"))
            .distinct()
        )


class MultiGraph:
    """Undirected multigraph — parallel edges distinguished by an integer
    ``key`` per canonical (a ≤ b) pair (reference
    `nx/classes/multigraph.py`; the layer's Graph/DiGraph cover the simple
    classes, this adds the multi-edge semantics NetworkX users expect for
    repeated relations — e.g. one edge per (order, part) line item).

    Storage: ONE DataFrame (a, b, key), a ≤ b, keys dense 0..m_ab−1 per
    pair (assigned by a pair-partitioned window, never a global sort).
    Mutations here are direct DataFrame algebra (union / anti-join),
    re-checkpointed per call — the batched mutation queue that
    de-duplicates chatty single-edge updates lives in ``Graph``; at scale
    this class expects bulk ``add_edges_df``-style calls."""

    def __init__(self, edges: DataFrame, num_partitions: int = 32):
        self.num_partitions = num_partitions
        canon = edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
        ).where(F.col("a").isNotNull() & F.col("b").isNotNull())
        w = Window.partitionBy("a", "b").orderBy(F.monotonically_increasing_id())
        self._e = truncate_plan(
            canon.withColumn("key", (F.row_number().over(w) - 1).cast("long"))
            .repartition(num_partitions, F.col("a"))
        )

    # -- reporting ----------------------------------------------------------
    def number_of_nodes(self) -> int:
        return (
            self._e.select(F.col("a").alias("vid"))
            .union(self._e.select(F.col("b").alias("vid")))
            .distinct()
            .count()
        )

    def number_of_edges(self, u: int | None = None, v: int | None = None) -> int:
        e = self._e
        if u is not None and v is not None:
            a, b = min(u, v), max(u, v)
            e = e.where((F.col("a") == a) & (F.col("b") == b))
        return e.count()

    def is_multigraph(self) -> bool:
        return True

    def is_directed(self) -> bool:
        return False

    def degree(self) -> DataFrame:
        """(vid, degree) with multiplicity; self-loops count twice (the
        NetworkX convention)."""
        ends = self._e.select(F.col("a").alias("vid")).union(
            self._e.select(F.col("b").alias("vid"))
        )
        return ends.groupBy("vid").agg(F.count("*").cast("long").alias("degree"))

    def edge_multiplicity(self) -> DataFrame:
        """(a, b, m) — parallel-edge count per canonical pair."""
        return self._e.groupBy("a", "b").agg(
            F.count("*").cast("long").alias("m")
        )

    # -- mutation -----------------------------------------------------------
    def add_edges_df(self, edges: DataFrame) -> "MultiGraph":
        """Bulk-add: new parallel copies get keys after the existing ones."""
        canon = edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
        )
        base = self._e.groupBy("a", "b").agg(F.max("key").alias("mx"))
        w = Window.partitionBy("a", "b").orderBy(F.monotonically_increasing_id())
        keyed = (
            canon.join(base, ["a", "b"], "left")
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .select(
                "a",
                "b",
                (F.coalesce("mx", F.lit(-1)) + F.col("rn")).alias("key"),
            )
        )
        self._e = truncate_plan(
            self._e.unionByName(keyed).repartition(
                self.num_partitions, F.col("a")
            )
        )
        return self

    def remove_edge(self, u: int, v: int, key: int | None = None) -> "MultiGraph":
        """Remove ONE parallel copy — the given key, else the smallest
        (NetworkX removes an arbitrary one; smallest is the pinned
        deterministic choice)."""
        a, b = min(u, v), max(u, v)
        if key is None:
            victim = (
                self._e.where((F.col("a") == a) & (F.col("b") == b))
                .agg(F.min("key").alias("key"))
                .collect()[0]["key"]
            )
            if victim is None:
                raise KeyError(f"no edge between {u} and {v}")
            key = int(victim)
        self._e = truncate_plan(
            self._e.where(
                ~((F.col("a") == a) & (F.col("b") == b) & (F.col("key") == key))
            )
        )
        return self

    def remove_edges_between(self, u: int, v: int) -> "MultiGraph":
        """Remove EVERY parallel copy between u and v."""
        a, b = min(u, v), max(u, v)
        self._e = truncate_plan(
            self._e.where(~((F.col("a") == a) & (F.col("b") == b)))
        )
        return self

    def to_graph(self) -> "Graph":
        """Collapse parallel edges → the simple undirected Graph."""
        simple = self._e.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).distinct()
        verts = (
            simple.select(F.col("src").alias("vid"))
            .union(simple.select(F.col("dst").alias("vid")))
            .distinct()
        )
        return Graph.from_dataframes(
            vertices=verts, edges=simple, num_partitions=self.num_partitions
        )
