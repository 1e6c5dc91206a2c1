"""Multi-label property graph — ADD_LABELS / PROJECT / GraphAr-style archive.

Reference semantics:

* ADD_LABELS: `python/graphscope/framework/graph.py:552` — an existing
  graph gains additional vertex/edge labels, each label carrying its own
  property schema; edges are typed by a (src_label, edge_label, dst_label)
  triple.
* PROJECT: `framework/dag_utils.py:514` + `graph.py` ``project`` — select
  one vertex label and one edge label (optionally one property each) to
  obtain a simple graph the analytical apps can run on.
* ARCHIVE_GRAPH (GraphAr export): `framework/dag_utils.py:1085` and the
  GraphAr layout (one directory per label, vertex/edge chunks + a yaml-ish
  metadata descriptor).

Spark shape: a label = a DataFrame. Vertices of label L:
``(vid, <property columns...>)``; edges of triple (sl, el, dl):
``(src, dst, <property columns...>)``. The archive is a directory of
parquet datasets plus one JSON descriptor — splittable, schema-carrying,
readable by any Spark/DuckDB/Arrow consumer, which is exactly GraphAr's
design goal re-expressed with Spark-native files.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphscope_spark.graph import LinkGraph


@dataclass
class PropertyGraph:
    """vertices: label → DataFrame(vid, props...);
    edges: (src_label, edge_label, dst_label) → DataFrame(src, dst, props...)."""

    vertices: dict[str, DataFrame] = field(default_factory=dict)
    edges: dict[tuple[str, str, str], DataFrame] = field(default_factory=dict)
    num_partitions: int = 32

    # -- ADD_LABELS ---------------------------------------------------------

    def add_vertices(self, label: str, df: DataFrame) -> "PropertyGraph":
        if label in self.vertices:
            raise ValueError(f"vertex label {label!r} already present")
        if "vid" not in df.columns:
            raise ValueError("vertex frame needs a 'vid' column")
        out = PropertyGraph(dict(self.vertices), dict(self.edges), self.num_partitions)
        out.vertices[label] = df
        return out

    def add_edges(
        self, src_label: str, edge_label: str, dst_label: str, df: DataFrame
    ) -> "PropertyGraph":
        key = (src_label, edge_label, dst_label)
        if key in self.edges:
            raise ValueError(f"edge triple {key!r} already present")
        for lbl in (src_label, dst_label):
            if lbl not in self.vertices:
                raise ValueError(f"unknown vertex label {lbl!r} — add it first")
        if not {"src", "dst"} <= set(df.columns):
            raise ValueError("edge frame needs 'src' and 'dst' columns")
        out = PropertyGraph(dict(self.vertices), dict(self.edges), self.num_partitions)
        out.edges[key] = df
        return out

    # -- PROJECT ------------------------------------------------------------

    def project(
        self, vertex_label: str, edge_triple: tuple[str, str, str]
    ) -> LinkGraph:
        """One (vertex label, edge triple) → simple LinkGraph for the
        analytical apps (the reference's ``graph.project(...)``)."""
        v = self.vertices[vertex_label].select("vid")
        e = self.edges[edge_triple].select("src", "dst").distinct()
        e = e.repartition(
            self.num_partitions, F.pmod(F.col("src"), F.lit(self.num_partitions))
        )
        return LinkGraph(vertices=v, edges=e, num_partitions=self.num_partitions)

    def schema(self) -> dict:
        return {
            "vertices": {
                lbl: [c for c in df.columns if c != "vid"]
                for lbl, df in self.vertices.items()
            },
            "edges": {
                "/".join(k): [c for c in df.columns if c not in ("src", "dst")]
                for k, df in self.edges.items()
            },
        }


# -- GraphAr-style archive ------------------------------------------------------


def archive_graph(pg: PropertyGraph, path: str) -> None:
    """Write the property graph as a GraphAr-style directory:
    ``vertex/<label>/`` and ``edge/<sl>__<el>__<dl>/`` parquet datasets plus
    a ``metadata.json`` descriptor (labels, schemas, counts, partitioning)."""
    os.makedirs(path, exist_ok=True)
    meta: dict = {
        "format": "graphar-parquet-lite/1",
        "created_at": time.time(),
        "num_partitions": pg.num_partitions,
        "vertex_labels": {},
        "edge_triples": {},
    }
    for lbl, df in pg.vertices.items():
        sub = os.path.join(path, "vertex", lbl)
        df.write.mode("overwrite").parquet(sub)
        meta["vertex_labels"][lbl] = {
            "path": f"vertex/{lbl}",
            "schema": df.schema.json(),
            "count": df.count(),
        }
    for key, df in pg.edges.items():
        name = "__".join(key)
        sub = os.path.join(path, "edge", name)
        df.write.mode("overwrite").parquet(sub)
        meta["edge_triples"][name] = {
            "path": f"edge/{name}",
            "labels": list(key),
            "schema": df.schema.json(),
            "count": df.count(),
        }
    tmp = os.path.join(path, "metadata.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp, os.path.join(path, "metadata.json"))


def load_archived_graph(spark: SparkSession, path: str) -> PropertyGraph:
    """Round-trip reader for ``archive_graph`` output."""
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    pg = PropertyGraph(num_partitions=meta.get("num_partitions", 32))
    for lbl, info in meta["vertex_labels"].items():
        pg.vertices[lbl] = spark.read.parquet(os.path.join(path, info["path"]))
    for name, info in meta["edge_triples"].items():
        pg.edges[tuple(info["labels"])] = spark.read.parquet(
            os.path.join(path, info["path"])
        )
    return pg
