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
``(src, dst, <property columns...>)``. The archive is the Apache GraphAr
(gar/v1) chunked-parquet layout with yaml descriptors — splittable,
schema-carrying, readable by GraphAr tooling and any Spark/DuckDB/Arrow
consumer (see the ARCHIVE section below for the exact file map).
"""

from __future__ import annotations

import os
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


# -- GraphAr archive ------------------------------------------------------------
#
# Reference: ARCHIVE_GRAPH (`framework/dag_utils.py:1085-1144` —
# save_to_graphar) delegates to Apache GraphAr; this section writes the
# public gar/v1 layout directly from the DataFrames:
#
#   <name>.graph.yml                 graph descriptor (labels → yml files)
#   <label>.vertex.yml               per-label descriptor (chunked props)
#   <sl>_<el>_<dl>.edge.yml          per-triple descriptor (CSR adj list)
#   vertex/<label>/props/chunk<i>    ONE parquet file per chunk_size rows,
#                                    rows ordered by the contiguous internal
#                                    index (stored as property `_index`)
#   vertex/<label>/vertex_count      text file, total vertex count
#   edge/<n>/ordered_by_source/adj_list/part<i>/chunk<j>
#                                    edges of src-vertex-chunk i as
#                                    (src_index, dst_index, props…) sorted
#                                    by (src_index, dst_index), re-chunked
#                                    every edge chunk_size rows
#   edge/<n>/ordered_by_source/offset/chunk<i>
#                                    CSR offsets for vertex chunk i —
#                                    span+1 monotone int64 rows
#   edge/<n>/ordered_by_source/edge_count
#                                    text file, total edge count
#
# Exactly-one-file-per-chunk is guaranteed by hash-repartitioning on the
# chunk id before partitionBy (each chunk's rows land in one task, so each
# Hive-style chunk directory receives one part file, renamed to chunk<i>).
# The internal index is the GraphAr contiguous 0-based id (assigned by vid
# order via the parallel rank in learning._ordered_index — no global sort);
# it is ALSO persisted as a `_index` property so readers can reconstruct
# vid↔index without relying on implicit row positions.


_GAR_VERSION = "gar/v1"


def _spark_to_gar_type(dt: str) -> str:
    return {
        "bigint": "int64", "long": "int64", "int": "int32",
        "double": "double", "float": "float", "string": "string",
        "boolean": "bool", "binary": "bytes",
    }.get(dt, dt)


def _one_file_per_chunk(path: str, keys: list[str]) -> None:
    """Rename Hive-style ``k=v`` partition dirs to GraphAr names: the
    single part file in ``_chunk=3`` becomes ``chunk3``; nested
    ``_part=i/_echunk=j`` becomes ``part<i>/chunk<j>``."""
    key = keys[0]
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not d.startswith(f"{key}="):
            if not os.path.isdir(full) or d.startswith(("part", "chunk")):
                continue
            # cleanup markers (_SUCCESS files etc.) are left in place
            continue
        idx = int(d.split("=", 1)[1])
        if len(keys) > 1:
            newdir = os.path.join(path, f"part{idx}")
            os.makedirs(newdir, exist_ok=True)
            _one_file_per_chunk_inner(full, newdir, keys[1])
            os.rmdir(full)
        else:
            parts = [f for f in os.listdir(full) if f.endswith(".parquet")]
            assert len(parts) == 1, (full, parts)
            os.replace(
                os.path.join(full, parts[0]), os.path.join(path, f"chunk{idx}")
            )
            for leftover in os.listdir(full):  # .crc sidecars etc.
                os.remove(os.path.join(full, leftover))
            os.rmdir(full)


def _one_file_per_chunk_inner(src_dir: str, dst_dir: str, key: str) -> None:
    for d in sorted(os.listdir(src_dir)):
        full = os.path.join(src_dir, d)
        if not d.startswith(f"{key}="):
            continue
        j = int(d.split("=", 1)[1])
        parts = [f for f in os.listdir(full) if f.endswith(".parquet")]
        assert len(parts) == 1, (full, parts)
        os.replace(os.path.join(full, parts[0]), os.path.join(dst_dir, f"chunk{j}"))
        for leftover in os.listdir(full):  # .crc sidecars etc.
            os.remove(os.path.join(full, leftover))
        os.rmdir(full)


def archive_graph(
    pg: PropertyGraph,
    path: str,
    name: str = "graph",
    vertex_chunk_size: int = 262_144,
    edge_chunk_size: int = 1 << 20,
) -> None:
    """Write the property graph as an Apache GraphAr (gar/v1) directory:
    yaml descriptors + chunked vertex property files + CSR-ordered edge
    chunks with per-vertex-chunk offset arrays (layout documented above)."""
    import yaml

    from graphscope_spark.learning import _ordered_index

    os.makedirs(path, exist_ok=True)
    graph_desc: dict = {
        "name": name,
        "prefix": "./",
        "vertices": [],
        "edges": [],
        "version": _GAR_VERSION,
        # engine extension (ignored by GraphAr tooling): round-trip the
        # partitioning so a reloaded graph plans like the original
        "num_partitions": pg.num_partitions,
    }
    indices: dict[str, DataFrame] = {}
    counts: dict[str, int] = {}
    for lbl, df in pg.vertices.items():
        idx = _ordered_index(df.select("vid")).persist()
        n = idx.count()
        indices[lbl], counts[lbl] = idx, n
        data = (
            df.join(idx, "vid")
            .withColumn("_index", F.col("i"))
            .withColumn(
                "_chunk", (F.col("i") / F.lit(vertex_chunk_size)).cast("long")
            )
            .drop("i")
        )
        vdir = os.path.join(path, "vertex", lbl, "props")
        (
            data.repartition(F.col("_chunk"))
            .sortWithinPartitions("_chunk", "_index")
            .write.mode("overwrite")
            .partitionBy("_chunk")
            .parquet(vdir)
        )
        _one_file_per_chunk(vdir, ["_chunk"])
        with open(os.path.join(path, "vertex", lbl, "vertex_count"), "w") as f:
            f.write(str(n))
        props = [
            {
                "name": fld.name,
                "data_type": _spark_to_gar_type(fld.dataType.simpleString()),
                "is_primary": fld.name == "vid",
            }
            for fld in df.schema.fields
        ] + [{"name": "_index", "data_type": "int64", "is_primary": False}]
        vy = {
            "label": lbl,
            "chunk_size": vertex_chunk_size,
            "prefix": f"vertex/{lbl}/",
            "property_groups": [
                {"prefix": "props/", "file_type": "parquet", "properties": props}
            ],
            "version": _GAR_VERSION,
        }
        fname = f"{lbl}.vertex.yml"
        with open(os.path.join(path, fname), "w") as f:
            yaml.safe_dump(vy, f, sort_keys=False)
        graph_desc["vertices"].append(fname)

    for (sl, el, dl), df in pg.edges.items():
        ename = f"{sl}_{el}_{dl}"
        si = indices[sl].select(
            F.col("vid").alias("src"), F.col("i").alias("src_index")
        )
        di = indices[dl].select(
            F.col("vid").alias("dst"), F.col("i").alias("dst_index")
        )
        eprops = [c for c in df.columns if c not in ("src", "dst")]
        # dangling endpoints have no internal index — the inner joins
        # below would silently DROP those rows (data loss found by the
        # round-trip fuzz test); fail loudly instead
        n_edges = df.count()
        adj = (
            df.join(si, "src")
            .join(di, "dst")
            .select("src_index", "dst_index", *eprops)
            .withColumn(
                "_part",
                (F.col("src_index") / F.lit(vertex_chunk_size)).cast("long"),
            )
        )
        from pyspark.sql import Window

        w = (
            Window.partitionBy("_part")
            .orderBy("src_index", "dst_index")
        )
        adj = adj.withColumn(
            "_echunk",
            ((F.row_number().over(w) - 1) / F.lit(edge_chunk_size)).cast("long"),
        ).persist()  # feeds the chunked write AND the degree/offset pass
        edir = os.path.join(path, "edge", ename, "ordered_by_source")
        adir = os.path.join(edir, "adj_list")
        (
            adj.repartition(F.col("_part"))
            .sortWithinPartitions("_part", "_echunk", "src_index", "dst_index")
            .write.mode("overwrite")
            .partitionBy("_part", "_echunk")
            .parquet(adir)
        )
        _one_file_per_chunk(adir, ["_part", "_echunk"])
        # CSR offsets: for vertex chunk i, span+1 monotone rows — offset[j]
        # = #edges of vertices before the j-th vertex of the chunk (0-led),
        # final row = the chunk's total
        deg = adj.groupBy(F.col("src_index").alias("i")).agg(
            F.count("*").cast("long").alias("d")
        )
        n_src = counts[sl]
        alldeg = (
            indices[sl]
            .select("i")
            .join(deg, "i", "left")
            .select("i", F.coalesce("d", F.lit(0)).alias("d"))
            .withColumn(
                "_chunk", (F.col("i") / F.lit(vertex_chunk_size)).cast("long")
            )
        )
        woff = (
            Window.partitionBy("_chunk")
            .orderBy("i")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        lead = alldeg.select(
            "_chunk",
            F.col("i").alias("pos"),
            F.coalesce(F.sum("d").over(woff), F.lit(0)).alias("offset"),
        )
        tail = (
            alldeg.groupBy("_chunk")
            .agg(F.max("i").alias("pos0"), F.sum("d").alias("offset"))
            .select(
                "_chunk", (F.col("pos0") + 1).alias("pos"), F.col("offset")
            )
        )
        offs = lead.unionByName(tail)
        odir = os.path.join(edir, "offset")
        (
            offs.repartition(F.col("_chunk"))
            .sortWithinPartitions("_chunk", "pos")
            .select("_chunk", "offset")
            .write.mode("overwrite")
            .partitionBy("_chunk")
            .parquet(odir)
        )
        _one_file_per_chunk(odir, ["_chunk"])
        m = int(
            alldeg.agg(F.sum("d").alias("m")).collect()[0]["m"] or 0
        )  # = adj.count(), from the aggregate already computed
        adj.unpersist()
        if m != n_edges:
            raise ValueError(
                f"archive_graph: edge triple {(sl, el, dl)} has "
                f"{n_edges - m} edge(s) whose src/dst is not in the "
                f"'{sl}'/'{dl}' vertex table — archiving would lose them; "
                "add the missing vertices (or filter the edges) first"
            )
        with open(os.path.join(edir, "edge_count"), "w") as f:
            f.write(str(m))
        ey = {
            "src_label": sl,
            "edge_label": el,
            "dst_label": dl,
            "chunk_size": edge_chunk_size,
            "src_chunk_size": vertex_chunk_size,
            "dst_chunk_size": vertex_chunk_size,
            "directed": True,
            "prefix": f"edge/{ename}/",
            "adj_lists": [
                {"ordered": True, "aligned_by": "src", "file_type": "parquet"}
            ],
            "property_groups": [
                {
                    "file_type": "parquet",
                    "properties": [
                        {
                            "name": fld.name,
                            "data_type": _spark_to_gar_type(
                                fld.dataType.simpleString()
                            ),
                            "is_primary": False,
                        }
                        for fld in df.schema.fields
                        if fld.name in eprops
                    ],
                }
            ],
            "version": _GAR_VERSION,
        }
        fname = f"{ename}.edge.yml"
        with open(os.path.join(path, fname), "w") as f:
            yaml.safe_dump(ey, f, sort_keys=False)
        graph_desc["edges"].append(fname)

    for idx in indices.values():
        idx.unpersist()
    tmp = os.path.join(path, f"{name}.graph.yml.tmp")
    with open(tmp, "w") as f:
        yaml.safe_dump(graph_desc, f, sort_keys=False)
    os.replace(tmp, os.path.join(path, f"{name}.graph.yml"))


def _gar_to_spark_type(dt: str) -> str:
    return {
        "int64": "long", "int32": "int", "double": "double",
        "float": "float", "string": "string", "bool": "boolean",
        "bytes": "binary",
    }.get(dt, dt)


def _empty_frame_from_props(spark: SparkSession, props: list[dict]):
    schema = ", ".join(
        f"{p['name']} {_gar_to_spark_type(p['data_type'])}" for p in props
    )
    return spark.createDataFrame([], schema)


def load_archived_graph(spark: SparkSession, path: str) -> PropertyGraph:
    """Round-trip reader for ``archive_graph``'s GraphAr directory: yaml
    descriptors → chunked parquet datasets → the original label frames
    (edge endpoints mapped back index→vid via the persisted ``_index``
    property)."""
    import glob as _glob

    import yaml

    gfiles = _glob.glob(os.path.join(path, "*.graph.yml"))
    if not gfiles:
        raise FileNotFoundError(f"no *.graph.yml under {path}")
    with open(gfiles[0]) as f:
        gd = yaml.safe_load(f)
    pg = PropertyGraph(num_partitions=gd.get("num_partitions", 32))
    vindex: dict[str, DataFrame] = {}
    for vf in gd["vertices"]:
        with open(os.path.join(path, vf)) as f:
            vd = yaml.safe_load(f)
        lbl = vd["label"]
        group = vd["property_groups"][0]["prefix"].rstrip("/")
        chunks = _glob.glob(
            os.path.join(path, vd["prefix"].rstrip("/"), group, "chunk*")
        )
        if chunks:
            df = spark.read.parquet(*chunks)
        else:
            # zero-row label: partitionBy wrote no chunk dirs — rebuild
            # the empty frame from the descriptor's schema
            df = _empty_frame_from_props(
                spark, vd["property_groups"][0]["properties"]
            )
        vindex[lbl] = df.select(F.col("_index"), F.col("vid"))
        pg.vertices[lbl] = df.drop("_index")
    for ef in gd["edges"]:
        with open(os.path.join(path, ef)) as f:
            ed = yaml.safe_load(f)
        key = (ed["src_label"], ed["edge_label"], ed["dst_label"])
        chunks = _glob.glob(
            os.path.join(
                path,
                ed["prefix"].rstrip("/"),
                "ordered_by_source",
                "adj_list",
                "part*",
                "chunk*",
            )
        )
        eprops_decl = [
            p["name"]
            for p in ed.get("property_groups", [{}])[0].get("properties", [])
        ]
        if chunks:
            adj = spark.read.parquet(*chunks)
        else:
            adj = _empty_frame_from_props(
                spark,
                [
                    {"name": "src_index", "data_type": "int64"},
                    {"name": "dst_index", "data_type": "int64"},
                ]
                + ed.get("property_groups", [{}])[0].get("properties", []),
            )
        si = vindex[key[0]].select(
            F.col("_index").alias("src_index"), F.col("vid").alias("src")
        )
        di = vindex[key[2]].select(
            F.col("_index").alias("dst_index"), F.col("vid").alias("dst")
        )
        eprops = eprops_decl
        pg.edges[key] = (
            adj.join(si, "src_index")
            .join(di, "dst_index")
            .select("src", "dst", *eprops)
        )
    return pg
