"""Persistent mutable graph store — the groot surface, Spark-native.

Reference semantics: groot (``interactive_engine/groot-server/``,
``groot-client/``) is GraphScope's durable, mutable property-graph store:
clients apply vertex/edge mutations, the store versions them, and later
sessions read a consistent snapshot. The reference implements this as a
bespoke LSM service; the Spark-honest rendering is **copy-on-write
versioned snapshots of parquet** — every commit writes a full GraphAr
(gar/v1) archive of the graph (``property_graph.archive_graph``) under a
new version directory and appends a manifest entry, so

* any session (or any engine that reads GraphAr/parquet) can open any
  version — reads need no server;
* commits are atomic (manifest written last, via rename) and immutable —
  a reader holding version k is never affected by later commits;
* "mutations" are whatever produced the new PropertyGraph — typically the
  NetworkX-compatible mutation layer (``nx.Graph``'s buffered
  add/remove), closed over a snapshot ``load()``.

Full snapshots, not deltas, on purpose: at the 100-TB tier the write cost
of a commit equals one pass over the graph — the same cost any engine
pays to materialize the mutation — and snapshot isolation falls out for
free. (Delta/Iceberg MERGE is the incremental upgrade path and keeps the
same reader contract; it needs the table-format jars this sandbox lacks —
see ``sources.py``'s capability gate.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from graphscope_spark.property_graph import (
    PropertyGraph,
    archive_graph,
    load_archived_graph,
)


class GraphStore:
    """Versioned on-disk graph store: ``commit`` a PropertyGraph, ``load``
    any version back (latest by default)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "manifest.json")

    def versions(self) -> list[dict]:
        """Committed versions, oldest first: [{version, message, labels,
        triples}]."""
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["versions"]

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1]["version"] if vs else None

    # -- commit / load -----------------------------------------------------

    def commit(
        self, pg: PropertyGraph, message: str = "", lock_timeout_s: float = 600.0
    ) -> int:
        """Write ``pg`` as the next immutable version; returns its number.
        The version directory is fully written BEFORE the manifest is
        swapped (tmp + rename), so a crash mid-commit leaves the store at
        the previous version with only an orphaned directory.

        Commits are serialized through an ``O_EXCL`` lock file: without
        it, two concurrent committers would both read version N, both
        write v(N+1), and the second manifest swap would silently drop
        the first committer's entry. The lock covers the whole
        read-manifest → write-archive → swap-manifest sequence — groot's
        single-writer ingestion path, made explicit. A crashed committer
        leaves the lock behind; it is reclaimed after ``lock_timeout_s``
        based on its mtime."""
        import time

        lock = os.path.join(self.path, ".commit.lock")
        deadline = time.time() + lock_timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                break
            except FileExistsError:
                try:
                    if time.time() - os.path.getmtime(lock) > lock_timeout_s:
                        os.remove(lock)  # stale lock from a crashed committer
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise TimeoutError(
                        f"could not acquire {lock} within {lock_timeout_s}s"
                    )
                time.sleep(0.2)
        try:
            vs = self.versions()
            v = (vs[-1]["version"] + 1) if vs else 1
            vdir = os.path.join(self.path, f"v{v}")
            archive_graph(pg, vdir, name=f"v{v}")
            entry = {
                "version": v,
                "message": message,
                "labels": sorted(pg.vertices),
                "triples": sorted("__".join(k) for k in pg.edges),
            }
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {"format": "graphstore/1", "versions": vs + [entry]},
                    f,
                    indent=2,
                )
            os.replace(tmp, self._manifest_path)
            return v
        finally:
            os.remove(lock)

    # -- nx mutation round-trip --------------------------------------------

    NX_VLABEL = "node"
    NX_TRIPLE = ("node", "edge", "node")

    def commit_nx(self, g, message: str = "") -> int:
        """Commit an ``nx.Graph``/``nx.DiGraph`` (the mutation layer) as
        the next version: flushes its buffered mutations and archives its
        (vid, attrs) / (src, dst, attrs) frames under the fixed
        ``node``/``edge`` labels. Together with :meth:`load_nx` this is
        the groot mutate→persist→reload loop: ``load_nx`` a snapshot,
        apply ``add_*``/``remove_*`` mutations, ``commit_nx`` the
        result."""
        pg = (
            PropertyGraph(num_partitions=g.num_partitions)
            .add_vertices(self.NX_VLABEL, g.vertices)
            .add_edges(*self.NX_TRIPLE, g.edge_frame)
        )
        return self.commit(pg, message=message)

    def load_nx(self, spark: SparkSession, version: int | None = None, directed: bool = False):
        """Open a snapshot committed by :meth:`commit_nx` as a mutable
        nx graph (buffered-mutation layer) ready for further mutations."""
        from graphscope_spark.nx import DiGraph, Graph

        pg = self.load(spark, version)
        cls = DiGraph if directed else Graph
        return cls.from_dataframes(
            vertices=pg.vertices[self.NX_VLABEL],
            edges=pg.edges[self.NX_TRIPLE],
            num_partitions=pg.num_partitions,
        )

    def load(self, spark: SparkSession, version: int | None = None) -> PropertyGraph:
        """Open a snapshot (latest when ``version`` is None)."""
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"empty store at {self.path}")
        if version is None:
            version = vs[-1]["version"]
        if not any(e["version"] == version for e in vs):
            raise ValueError(
                f"version {version} not in store (have "
                f"{[e['version'] for e in vs]})"
            )
        return load_archived_graph(spark, os.path.join(self.path, f"v{version}"))
