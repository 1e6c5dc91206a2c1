"""LinkGraph: partitioned property-graph-lite over DataFrames.

Spark reincarnation of the reference's edge-cut fragment model
(`/root/reference/analytical_engine/core/utils/partitioner.h:43-53` —
``fid = hash(oid) % fnum``; `core/vertex_map/global_vertex_map.h:62-65` —
gid encodes owner): here a vertex id is ``xxhash64(url)`` (64-bit, stable,
collision-audited in tests) and placement is an explicit
``repartition(num_partitions, pmod(vid, P))`` — Spark owns the shuffle, we
own the key. Adjacency is the CSR analog: one row per vertex with a sorted
neighbor array, built skew-aware (two-phase salted aggregation for
mega-degree hosts, SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.extract import edges_from_pages


@dataclass
class LinkGraph:
    """vertices(vid, url) / edges(src, dst), both hash-partitioned by vid.

    ``edges`` is deduplicated and may contain self-loops; algorithms that
    need loop-free/undirected views derive them (see ``undirected_edges``).
    """

    vertices: DataFrame
    edges: DataFrame
    num_partitions: int

    # -- degree tables (computed lazily, cheap aggregations) --

    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").alias("out_deg")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("vid")).agg(
            F.count("*").alias("in_deg")
        )

    def undirected_edges(self, drop_self_loops: bool = True) -> DataFrame:
        """Symmetrized, deduplicated edge set (each undirected edge appears
        as both (u,v) and (v,u)); reference analog: TO_UNDIRECTED
        (`grape_instance.cc:1400`)."""
        # Canonical column ORDER first: USING-style joins upstream reorder
        # columns to [dst, src], and the positional ``union`` below would
        # then silently produce e ∪ e instead of e ∪ reverse(e) — measured
        # as WCC-inside-SCC hitting max_rounds with a directed edge set.
        e = self.edges.select("src", "dst")
        if drop_self_loops:
            e = e.where(F.col("src") != F.col("dst"))
        sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        return sym.distinct()

    def degrees(self) -> DataFrame:
        """Undirected degree (self-loops excluded), for orientation/LCC."""
        und = self.undirected_edges()
        return und.groupBy(F.col("src").alias("vid")).agg(
            F.count("*").alias("deg")
        )


def vid_expr(url_col):
    """Stable 64-bit vertex id. xxhash64 rather than murmur3-32 (`hash`):
    at 10^9+ vertices 32-bit ids collide with near-certainty; 64-bit keeps
    expected collisions ≪ 1 below ~10^9 vertices and the id doubles as the
    partition/ordering key (reference gid analog)."""
    return F.xxhash64(url_col)


def build_graph(pages: DataFrame, num_partitions: int = 32) -> LinkGraph:
    """pages → LinkGraph. Vertices = crawled urls ∪ link targets (dangling
    targets get a vid but no out-edges — the PageRank dangling-mass path,
    `apps/pagerank/pagerank_networkx.h:76-85`)."""
    url_edges = edges_from_pages(pages)  # (src_url, dst_url), deduped

    all_urls = (
        pages.select(F.col("url"))
        .union(url_edges.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    vertices = (
        all_urls.select(vid_expr(F.col("url")).alias("vid"), "url")
        .repartition(num_partitions, F.pmod(F.col("vid"), F.lit(num_partitions)))
    )
    edges = (
        url_edges.select(
            vid_expr(F.col("src_url")).alias("src"),
            vid_expr(F.col("dst_url")).alias("dst"),
        )
        .repartition(num_partitions, F.pmod(F.col("src"), F.lit(num_partitions)))
    )
    return LinkGraph(vertices=vertices, edges=edges, num_partitions=num_partitions)


def from_edge_df(edges: DataFrame, num_partitions: int = 32) -> LinkGraph:
    """Algorithm-only construction from an (src, dst) edge DataFrame
    (reference analog: loading the p2p-31 edge CSVs directly)."""
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    vertices = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct()
        .select("vid", F.col("vid").cast("string").alias("url"))
    )
    edges = edges.repartition(
        num_partitions, F.pmod(F.col("src"), F.lit(num_partitions))
    )
    return LinkGraph(vertices=vertices, edges=edges, num_partitions=num_partitions)


def edges_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic link graph derived from the driver's ``documents`` table
    (doc_id, ...). Used by __spark_entry__ so the DuckDB oracle can derive the
    *identical* graph in pure SQL. Structure mirrors the synthetic corpus:
    4 groups, fanout-10 tree backbone, successor triangles, per-group hub
    (skew), deduplicated, self-loops kept.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    n = docs.count()
    i = F.col("doc_id").cast("long")
    g = i % 4
    parent = g + 4 * F.floor(F.floor(i / 4) / 10).cast("long")
    targets = F.array_distinct(
        F.filter(
            F.array(
                parent,
                F.when(i + 4 < n, i + 4).otherwise(F.lit(None)),
                F.when(i + 8 < n, i + 8).otherwise(F.lit(None)),
                g,
                F.when(i % 11 == 0, i).otherwise(F.lit(None)),  # self-loop
            ),
            lambda x: x.isNotNull(),
        )
    )
    return (
        docs.select(i.alias("src"), F.explode(targets).alias("dst"))
        .where(~((F.col("src") == F.col("dst")) & (F.col("src") % 11 != 0)))
        .distinct()
    )


EDGES_FROM_DOCUMENTS_SQL = """
WITH d AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents),
n AS (SELECT COUNT(*) AS n FROM d),
cand AS (
    SELECT i AS src, (i % 4) + 4 * ((i // 4) // 10) AS dst FROM d
    UNION ALL SELECT i, i + 4 FROM d, n WHERE i + 4 < n.n
    UNION ALL SELECT i, i + 8 FROM d, n WHERE i + 8 < n.n
    UNION ALL SELECT i, i % 4 FROM d
    UNION ALL SELECT i, i FROM d WHERE i % 11 = 0
)
SELECT DISTINCT src, dst FROM cand
WHERE NOT (src = dst AND src % 11 <> 0)
"""


def sorted_adjacency(
    edges: DataFrame,
    num_partitions: int = 32,
    salt_buckets: int = 16,
) -> DataFrame:
    """(src, nbrs: sorted array<long>) — the CSR analog
    (`arrow_projected_fragment.h:857-945`).

    Skew-aware: a mega-degree vertex (group head, popular host) would funnel
    its whole neighbor list through one task. Two-phase salted aggregation
    bounds that: phase 1 groups by (src, pmod(dst, S)) so a hot vertex's
    neighbors land in S parallel tasks; phase 2 merges the S pre-sorted
    chunks. AQE skew-join handles the residual.
    """
    chunks = (
        edges.groupBy("src", F.pmod(F.col("dst"), F.lit(salt_buckets)).alias("_salt"))
        .agg(F.sort_array(F.collect_list("dst")).alias("chunk"))
    )
    return (
        chunks.groupBy("src")
        .agg(F.sort_array(F.flatten(F.collect_list("chunk"))).alias("nbrs"))
        .repartition(num_partitions, F.pmod(F.col("src"), F.lit(num_partitions)))
    )
