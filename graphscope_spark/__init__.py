"""graphscope_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of GraphScope's GRAPE analytical engine (GAE)
(reference: zhanglei1949/GraphScope @ /root/reference, surveyed in SURVEY.md)
as idiomatic PySpark: every graph is a pair of DataFrames (vertices, edges),
every algorithm is a driver-side BSP loop of Spark SQL joins/aggregations,
and all per-row compute is vectorized pandas/Arrow UDFs.

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults (AQE,
                   skew-join, adaptive partition coalescing).
- ``corpus``     : deterministic synthetic Common-Crawl-style page corpus
                   (url, warc_ts, html, text, lang) — the engine's canonical
                   input shape per the north rule.
- ``extract``    : html → text / links extraction (Arrow-vectorized pandas
                   UDFs; byte-identical text per url by construction).
- ``graph``      : LinkGraph build — vertex ids via xxhash64, explicit hash
                   partitioning, degree tables, skew-aware sorted adjacency.
- ``bsp``        : the shared superstep driver loop — convergence predicates,
                   parquet checkpoint + JSON manifest (mid-iteration resume),
                   per-superstep metrics (wall time, shuffle bytes, task skew).
- ``algorithms`` : pagerank / wcc / cdlp / triangles (north-star four) plus
                   bfs, sssp, degree centrality, hits, kcore, lcc, ...
- ``datapipe``   : training-data pipeline ops over document/embedding tables —
                   dedup (exact / minhash-LSH / simhash / n-gram jaccard /
                   embedding-cosine), ANN similarity search, text analysis,
                   multimodal binary-column plumbing.
- ``learning``   : GLE-lite GNN data prep — k-hop neighbor sampling (+
                   induced block graphs), DeepWalk/node2vec walks, negative
                   sampling, train/val/test hash-bucket labels.
"""

from graphscope_spark.session import get_spark
from graphscope_spark.graph import LinkGraph, build_graph, edges_from_documents
from graphscope_spark.sources import read_pages, write_pages
from graphscope_spark import ops

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "LinkGraph",
    "build_graph",
    "edges_from_documents",
    "read_pages",
    "write_pages",
    "ops",
    "__version__",
]
