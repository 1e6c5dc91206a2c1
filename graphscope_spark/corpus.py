"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the exact input shape from the north rule's input hint:
``(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)``.
Everything is a pure function of the page index, built with JVM-side Spark SQL
expressions (no Python in the data path), so the corpus is reproducible at any
scale and any partitioning — the analog of the reference's fixed test datasets
(p2p-31, `/root/reference/python/graphscope/tests/conftest.py:412-424`).

The implied link graph is engineered to exercise every semantic the
north-star algorithms care about (FIXTURES.md F1):

* 4 groups (page ``i`` belongs to group ``i % 4``) with **no cross-group
  links** → ≥2 weakly connected components;
* a fanout-10 tree "backbone" inside each group (child → parent) → bounded
  diameter, so min-label WCC converges in O(log N) rounds;
* successor links ``i → i+4`` and ``i → i+8`` → triangles ``(i, i+4, i+8)``;
* every page links to its group head (pages 0..3) → hot vertices with degree
  ≈ N/4 ≫ mean (the skew/salting path);
* pages with ``i % 13 == 12`` emit **no** links → PageRank dangling mass;
* pages with ``i % 17 == 5`` link to a never-crawled external url → dangling
  *targets* (vertices with no out-edges and no html);
* pages with ``i % 11 == 0`` carry ``href="#top"`` → self-loop after fragment
  resolution;
* the group-head link is emitted twice → duplicate-edge dedup;
* successor links are host-relative when src and dst share a host, absolute
  otherwise → both URL-resolution paths.

``expected_links(i, n_pages, n_hosts)`` is the pure-Python oracle for the
extraction pipeline: tests assert Spark-extracted edges == oracle edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Small deterministic vocabulary for body text.
VOCAB = [
    "web", "graph", "link", "page", "crawl", "rank", "node", "edge",
    "spark", "shuffle", "join", "hash", "label", "vertex", "degree", "host",
]

BASE_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _host(i: int, n_pages: int, n_hosts: int) -> int:
    """Host id for page i — quadratic map concentrates pages on high host
    ids (power-law-ish pages/host)."""
    return (i * i) % n_hosts


def url_of(i: int, n_pages: int, n_hosts: int) -> str:
    return f"http://site{_host(i, n_pages, n_hosts)}.test/p{i}"


def external_url(i: int) -> str:
    return f"http://external{i % 4}.test/missing{i}"


def expected_links(i: int, n_pages: int, n_hosts: int) -> list[str]:
    """Oracle: the absolute, fragment-stripped, deduplicated out-links page i
    must yield after extraction. Order-insensitive (extraction dedups)."""
    if i % 13 == 12:
        return []
    g = i % 4
    out: list[str] = []
    parent = g + 4 * ((i // 4) // 10)
    if parent != i:
        out.append(url_of(parent, n_pages, n_hosts))
    for succ in (i + 4, i + 8):
        if succ < n_pages:
            out.append(url_of(succ, n_pages, n_hosts))
    out.append(url_of(g, n_pages, n_hosts))  # hub (emitted twice in html)
    if i % 17 == 5:
        out.append(external_url(i))
    if i % 11 == 0:
        out.append(url_of(i, n_pages, n_hosts))  # "#top" self-loop
    # dedup, stable order
    seen: set[str] = set()
    uniq = []
    for u in out:
        if u not in seen:
            seen.add(u)
            uniq.append(u)
    return uniq


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the corpus DataFrame entirely with JVM-side expressions.

    Scales linearly: ``spark.range`` is split across executors; html is
    assembled with ``concat``/``transform`` inside whole-stage codegen.
    """
    if num_partitions is None:
        num_partitions = max(4, spark.sparkContext.defaultParallelism)
    df = spark.range(0, n_pages, 1, num_partitions).withColumnRenamed("id", "i")

    i = F.col("i")
    N, H = F.lit(n_pages), F.lit(n_hosts)
    host = (i * i) % H

    def url_expr(idx):  # absolute url of page idx
        return F.concat(F.lit("http://site"), ((idx * idx) % H).cast("string"),
                        F.lit(".test/p"), idx.cast("string"))

    g = i % 4
    parent = g + 4 * ((i.cast("long") / 4).cast("long") / 10).cast("long")
    succ1, succ2 = i + 4, i + 8

    def anchor(idx, rel_ok, frag):
        """<a href=...> for target page idx; host-relative when sharing
        src's host and rel_ok, absolute otherwise; optional #fragment."""
        same_host = ((idx * idx) % H) == host
        href_abs = F.concat(url_expr(idx), F.lit(frag))
        href_rel = F.concat(F.lit("/p"), idx.cast("string"), F.lit(frag))
        href = F.when(same_host & F.lit(rel_ok), href_rel).otherwise(href_abs)
        return F.concat(F.lit('<a href="'), href, F.lit('">to '),
                        idx.cast("string"), F.lit("</a>"))

    empty = F.lit("")
    links = F.concat(
        F.when(parent != i, anchor(parent, False, "#section")).otherwise(empty),
        F.when(succ1 < N, anchor(succ1, True, "")).otherwise(empty),
        F.when(succ2 < N, anchor(succ2, True, "")).otherwise(empty),
        anchor(g, False, ""),
        anchor(g, False, ""),  # duplicate link
        F.when(
            i % 17 == 5,
            F.concat(F.lit('<a href="http://external'), g.cast("string"),
                     F.lit(".test/missing"), i.cast("string"), F.lit('">ext</a>')),
        ).otherwise(empty),
        F.when(i % 11 == 0, F.lit('<a href="#top">top</a>')).otherwise(empty),
    )
    links = F.when(i % 13 == 12, empty).otherwise(links)

    # Deterministic 20-word body from the vocabulary.
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda k: F.element_at(vocab, ((i * 7 + k) % len(VOCAB) + 1).cast("int")),
        ),
    )

    html = F.concat(
        F.lit("<html><head><title>Page "), i.cast("string"),
        F.lit("</title></head><body><h1>Doc "), i.cast("string"),
        F.lit("</h1>\n<p>"), words, F.lit("</p>\n"), links,
        F.lit("\n</body></html>"),
    )

    lang = (
        F.when(i % 19 == 0, F.lit("de"))
        .when(i % 23 == 0, F.lit("es"))
        .otherwise(F.lit("en"))
    )
    # `text` is deliberately stale/null — the engine must re-extract from html
    # (per-row invariant in the north rule).
    stale_text = F.when(i % 5 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("stale "), i.cast("string"))
    )

    return df.select(
        url_expr(i).alias("url"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + i).alias("warc_ts"),
        html.cast("binary").alias("html"),
        stale_text.alias("text"),
        lang.alias("lang"),
    )
