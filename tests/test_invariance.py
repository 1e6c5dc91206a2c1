"""Worker-count / partitioning invariance — the reference requires identical
results at any worker count (`/root/reference/python/graphscope/tests/
unittest/test_scalability.py:40-57`). Here: the same corpus graph computed
at 2 and 8 partitions must give byte-identical integer results and
allclose(1e-9) float results; extraction must be byte-identical per url
across partitionings."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from graphscope_spark import corpus
from graphscope_spark.extract import extract_pages
from graphscope_spark.graph import build_graph
from graphscope_spark.algorithms import cdlp, pagerank, wcc
from graphscope_spark.sources import read_pages, write_pages


def test_algorithms_partition_invariance(spark, pages_small):
    g2 = build_graph(pages_small, num_partitions=2)
    g8 = build_graph(pages_small.repartition(16), num_partitions=8)

    w2 = {r["vid"]: r["comp"] for r in wcc(g2).state.collect()}
    w8 = {r["vid"]: r["comp"] for r in wcc(g8).state.collect()}
    assert w2 == w8

    l2 = {r["vid"]: r["label"] for r in cdlp(g2, max_rounds=5).state.collect()}
    l8 = {r["vid"]: r["label"] for r in cdlp(g8, max_rounds=5).state.collect()}
    assert l2 == l8

    p2 = {r["vid"]: r["rank"] for r in pagerank(g2, tol=1e-10, max_rounds=30).state.collect()}
    p8 = {r["vid"]: r["rank"] for r in pagerank(g8, tol=1e-10, max_rounds=30).state.collect()}
    assert set(p2) == set(p8)
    assert max(abs(p2[v] - p8[v]) for v in p2) < 1e-9

    from graphscope_spark.algorithms.scc import scc

    s2 = {r["vid"]: r["comp"] for r in scc(g2).collect()}
    s8 = {r["vid"]: r["comp"] for r in scc(g8).collect()}
    assert s2 == s8


def test_learning_samplers_partition_invariance(spark, pages_small):
    """Hash-argmin sampling must be bit-identical at any partitioning —
    the property that lets a sampled training corpus be regenerated
    exactly on a different cluster size."""
    from graphscope_spark.learning import (
        neighbor_sample,
        negative_sample,
        node2vec_walks,
        random_walks,
    )

    g2 = build_graph(pages_small, num_partitions=2)
    g8 = build_graph(pages_small.repartition(16), num_partitions=8)
    seeds2 = g2.vertices.orderBy("vid").limit(4)
    seeds8 = g8.vertices.orderBy("vid").limit(4)

    b2 = sorted(map(tuple, neighbor_sample(g2, seeds2, [3, 2]).collect()))
    b8 = sorted(map(tuple, neighbor_sample(g8, seeds8, [3, 2]).collect()))
    assert b2 == b8

    w2 = sorted(map(tuple, random_walks(g2, seeds2, length=3, num_walks=2).collect()))
    w8 = sorted(map(tuple, random_walks(g8, seeds8, length=3, num_walks=2).collect()))
    assert w2 == w8

    n2 = sorted(map(tuple, negative_sample(g2, k=2, oversample=3).collect()))
    n8 = sorted(map(tuple, negative_sample(g8, k=2, oversample=3).collect()))
    assert n2 == n8

    # node2vec has no SQL oracle (ln not bit-pinned cross-engine), but
    # WITHIN one JVM its biased argmin must still be partition-invariant
    v2 = sorted(map(tuple, node2vec_walks(g2, seeds2, length=3, num_walks=2, p=0.5, q=2.0).collect()))
    v8 = sorted(map(tuple, node2vec_walks(g8, seeds8, length=3, num_walks=2, p=0.5, q=2.0).collect()))
    assert v2 == v8


def test_extraction_byte_identity_across_partitionings(spark, pages_small):
    a = {r["url"]: r["text"] for r in extract_pages(pages_small.coalesce(1)).collect()}
    b = {r["url"]: r["text"] for r in extract_pages(pages_small.repartition(16)).collect()}
    assert a == b  # byte-identical extracted text per url


def test_read_edge_csv_variants(spark, tmp_path):
    from graphscope_spark.sources import read_edge_csv

    # p2p-style: tab-delimited, no header, comment lines (the reference's
    # test fixtures, test/app_tests.sh:180-186)
    p2p = tmp_path / "p2p.txt"
    p2p.write_text("# FromNodeId\tToNodeId\n1\t2\n2\t3\n3\t1\n")
    e = read_edge_csv(
        spark, str(p2p), header=False, delimiter="\t",
        src_col=0, dst_col=1, comment="#",
    )
    assert sorted((r["src"], r["dst"]) for r in e.collect()) == [(1, 2), (2, 3), (3, 1)]
    assert dict(e.dtypes) == {"src": "bigint", "dst": "bigint"}

    # headered, custom delimiter, malformed row dropped
    csvf = tmp_path / "edges.csv"
    csvf.write_text("src|dst\n10|11\nbad|row\n11|12\n")
    e2 = read_edge_csv(spark, str(csvf), header=True, delimiter="|")
    assert sorted((r["src"], r["dst"]) for r in e2.collect()) == [(10, 11), (11, 12)]


def test_sources_roundtrip(spark, tmp_path, pages_small):
    path = str(tmp_path / "pages")
    write_pages(pages_small, path)
    back = read_pages(spark, path)
    assert back.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert back.count() == pages_small.count()
    # html payload survives byte-exact
    orig = {r["url"]: bytes(r["html"]) for r in pages_small.collect()}
    got = {r["url"]: bytes(r["html"]) for r in back.collect()}
    assert orig == got
