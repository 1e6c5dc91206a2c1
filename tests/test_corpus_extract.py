"""Corpus generation + extraction tests (FIXTURES.md F1, F4).

The extraction byte-identity test mirrors the reference's golden-output
byte-compare (`analytical_engine/test/app_tests.sh:115-126`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphscope_spark import corpus
from graphscope_spark.extract import edges_from_pages, extract_pages

N, H = 200, 8


def test_pages_schema_and_shape(pages_small):
    assert [f.name for f in pages_small.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
    assert dict(pages_small.dtypes)["html"] == "binary"
    assert pages_small.count() == N
    assert pages_small.select("url").distinct().count() == N


def test_extracted_links_match_oracle(spark, pages_small):
    got = {
        (r["src_url"], r["dst_url"])
        for r in edges_from_pages(pages_small).collect()
    }
    want = set()
    for i in range(N):
        src = corpus.url_of(i, N, H)
        for dst in corpus.expected_links(i, N, H):
            want.add((src, dst))
    assert got == want


def test_link_udf_matches_python_normalize_on_edge_cases(spark):
    """The vectorized fast paths must agree byte-for-byte with the per-row
    urljoin reference on every href class, including the residue."""
    from graphscope_spark.extract import _HREF_RE, _normalize, extract_pages

    hrefs = [
        "http://Host.EX/a/b?q=1#frag",      # absolute w/ query+fragment
        "HTTPS://UP.example/PATH",           # uppercase scheme+host
        "http://h.ex",                       # absolute, empty path
        "/rooted/path?x=2#y",                # root-relative
        "#top",                              # fragment-only
        "../up/one",                         # dot segments → residue
        "http://h.ex/a/../b",                # absolute WITH dot segments
        "//proto.relative/p",                # protocol-relative → residue
        "ftp://files.ex/x",                  # non-web scheme → dropped
        "mailto:x@y.z",                      # non-web scheme → dropped
        "/rooted/path?x=2#y",                # duplicate → deduped
    ]
    base = "http://base.ex/dir/page?bq=7#bfrag"
    html = "".join(f'<a href="{h}">t</a>' for h in hrefs)
    df = spark.createDataFrame(
        [(base, None, html.encode(), None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    got = extract_pages(df).select("links").collect()[0]["links"]
    want, seen = [], set()
    for h in _HREF_RE.findall(html):
        u = _normalize(base, h)
        if u is not None and u not in seen:
            seen.add(u)
            want.append(u)
    assert got == want


def test_extracted_text_contains_body_words(pages_small):
    row = extract_pages(pages_small).where(F.col("url").endswith("/p0")).collect()[0]
    assert "Page 0" in row["text"]
    assert "Doc 0" in row["text"]
    assert "<" not in row["text"]  # no tags survive


def test_extraction_byte_identity_across_partitionings(spark, pages_small):
    """Extracted text must be byte-identical per url across partition counts
    and row orders (north-rule per-row invariant)."""
    a = extract_pages(pages_small.repartition(1)).select("url", "text")
    b = extract_pages(pages_small.repartition(7).sortWithinPartitions("warc_ts")).select("url", "text")
    ta = {r["url"]: r["text"].encode() for r in a.collect()}
    tb = {r["url"]: r["text"].encode() for r in b.collect()}
    assert ta == tb


def test_corpus_graph_has_required_structure(corpus_graph):
    # ≥2 weakly connected components by construction (4 isolated groups);
    # dangling targets (external urls with no out-edges); a hot vertex.
    edges = corpus_graph.edges
    verts = corpus_graph.vertices
    n_v = verts.count()
    assert n_v > N  # external dangling targets add vertices
    out_deg = edges.groupBy("src").count()
    hot = out_deg.agg(F.max("count")).collect()[0][0]
    # group heads receive ~N/4 in-links; check in-degree skew instead
    in_deg = edges.groupBy("dst").count()
    hot_in = in_deg.agg(F.max("count")).collect()[0][0]
    assert hot_in > 10 * (edges.count() / n_v)  # ≫ mean degree
    assert hot >= 1
    # self-loops exist
    assert edges.where("src = dst").count() > 0


def test_host_graph_rollup(pages_small):
    """host_graph: url→url edges collapse to host→host with conserved link
    counts; hosts match the corpus's quadratic host map."""
    from graphscope_spark.extract import host_graph

    edges = edges_from_pages(pages_small)
    hg = host_graph(edges).collect()
    # link mass conserved: sum of n_links == number of url edges
    assert sum(r["n_links"] for r in hg) == edges.count()
    hosts = {r["src_host"] for r in hg} | {r["dst_host"] for r in hg}
    # every host is siteK.test (K < H) or externalK.test (dangling targets)
    for h in hosts:
        assert h.endswith(".test")
        assert h.startswith("site") or h.startswith("external")
    site_ids = {int(h[4:-5]) for h in hosts if h.startswith("site")}
    assert site_ids <= set(range(H))
    # the quadratic host map only produces quadratic-residue host ids
    assert site_ids == {(i * i) % H for i in range(N)}


def test_extract_anchors_and_index(pages_small, spark):
    """Anchor extraction: (normalized href, tag-stripped text) pairs match
    the corpus construction; anchor_text_index aggregates inbound texts."""
    from graphscope_spark.extract import anchor_text_index, extract_anchors_udf

    row = (
        pages_small.where(F.col("url").endswith("/p5"))
        .select(extract_anchors_udf(F.col("url"), F.col("html")).alias("a"))
        .collect()[0]
    )
    pairs = sorted((x["href"], x["text"]) for x in row["a"])
    exp = sorted(
        [
            (corpus.url_of(1, N, H), "to 1"),  # parent+hub collapse (same pair)
            (corpus.url_of(9, N, H), "to 9"),
            (corpus.url_of(13, N, H), "to 13"),
            (corpus.external_url(5), "ext"),  # 5 % 17 == 5
        ]
    )
    assert pairs == exp
    idx = anchor_text_index(pages_small)
    hub = idx.where(F.col("url") == corpus.url_of(1, N, H)).collect()[0]
    assert "to 1" in hub["anchor_texts"]
    assert hub["n_refs"] > 10  # every group-1 page carries the hub anchor


def test_canonicalize_url_rules(spark):
    """canonicalize_url: each rule pinned — scheme/host case, fragment,
    default ports (scheme-conditional), empty path, tracking params,
    param sort, emptied-query '?' drop."""
    from graphscope_spark.extract import canonicalize_url

    cases = {
        "HTTP://Site3.Test:80/p7?utm_source=x&id=7#frag": "http://site3.test/p7?id=7",
        "https://A.B:443/": "https://a.b/",
        "https://a.b": "https://a.b/",
        "https://a.b:80/x": "https://a.b:80/x",  # :80 is NOT https default
        "http://h.test:8080/x?b=2&a=1": "http://h.test:8080/x?a=1&b=2",
        "http://h.test/x?utm_campaign=1&gclid=z&fbclid=y&msclkid=w&ref=r": "http://h.test/x",
        "http://h.test/x?ref=abc&ref2=keep&refx=keep2": "http://h.test/x?ref2=keep&refx=keep2",
        "http://h.test/p?id=1#a?fake=q": "http://h.test/p?id=1",  # frag may hide '?'
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    assert got == cases


def test_dedup_by_canonical_url(spark):
    """dedup_by_canonical_url: variant URLs of the same page collapse to
    one canonical row with keeper = min id; distinct pages stay apart."""
    from graphscope_spark.extract import dedup_by_canonical_url

    rows = [
        (1, "http://a.test/p?x=1&y=2"),
        (2, "HTTP://A.Test:80/p?y=2&x=1&utm_source=s#frag"),  # same page
        (3, "http://a.test/p?x=1"),  # different query -> different page
        (4, "https://a.test/p?x=1&y=2"),  # different scheme -> different
    ]
    out = dedup_by_canonical_url(
        spark.createDataFrame(rows, "doc_id long, url string")
    ).collect()
    by_url = {r["canon_url"]: (r["keeper"], r["n_docs"]) for r in out}
    assert by_url == {
        "http://a.test/p?x=1&y=2": (1, 2),
        "http://a.test/p?x=1": (3, 1),
        "https://a.test/p?x=1&y=2": (4, 1),
    }


def test_warc_round_trip_and_malformed(spark, tmp_path):
    """read_warc parses ISO 28500 records written by write_warc, strips
    HTTP headers, filters by record type, and skips malformed records."""
    from graphscope_spark.sources import read_warc, write_warc

    rows = [
        ("http://a.example/", "2026-01-01T00:00:00Z", b"<html>A</html>"),
        ("http://b.example/x", "2026-01-02T00:00:00Z", b"<html>B \xe2\x9c\x93</html>"),
    ]
    p = tmp_path / "crawl"
    p.mkdir()
    write_warc(rows, str(p / "part0.warc"))
    # append garbage + a request-type record: both must be ignored
    with open(p / "part0.warc", "ab") as f:
        f.write(b"garbage bytes not a record\r\n")
        f.write(
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"WARC-Target-URI: http://req.example/\r\n"
            b"WARC-Date: 2026-01-03T00:00:00Z\r\nContent-Length: 3\r\n\r\nGET\r\n\r\n"
        )
        # truncated record (declared longer than remaining bytes)
        f.write(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://trunc.example/\r\n"
            b"WARC-Date: 2026-01-04T00:00:00Z\r\nContent-Length: 99999\r\n\r\nshort"
        )
    got = sorted(
        (r.url, r.warc_ts, bytes(r.html))
        for r in read_warc(spark, str(p)).collect()
    )
    assert got == sorted(rows)
    # request records are reachable when asked for
    reqs = read_warc(spark, str(p), record_types=("request",)).collect()
    assert [r.url for r in reqs] == ["http://req.example/"]
    assert bytes(reqs[0].html) == b"GET"
