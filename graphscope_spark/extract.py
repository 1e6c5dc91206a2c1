"""html → text / out-link extraction as Arrow-vectorized pandas UDFs.

This is the engine's ingestion front end (north rule: "extract a url->url
edge table from Common-Crawl-style web pages ... byte-identical extracted
text per url via vectorized Arrow UDFs, links parsed from html").

Both UDFs are pure functions of their inputs — no state, no randomness, no
locale dependence — so extracted text is byte-identical per url across runs,
partition counts and row orders (tested in tests/test_extract.py, mirroring
the reference's golden-output byte-compare,
`/root/reference/analytical_engine/test/app_tests.sh:115-126`).

Per the input hint, no per-row Python UDFs: these are pandas UDFs over Arrow
batches; the inner work is pandas vectorized string ops, with Python-level
iteration only for URL resolution of the (small) relative-href subset.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- text extraction ---------------------------------------------------------

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&"),
             ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")]


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Visible text of an html document: drop script/style, strip tags,
    decode the common entities, collapse whitespace. Deterministic."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or ""))
    s = s.str.replace(_SCRIPT_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_WS_RE, " ", regex=True).str.strip()
    return s


# --- link extraction ---------------------------------------------------------

_HREF_RE = re.compile(r"""(?is)<a\b[^>]*?\bhref\s*=\s*["']([^"']*)["']""")


def _normalize(base: str, href: str) -> str | None:
    """Resolve href against base url; strip fragment; lowercase scheme+host;
    keep only http(s). Returns None for non-web schemes."""
    href = href.strip()
    absu = urljoin(base, href)
    parts = urlsplit(absu)
    if parts.scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    path = parts.path or "/"
    return urlunsplit((parts.scheme.lower(), netloc, path, parts.query, ""))


# Simple-absolute: http(s), no dot-segments, no embedded whitespace — the
# overwhelming majority of real hrefs; anything else falls back to urljoin.
_ABS_RE = re.compile(r"(?i)^(https?)://([^/?#\s]+)([^?#\s]*)(?:\?([^#\s]*))?(?:#\S*)?$")
_DOTSEG_RE = re.compile(r"/\.\.?(?:/|$)")
_BASE_RE = re.compile(r"(?i)^(https?)://([^/?#]*)")


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """Deduplicated, normalized absolute out-links per page.

    Vectorized hot path (this is the single hottest ingestion loop at
    10¹²-document scale): hrefs are pulled with one ``str.extractall`` per
    Arrow batch, then resolved class-by-class with pandas string ops —
    simple absolute http(s) URLs, root-relative paths, and fragment-only
    refs cover essentially all crawl hrefs. Only the residue (dot-segments,
    protocol-relative, exotic schemes) walks through per-row ``urljoin``,
    which keeps output byte-identical to the reference semantics
    (tests/test_invariance.py pins this)."""
    docs = html.map(
        lambda b: b.decode("utf-8", errors="replace")
        if isinstance(b, (bytes, bytearray))
        else (b or "")
    )
    docs.index = pd.RangeIndex(len(docs))
    urls = pd.Series(url.values, index=docs.index, dtype=object)
    ex = docs.str.extractall(_HREF_RE)
    n = len(docs)
    if len(ex) == 0:
        return pd.Series([[] for _ in range(n)])
    href = ex[0].str.strip()
    row = href.index.get_level_values(0)
    base = pd.Series(urls.values[row], index=href.index, dtype=object)
    resolved = pd.Series(index=href.index, dtype=object)

    # class 1: simple absolute http(s)
    parts = href.str.extract(_ABS_RE)
    is_abs = parts[0].notna() & ~href.str.contains(_DOTSEG_RE, regex=True)
    if is_abs.any():
        scheme = parts.loc[is_abs, 0].str.lower()
        host = parts.loc[is_abs, 1].str.lower()
        path = parts.loc[is_abs, 2].replace("", "/")
        query = parts.loc[is_abs, 3]
        out = scheme + "://" + host + path
        out = out.where(query.isna() | (query == ""), out + "?" + query.fillna(""))
        resolved.loc[is_abs] = out

    # base scheme/host for relative classes
    bparts = base.str.extract(_BASE_RE)
    bpre = bparts[0].str.lower() + "://" + bparts[1].str.lower()

    # class 2: root-relative path ("/p5?q#frag"), not protocol-relative
    is_root = (
        resolved.isna()
        & href.str.startswith("/")
        & ~href.str.startswith("//")
        & ~href.str.contains(_DOTSEG_RE, regex=True)
        & ~href.str.contains(r"\s", regex=True)
        & bparts[0].notna()
    )
    if is_root.any():
        pq = href.loc[is_root].str.replace(r"#.*$", "", regex=True).replace("", "/")
        resolved.loc[is_root] = bpre.loc[is_root] + pq

    # class 3: fragment-only ("#top") → the page itself, normalized
    is_frag = resolved.isna() & href.str.startswith("#") & bparts[0].notna()
    if is_frag.any():
        bp = base.loc[is_frag].str.extract(
            r"(?i)^https?://[^/?#]*([^?#]*)(?:\?([^#]*))?"
        )
        path = bp[0].replace("", "/")
        query = bp[1]
        out = bpre.loc[is_frag] + path
        out = out.where(query.isna() | (query == ""), out + "?" + query.fillna(""))
        resolved.loc[is_frag] = out

    # residue: full RFC resolution per row (rare)
    rest = resolved.isna()
    if rest.any():
        resolved.loc[rest] = [
            _normalize(b, h) for b, h in zip(base.loc[rest].values, href.loc[rest].values)
        ]

    out_lists: list[list[str]] = [[] for _ in range(n)]
    seen: list[set] = [set() for _ in range(n)]
    for r, u in zip(row, resolved.values):
        if u is not None and u not in seen[r]:
            seen[r].add(u)
            out_lists[r].append(u)
    return pd.Series(out_lists)


# --- DataFrame-level pipeline -------------------------------------------------


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, warc_ts, lang, text, links).

    ``text`` is re-extracted from html (the stored column may be stale/null);
    ``links`` is an array of normalized absolute urls.
    """
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text(F.col("html")).alias("text"),
        extract_links_udf(F.col("url"), F.col("html")).alias("links"),
    )


def edges_from_pages(pages: DataFrame) -> DataFrame:
    """url→url edge table: explode links, dedup. Keeps self-loops (dropped
    later where semantics require, e.g. triangles)."""
    return (
        extract_pages(pages)
        .select(F.col("url").alias("src_url"), F.explode("links").alias("dst_url"))
        .distinct()
    )
