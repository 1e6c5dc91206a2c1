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


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(url: pd.Series, html: pd.Series) -> pd.Series:
    """Deduplicated, normalized absolute out-links per page."""
    docs = html.map(lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or ""))
    out = []
    for base, doc in zip(url.values, docs.values):
        hrefs = _HREF_RE.findall(doc)
        seen: set[str] = set()
        links: list[str] = []
        for h in hrefs:
            u = _normalize(base, h)
            if u is not None and u not in seen:
                seen.add(u)
                links.append(u)
        out.append(links)
    return pd.Series(out)


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
