"""Page-table sources — the ingestion boundary of the engine.

The north rule's input is an **Iceberg table** of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``; this container has no Iceberg runtime
jar, so the Iceberg path is gated behind a capability probe and the parquet
path (identical schema, identical downstream pipeline) is the tested
fallback. On a real cluster, add
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and both paths
are live with zero engine changes — everything downstream consumes a plain
DataFrame.

Reference analog: the loader's multi-scheme sources (`python/graphscope/
framework/loader.py:94-211` — file://, oss://, hdfs://, s3://, vineyard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SQL extension/catalog is usable in this session."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table from ``source``:

    * ``iceberg:<catalog.db.table>`` — Iceberg table (requires runtime jar);
    * anything else — a parquet path/directory.

    Validates the page schema either way.
    """
    if source.startswith("iceberg:"):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; submit with "
                "--packages org.apache.iceberg:iceberg-spark-runtime or "
                "point at a parquet path instead"
            )
        df = spark.read.format("iceberg").load(source[len("iceberg:"):])
    else:
        df = spark.read.parquet(source)
    missing = [c for c in PAGE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages table missing columns {missing}; has {df.columns}")
    return df.select(*PAGE_COLUMNS)


def read_edge_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    src_col: str | int = "src",
    dst_col: str | int = "dst",
    comment: str | None = None,
) -> DataFrame:
    """Edge-list CSV → (src long, dst long) DataFrame.

    Mirrors the reference loader's CSV options (`python/graphscope/
    framework/loader.py:139-211`: ``header_row``, ``delimiter``) and the
    p2p-31 edge files its tests load (`test/app_tests.sh:180-186`). With
    ``header=False`` address columns by 0-based position (the loader's
    ``e_0/e_1`` convention).

    Scale note: Spark's CSV source is splittable — a 1 TB edge file fans out
    across executors; schema is pinned (no inference pass over the data).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("inferSchema", "false")
        .option("mode", "DROPMALFORMED")
    )
    if comment:
        reader = reader.option("comment", comment)
    df = reader.csv(path)
    if isinstance(src_col, int) or isinstance(dst_col, int):
        cols = df.columns
        src_name = cols[src_col] if isinstance(src_col, int) else src_col
        dst_name = cols[dst_col] if isinstance(dst_col, int) else dst_col
    else:
        src_name, dst_name = src_col, dst_col
    from pyspark.sql import functions as F

    # try_cast, not cast: non-numeric junk rows become NULL and are dropped
    # (plain CAST throws under Spark 4's default ANSI mode)
    return df.select(
        F.col(src_name).try_cast("long").alias("src"),
        F.col(dst_name).try_cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())


def write_pages(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write a pages table (iceberg:… or parquet path) — the sink mirror."""
    if target.startswith("iceberg:"):
        df.writeTo(target[len("iceberg:"):]).createOrReplace()
    else:
        df.write.mode(mode).parquet(target)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
) -> DataFrame:
    """(url, warc_ts, html) — dependency-free WARC/1.0-1.1 ingestion: the
    raw-crawl format behind the Common-Crawl-style pages table this engine
    is keyed to (the north rule's corpus BEFORE it lands in Iceberg;
    reference loader analog `framework/loader.py:94-211`'s multi-scheme
    front door).

    Reads whole .warc files via Spark's ``binaryFile`` source and splits
    records with an Arrow-batched ``mapInPandas`` parser — per-record
    framing follows ISO 28500: a ``WARC/1.x`` version line, CRLF header
    block (``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
    ``Content-Length``), a CRLF CRLF separator, then exactly
    ``Content-Length`` payload bytes and a CRLF CRLF record terminator.
    For ``response`` records the payload's leading HTTP header block (if
    present) is stripped, leaving the html body bytes.

    Scale shape: one task per WARC file (the format is file-splittable
    only at gzip member boundaries, which plain .warc lacks), parsing is
    sequential within a file and embarrassingly parallel across the
    thousands of files a crawl ships. Malformed records are skipped, not
    fatal — crawl archives contain them.
    """
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401  (schema-side only)

    want = {t.lower() for t in record_types}

    def parse_files(batches):
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": []}
            for blob in pdf["content"]:
                for rec in _split_warc_records(bytes(blob)):
                    headers, payload = rec
                    if headers.get("warc-type", "").lower() not in want:
                        continue
                    url = headers.get("warc-target-uri", "")
                    ts = headers.get("warc-date", "")
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(_strip_http_headers(payload))
            yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(
        parse_files, schema="url string, warc_ts string, html binary"
    )


def _split_warc_records(buf: bytes):
    """Yield (headers: dict, payload: bytes) per well-formed WARC record."""
    i, n = 0, len(buf)
    while i < n:
        # seek the version line
        j = buf.find(b"WARC/", i)
        if j < 0:
            return
        hdr_end = buf.find(b"\r\n\r\n", j)
        if hdr_end < 0:
            return
        headers = {}
        for line in buf[j:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            i = hdr_end + 4
            continue
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            return  # truncated record
        yield headers, buf[body_start:body_end]
        i = body_end


def _strip_http_headers(payload: bytes) -> bytes:
    """Drop a leading HTTP/1.x response header block, if present."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def write_warc(rows, path: str) -> None:
    """Test/fixture helper: serialize (url, warc_ts, html-bytes) triples as
    a minimal ISO 28500 WARC/1.0 file with HTTP response payloads — the
    round-trip twin of ``read_warc`` (driver-side; fixtures only)."""
    with open(path, "wb") as f:
        for url, ts, html in rows:
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
            hdr = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + f"WARC-Date: {ts}\r\n".encode()
                + f"Content-Length: {len(http)}\r\n".encode()
                + b"\r\n"
            )
            f.write(hdr + http + b"\r\n\r\n")
