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


def write_pages(df: DataFrame, target: str, mode: str = "overwrite") -> None:
    """Write a pages table (iceberg:… or parquet path) — the sink mirror."""
    if target.startswith("iceberg:"):
        df.writeTo(target[len("iceberg:"):]).createOrReplace()
    else:
        df.write.mode(mode).parquet(target)
