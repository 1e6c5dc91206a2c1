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
