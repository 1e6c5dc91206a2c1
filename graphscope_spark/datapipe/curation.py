"""Corpus-curation operators: PII scan/redaction, C4-style heuristic
filters, deterministic train/val/test splits, stratified sampling, and
benchmark decontamination.

These are the remaining standard passes of a pre-training data pipeline
(alongside `textstats` quality/repetition signals and `dedup`): Raffel et
al. 2020 (C4) §2.2 heuristic cleaning, the hash-split convention every
training job uses, and eval-benchmark n-gram decontamination (Brown et al.
2020 §C / Chowdhery et al. 2022 §C).

Reference scope note: the reference engine (analytical_engine/) has no
text-curation surface — these operators extend the engine for its stated
100 TB web-corpus target, same as the rest of `datapipe`.

Every operator is pure `pyspark.sql.functions` column arithmetic — no
Python UDFs anywhere, so at 100 TB these run at parquet-scan speed inside
whole-stage codegen. Regex patterns are restricted to the Java∩RE2 common
dialect (character classes, bounded quantifiers, `\\b`) so the DuckDB gate
oracles evaluate them bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.datapipe.hashing import portable_hash60

# -- PII ----------------------------------------------------------------------
#
# Patterns deliberately use only constructs with identical semantics in
# Java regex (Spark codegen) and RE2 (DuckDB): no lookaround, no backrefs.
# Applied in this order — emails first so their digit runs can't be half
# consumed as phone numbers, then IPs, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_phone, redacted_len, redacted_md5).

    Counts each PII class and replaces every occurrence with its typed
    placeholder; `redacted_md5` lets two engines agree on the exact
    redacted byte stream without shipping it. Counts are taken BEFORE any
    replacement (on the raw text) so classes don't mask each other's
    counts; the redaction itself is sequential in PII_PATTERNS order.

    Scale shape: one scan, zero shuffles — three regexp_count + three
    chained regexp_replace per row, all inside whole-stage codegen.
    """
    text = F.col(text_col)
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    red = text
    for name, pat, tok in PII_PATTERNS:
        cols.append(F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, tok)
    cols.append(F.length(red).cast("long").alias("redacted_len"))
    cols.append(F.md5(red.cast("binary")).alias("redacted_md5"))
    return docs.select(*cols)


# -- C4-style heuristic filters -------------------------------------------------


def c4_filters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len, terminal_punct_line_frac,
    has_curly_brace, has_lorem_ipsum, keep) — the C4 cleaning heuristics
    (Raffel et al. 2020 §2.2) as one codegen pass:

    * word-count window ``[min_words, max_words]``;
    * mean word length in [3, 10] (Gopher's run-on/fragment guard);
    * fraction of non-empty lines ending in terminal punctuation ``.!?"``;
    * curly brace → likely code; "lorem ipsum" → boilerplate;
    * ``keep`` = count ok ∧ mean-len ok ∧ ¬curly ∧ ¬lorem.

    One scan, zero shuffles, zero Python.
    """
    text = F.col(text_col)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n_words = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_len = F.when(n_words > 0, tok_chars / n_words).otherwise(F.lit(0.0))
    lines = F.filter(F.split(text, "\n"), lambda l: l != "")
    n_lines = F.size(lines)
    term = F.size(F.filter(lines, lambda l: l.rlike('[.!?"]$')))
    term_frac = F.when(n_lines > 0, term / n_lines).otherwise(F.lit(0.0))
    has_curly = F.contains(text, F.lit("{"))
    has_lorem = F.contains(F.lower(text), F.lit("lorem ipsum"))
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= 3)
        & (mean_len <= 10)
        & ~has_curly
        & ~has_lorem
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_len.cast("double").alias("mean_word_len"),
        term_frac.cast("double").alias("terminal_punct_line_frac"),
        has_curly.alias("has_curly_brace"),
        has_lorem.alias("has_lorem_ipsum"),
        keep.alias("keep"),
    )


# -- deterministic splits --------------------------------------------------------


def deterministic_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, int, int] = (90, 5, 5),
    salt: str = "split",
) -> DataFrame:
    """(doc_id, bucket, split) — hash-bucket train/val/test assignment.

    bucket = portable_hash60('{salt}:{id}') mod 100; split boundaries are
    the cumulative ``weights``. Hash-of-id (not random) is the production
    convention: stable under re-runs, re-partitioning, and incremental
    ingestion — a document never migrates between splits when the corpus
    grows, which row-number or rand()-based splits cannot guarantee.

    One scan, zero shuffles.
    """
    t, v, _ = weights
    bucket = portable_hash60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    ) % 100
    split = (
        F.when(bucket < t, F.lit("train"))
        .when(bucket < t + v, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        bucket.cast("long").alias("bucket"),
        split.alias("split"),
    )


def stratified_sample(
    docs: DataFrame,
    frac: float = 0.2,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sample: within each stratum keep the
    ceil(frac·n) rows with the smallest hash(salt:id) — exact per-stratum
    quota (unlike Bernoulli `sample()`), reproducible, and order-free.

    Scale shape: one shuffle on the stratum key for the window rank plus
    one tiny per-stratum count aggregate that AQE broadcasts back. For
    strata far larger than executor memory the same semantics can shard
    the window by (stratum, hash-prefix); at a web corpus's lang
    cardinality the plain window is the right plan.
    """
    h = portable_hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("stratum").orderBy(F.asc("h"), F.asc("doc_id"))
    ranked = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(strata_col).alias("stratum"),
        h.alias("h"),
    ).withColumn("rn", F.row_number().over(w))
    quota = (
        ranked.groupBy("stratum")
        .agg(F.ceil(F.count("*") * F.lit(frac)).cast("long").alias("quota"))
    )
    return (
        ranked.join(quota, "stratum")
        .where(F.col("rn") <= F.col("quota"))
        .select("doc_id", "stratum")
    )


# -- benchmark decontamination ----------------------------------------------------


def _word_ngram_hashes(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, g): 60-bit hashes of the word n-grams of each document.
    Hashing before the shuffle keeps every downstream exchange fixed-width
    longs instead of strings — the same trick as MinHash shingling."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    gram = lambda i: F.concat_ws(" ", *[F.element_at(F.col("tk"), i + j) for j in range(n)])  # noqa: E731
    grams = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"), toks.alias("tk"))
        .select(
            "doc_id",
            F.when(
                F.size("tk") >= n,
                F.transform(F.sequence(F.lit(1), F.size("tk") - n + 1), gram),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("gs"),
        )
        .select("doc_id", F.explode("gs").alias("gram"))
    )
    return grams.select("doc_id", portable_hash60(F.col("gram")).alias("g"))


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hit_grams, n_grams, contaminated) — eval-benchmark
    decontamination: a corpus document is contaminated iff it shares any
    word ``n``-gram with any benchmark document (the GPT-3/PaLM 13-gram
    rule; ``n`` is a parameter because the right value is tokenizer- and
    benchmark-dependent).

    ``n_hit_grams`` counts the document's DISTINCT n-grams that appear in
    the benchmark's gram set; ``n_grams`` is its distinct n-gram total.

    Scale shape: the benchmark side is thousands of docs vs the corpus's
    billions — its distinct gram set reduces to a narrow long column that
    AQE broadcasts, so the corpus side is one scan + one explode with NO
    corpus-wide shuffle on text. Gram hashes (60-bit) keep the broadcast
    and the probe fixed-width.
    """
    bench_grams = (
        _word_ngram_hashes(benchmark, n, id_col, text_col).select("g").distinct()
    )
    corpus = _word_ngram_hashes(docs, n, id_col, text_col).distinct()
    hits = (
        corpus.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hit_grams"))
    )
    totals = corpus.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias("n_hit_grams"),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )
