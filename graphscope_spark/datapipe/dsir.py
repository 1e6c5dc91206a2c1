"""DSIR — data selection via importance resampling (Xie et al., NeurIPS
2023, "Data Selection for Language Models via Importance Resampling").

The canonical 100 TB pre-training curation step the reference's datapipe
story implies but no single reference operator covers: given a huge RAW
corpus and a small TARGET corpus (the distribution you want — e.g. one
language, one domain, a quality slice), estimate per-document importance
weights under hashed n-gram feature distributions and resample raw docs
toward the target.

Method (paper §3, re-expressed Spark-first):

1. features: unigrams + bigrams of the whitespace-lowercase token stream,
   hashed into ``buckets`` counts (the "hashed n-gram" generative model).
2. fit two multinomials with add-one smoothing: p̂ over the TARGET slice's
   bucket counts, q̂ over the RAW corpus's.
3. per raw doc: log w(doc) = Σ_b n_doc[b] · (ln p̂[b] − ln q̂[b]).
4. resample: top-k by log w + Gumbel(0,1) noise — Gumbel-top-k draws k
   docs ∝ exp(log w) without replacement. The Gumbel is hash-derived
   (u = (h+1)/(2^60+1), g = −ln(−ln u)) — deterministic, no RNG state.

Scale shape: ONE token explode per corpus → (doc, bucket) counts with
map-side partial aggregation; both fitted models are ``buckets`` rows
(a few thousand) → broadcast join back onto per-doc bucket counts; the
per-doc weight is one sum. No shuffle grows with corpus size beyond the
(doc, bucket) aggregation, and ``buckets`` bounds model/driver memory —
exactly the paper's motivation (importance weights in hashed feature
space, never in model space). Everything is codegen (split/explode/hash/
log); md5-based hashing keeps every step DuckDB-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphscope_spark.bsp import truncate_plan
from graphscope_spark.datapipe.hashing import portable_hash60


def _tokens(text):
    # identical to textstats._tokens (whitespace, lowercased, empties out)
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def _doc_buckets(
    docs: DataFrame, buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, b, c) — hashed unigram+bigram counts per document.
    Bigrams are joined with '\\x1f' (never a token character) so the
    feature spaces cannot collide; both n-gram orders hash into the SAME
    bucket range, as in the paper's hashed feature map."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("ts")
    )
    grams = toks.select(
        "doc_id",
        F.concat(
            F.col("ts"),
            F.zip_with(
                F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                lambda a, b: F.concat_ws("\x1f", a, b),
            ),
        ).alias("gs"),
    )
    return (
        grams.select("doc_id", F.explode("gs").alias("g"))
        .select("doc_id", (portable_hash60(F.col("g")) % buckets).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").cast("double").alias("c"))
    )


def _fit_log_model(doc_buckets: DataFrame, buckets: int) -> DataFrame:
    """(b, logp) — add-one-smoothed multinomial over bucket counts.
    ``buckets`` rows; broadcast-sized by construction."""
    agg = doc_buckets.groupBy("b").agg(F.sum("c").alias("c"))
    total = agg.agg(F.sum("c")).collect()[0][0] or 0.0
    return agg.select(
        "b", F.log((F.col("c") + 1.0) / F.lit(total + buckets)).alias("logp")
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_feats, log_w) for every doc in ``docs``: the DSIR
    importance log-weight of the doc under target-vs-raw hashed-n-gram
    multinomials. ``target`` is any document slice with the same columns
    (typically a filter of ``docs`` or a separate curated table).

    Buckets absent from a fitted model's support still carry smoothed mass
    ln(1/(total+B)) — materialized via a dense 0..B-1 bucket spine so docs
    hitting unseen buckets are scored, not dropped."""
    raw_b = _doc_buckets(docs, buckets, id_col, text_col).persist()
    tgt_b = _doc_buckets(target, buckets, id_col, text_col)
    spark = docs.sparkSession
    spine = spark.range(buckets).select(F.col("id").cast("long").alias("b"))

    def dense(model: DataFrame, total_plus_b_log: DataFrame, name: str):
        # 1-row × buckets-row broadcast cross join: bounded by construction
        return (
            spine.join(model, "b", "left")
            .crossJoin(F.broadcast(total_plus_b_log))
            .select(
                "b",
                F.coalesce(F.col("logp"), -F.col("log_tb")).alias(name),
            )
        )

    # ln(total+B) for the unseen-bucket floor, computed once per model
    def log_tb(doc_buckets: DataFrame) -> DataFrame:
        return doc_buckets.agg(
            F.log(F.coalesce(F.sum("c"), F.lit(0.0)) + buckets).alias("log_tb")
        )

    p = dense(_fit_log_model(tgt_b, buckets), log_tb(tgt_b), "logp_t")
    q = dense(_fit_log_model(raw_b, buckets), log_tb(raw_b), "logp_r")
    w = F.broadcast(
        p.join(q, "b").select("b", (F.col("logp_t") - F.col("logp_r")).alias("llr"))
    )
    out = (
        raw_b.join(w, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("llr")).alias("log_w"),
        )
    )
    # docs with zero tokens have no buckets: restore with log_w = 0
    result = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )
    result = truncate_plan(result)
    raw_b.unpersist()
    return result


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """(doc_id, log_w, key, rank) — Gumbel-top-k resampling of the
    weighted docs: rank docs by log_w + Gumbel noise and keep the top k,
    which draws k docs ∝ exp(log_w) without replacement (the paper's
    sampled-importance-resampling step). Noise is hash-derived from
    (seed, doc_id) — bit-deterministic across cluster sizes."""
    u = (portable_hash60(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))) + 1.0) / float((1 << 60) + 1)
    g = -F.log(-F.log(u))
    keyed = weights.select("doc_id", "log_w", (F.col("log_w") + g).alias("key"))
    # scale shape: orderBy().limit(k) compiles to TakeOrderedAndProject
    # (per-partition top-k + driver merge of k·P rows) — never a global
    # sort; the rank window then runs over k rows only
    top = keyed.orderBy(F.col("key").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("key").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
