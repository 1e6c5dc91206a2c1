"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure Spark SQL expressions (split/filter/aggregate inside whole-stage
codegen) — at 100 TB these run at parquet-scan speed with zero Python. Every
formula is deliberately simple arithmetic so the DuckDB oracle mirrors it
exactly (floats rounded at the gate).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphscope_spark.datapipe.hashing import portable_hash60

# whitespace tokens, empty strings dropped
def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_seen). Whitespace
    tokenization — the BPE-ish regex variant is ``quality_scores``'s
    word-char runs."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars_seen"),
    )


# Tiny multilingual stopword markers: per-language cue words that appear as
# standalone tokens. Deterministic and SQL-mirrorable (token equi-match, no
# regex dialect concerns).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "y"],
    "fr": ["le", "les", "des", "est", "et"],
}


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax of marker-token hit counts,
    ties → lexicographically smallest language code, zero hits → 'und'.
    A real deployment swaps the marker lists for n-gram models; the Spark
    shape (per-language conditional aggregates over one token explode) is
    the production shape."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    aggs = [
        F.sum(F.when(F.col("tok").isin(markers), 1).otherwise(0)).alias(f"c_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    counts = toks.groupBy("doc_id").agg(*aggs)
    # argmax with lexicographic tie-break, via greatest + case chain
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"c_{l}") for l in langs])
    pred = F.lit("und")
    for l in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((best > 0) & (F.col(f"c_{l}") == best), F.lit(l)).otherwise(pred)
    out = counts.select("doc_id", pred.alias("lang_pred"), best.alias("lang_score"))
    # docs with zero tokens never reach the groupBy — restore with 'und'
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang_pred"), F.lit("und")).alias("lang_pred"),
            F.coalesce(F.col("lang_score"), F.lit(0)).alias("lang_score"),
        )
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, alpha_ratio, space_ratio, score).

    score ∈ [0,1]: penalizes degenerate docs (too short, low alphabetic
    density, run-on tokens) — the C4/Gopher-style length+composition rules
    expressed as pure column arithmetic.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    mean_len = F.when(n_tok > 0, (n_chars - spaces) / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    space_ratio = F.when(n_chars > 0, spaces / n_chars).otherwise(F.lit(0.0))
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.alias("n_tokens"),
        mean_len.cast("double").alias("mean_token_len"),
        alpha_ratio.cast("double").alias("alpha_ratio"),
        space_ratio.cast("double").alias("space_ratio"),
        score.cast("double").alias("score"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, score, rank) — the ``top_k`` characteristic terms
    per document by tf·idf, idf = ln(N / df), ties broken by term asc.

    Scale shape (the canonical 100-TB keyword-extraction plan):
    one token explode → (doc, term) count with map-side partial aggregation,
    term document frequencies from the SAME aggregate (no second pass over
    text), idf joined back on the term dictionary — orders of magnitude
    smaller than the corpus, so AQE broadcasts it — and the per-doc top-k is
    a window over doc_id, which co-partitions with the tf aggregate's
    shuffle. Zero Python; everything whole-stage codegen.
    """
    from pyspark.sql import Window

    n_docs = docs.count()
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").withColumn(
        "score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "score", F.col("rank").cast("long").alias("rank"))
    )


def bm25_rank(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, rank) — the ``top_k`` documents for a bag-of-words
    query under Okapi BM25 (Lucene idf variant,
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``), ties by doc_id asc.
    Only documents matching ≥1 query term are candidates.

    Scale shape: the query-term filter lands IMMEDIATELY after the token
    explode, so the tf aggregate shuffles only (doc, query-term) hits —
    a few rows per matching doc, not the token stream; document length is
    computed without an explode at all (``size(tokens)`` per row, one
    scan-side projection); N and avgdl are two scalar aggregates (the one
    driver round-trip, same as tf-idf's N); the |q|-row idf table joins
    broadcast. Zero Python anywhere.
    """
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("toks"),
    )
    dl = toks.select("doc_id", F.size("toks").cast("double").alias("dl"))
    row = dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(df_.withColumn("idf", idf).drop("df")), "term")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    scored = per_term.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition heaps,
    # never a global sort), THEN rank the ≤top_k survivors with the
    # single-partition window, which at that point is trivially small.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(top_k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("long").alias("rank")
    )


def fingerprints(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp_min, fp_max, n_grams): rolling character-k-gram hash
    summary (min/max of the 60-bit gram hashes + gram count). ``fp_min`` is
    a 1-permutation MinHash — equal fp_min is a strong near-dup signal;
    the pair (min,max) is the winnowing-style fingerprint."""
    # One regexp_extract_all lookahead evaluation per row builds the whole
    # overlapping gram array — the explode(positions)+substring alternative
    # is quadratic per document (Catalyst re-evaluates the lower(text)
    # alias past the Generate, and UTF8 substring walks O(pos); measured in
    # datapipe.char_shingles, same fix).
    gram_arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(rf"(?s)(?=(.{{{k}}}))."), F.lit(1)
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(gram_arr).alias("gram")
    ).select("doc_id", portable_hash60(F.col("gram")).alias("g"))
    agg = grams.groupBy("doc_id").agg(
        F.min("g").alias("fp_min"),
        F.max("g").alias("fp_max"),
        F.count("*").alias("n_grams"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("fp_min"), F.lit(0)).alias("fp_min"),
            F.coalesce(F.col("fp_max"), F.lit(0)).alias("fp_max"),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
        )
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word n-grams of ``toks`` (empty below n tokens).
    Guarded `sequence` — Spark generates DESCENDING sequences when
    stop < start, so short docs must short-circuit to an empty array."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - n + 1), gram),
    ).otherwise(F.array().cast("array<string>"))


def repetition_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
    dup_5gram_char_frac) — the Gopher/MassiveText repetition-removal
    signals (Rae et al. 2021 §A1.1), the standard pre-training quality
    filters alongside `quality_scores`:

    * ``dup_line_frac``       — (n_lines − n_distinct_lines) / n_lines over
                                non-empty lines;
    * ``dup_line_char_frac``  — chars in repeated line occurrences beyond
                                the first / total line chars;
    * ``top_2gram_char_frac`` — chars covered by every occurrence of the
                                most frequent word 2-gram (ties: lexical
                                min) / total token chars;
    * ``dup_5gram_char_frac`` — chars covered by all occurrences of word
                                5-grams appearing more than once / total
                                token chars (overlaps counted, may
                                exceed 1 — deterministic and mirrorable).

    Scale shape: two explode→groupBy chains (lines, n-grams), every shuffle
    keyed by (doc_id, token) — the same bounded-key pattern as
    `paragraph_dedup`; no driver state, no UDFs. Per-doc work is linear in
    document length (`_word_ngrams` materializes each n-gram once)."""
    did = F.col(id_col).alias("doc_id")
    text = F.col(text_col)
    toks = _tokens(text)

    ids = docs.select(did)

    # ---- line-level duplication ----
    lines = docs.select(
        did, F.explode(F.filter(F.split(text, "\n"), lambda l: l != "")).alias("line")
    )
    lg = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    ldoc = lg.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.sum((F.col("c") - 1) * F.length("line")).alias("dup_chars"),
        F.sum(F.col("c") * F.length("line")).alias("tot_chars"),
    )

    # ---- token-char denominators ----
    tchars = docs.select(
        did,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("tok_chars"),
    )

    # ---- top 2-gram coverage ----
    g2 = docs.select(did, F.explode(_word_ngrams(toks, 2)).alias("gram"))
    g2c = g2.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    top2 = (
        g2c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("c") * F.length(F.replace(F.col("gram"), F.lit(" "), F.lit("")))).alias(
                "top2_chars"
            ),
        )
    )

    # ---- duplicated 5-gram coverage ----
    g5 = docs.select(did, F.explode(_word_ngrams(toks, 5)).alias("gram"))
    g5c = g5.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    dup5 = g5c.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("c") > 1,
                F.col("c") * F.length(F.replace(F.col("gram"), F.lit(" "), F.lit(""))),
            ).otherwise(F.lit(0))
        ).alias("dup5_chars")
    )

    z = F.lit(0.0)
    return (
        ids.join(ldoc, "doc_id", "left")
        .join(tchars, "doc_id", "left")
        .join(top2, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("n_lines") > 0,
                (F.col("n_lines") - F.col("n_distinct")) / F.col("n_lines"),
            )
            .otherwise(z)
            .cast("double")
            .alias("dup_line_frac"),
            F.when(F.col("tot_chars") > 0, F.col("dup_chars") / F.col("tot_chars"))
            .otherwise(z)
            .cast("double")
            .alias("dup_line_char_frac"),
            F.when(
                (F.col("tok_chars") > 0) & F.col("top2_chars").isNotNull(),
                F.col("top2_chars") / F.col("tok_chars"),
            )
            .otherwise(z)
            .cast("double")
            .alias("top_2gram_char_frac"),
            F.when(
                (F.col("tok_chars") > 0) & F.col("dup5_chars").isNotNull(),
                F.col("dup5_chars") / F.col("tok_chars"),
            )
            .otherwise(z)
            .cast("double")
            .alias("dup_5gram_char_frac"),
        )
    )


def lm_unigram_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy) — CCNet-style LM quality signal
    (Wenzek et al. 2020 score documents by LM perplexity; here the LM is a
    corpus-trained unigram model with add-one smoothing, which keeps the
    whole operator join/agg-only and the oracle exact):

        p(w) = (count(w) + 1) / (N + V)
        cross_entropy(doc) = −mean_{w ∈ doc} log2 p(w)

    Low score ⇒ the document is made of corpus-typical tokens; gibberish /
    boilerplate outliers score high. Scale shape: one explode → map-side
    partially-aggregated token count (vocab-bounded shuffle), the model is
    a broadcastable (token, logp) dictionary joined back to the exploded
    stream, then one mean per doc_id. Nothing driver-side, no UDFs."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    counts = tok.groupBy("tok").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    n, v = int(totals["n"]), int(totals["v"])
    model = counts.select(
        "tok",
        (-F.log2((F.col("c") + 1) / F.lit(float(n + v)))).alias("nll"),
    )
    return (
        tok.join(F.broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("nll").alias("cross_entropy"),
        )
    )


def frequent_tokens(
    docs: DataFrame,
    k: int = 20,
    candidate_capacity: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most frequent tokens: (tok, c), exact counts, deterministic
    tie-break (count desc, token asc).

    Scale path: a per-partition SpaceSaving pass (Metwally et al. 2005)
    nominates at most ``candidate_capacity`` candidates per partition —
    any token with global frequency > N/capacity is guaranteed nominated
    somewhere — then ONE exact counting pass semi-joined to the candidate
    set. The full-vocab groupBy never happens; the only corpus-wide
    shuffle carries (candidate_token, partial_count) pairs. With the
    default capacity the result is exact for every realistic k ≪
    capacity; the guarantee degrades (documented, not silent) only if the
    true k-th item has frequency ≤ N/capacity."""
    import pandas as pd

    tok = docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))

    cap = int(candidate_capacity)

    def nominate(it):
        # ONE SpaceSaving summary per PARTITION, accumulated across Arrow
        # batches and emitted once. (A per-batch top-cap nomination is a
        # near-no-op: Arrow batches are ~10k rows, so almost every distinct
        # token gets nominated and the "broadcast candidate set" becomes
        # the full vocabulary.) Batched SpaceSaving merge: keys absorb
        # exact batch counts; NEW keys enter at the last eviction floor
        # (the overcount that preserves the heavy-hitter guarantee —
        # mergeable-summaries semantics), and the summary prunes to `cap`
        # keys, so per-partition memory is O(cap), not O(vocab).
        summary: dict = {}
        floor_ = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            for tok_, c in pdf["tok"].value_counts().items():
                summary[tok_] = summary.get(tok_, floor_) + int(c)
            if len(summary) > cap:
                top = sorted(summary.items(), key=lambda kv: -kv[1])[:cap]
                floor_ = top[-1][1]
                summary = dict(top)
        if summary:
            yield pd.DataFrame({"tok": list(summary.keys())})

    cands = tok.mapInPandas(nominate, "tok string").distinct()
    return (
        tok.join(F.broadcast(cands), "tok", "semi")
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk) — fixed-size token windows with
    overlap: the corpus → training-sample step every pre-training pipeline
    runs after curation (sliding context windows with stride
    ``max_tokens − overlap``). Chunk k covers token indices
    [k·stride, k·stride + max_tokens); the last window is the first one
    reaching the end of the document (shorter tails are emitted, empty
    docs produce no chunks). Whitespace tokenization (the ``token_counts``
    contract); chunks re-join tokens with single spaces, so byte offsets
    are not preserved — token identity is.

    Scale shape: pure codegen — one ``split``, one in-row ``sequence`` →
    ``transform`` → ``explode``; no shuffle at all (a scan + generate),
    and the explode fan-out is ⌈n_tokens/stride⌉ rows per doc, exactly the
    training-sample count. Deterministic → exact DuckDB mirror via the
    same list-slicing arithmetic."""
    if max_tokens < 1 or overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"need max_tokens >= 1 and 0 <= overlap < max_tokens, "
            f"got {max_tokens}, {overlap}"
        )
    stride = max_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - max_tokens, 0) / stride)
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(
        1 + F.ceil(F.greatest(n - max_tokens, F.lit(0)) / stride).cast("int")
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), toks.alias("ts"), n_chunks.alias("nc")
        )
        .where(F.col("nc") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
            "ts",
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(
                "ts", F.col("chunk_id") * stride + 1, max_tokens
            ).alias("win"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("win").cast("long").alias("n_tokens"),
            F.array_join("win", " ").alias("chunk"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, fp) — winnowing fingerprint selection (Schleimer,
    Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm; the principled
    upgrade of ``fingerprints``' single min/max pair): over the rolling
    character-k-gram hash sequence, every window of ``w`` consecutive
    hashes selects its minimum (rightmost on ties), and the selected
    (position, hash) pairs — deduplicated — are the document's
    fingerprint set. Guarantee: any shared substring of length ≥ k+w−1
    between two documents yields at least one shared fingerprint, while
    density stays ~2/(w+1).

    Spark shape: one regexp gram extraction + posexplode, then ONE window
    min per gram partitioned BY DOCUMENT (never a global window) with the
    (hash, rightmost-pos) tie order packed into a fixed-width string key —
    an encoding both engines minimize identically, keeping the operator
    exactly DuckDB-mirrorable. Work is O(doc length) per document."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got {k}, {w}")
    gram_arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(rf"(?s)(?=(.{{{k}}}))."), F.lit(1)
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(gram_arr).alias("pos", "gram")
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        portable_hash60(F.col("gram")).alias("g"),
    )
    # fixed-width sort key: min ⇒ smallest hash, ties ⇒ rightmost position.
    # The position bias (10^12) bounds supported document length: a pos
    # >= 10^12 would go negative and the '-' prefix would corrupt the
    # lexicographic order, so it is asserted away downstream — 10^12
    # characters per document is ~1 TB of text, far past any real page.
    key = F.concat(
        F.lpad(F.col("g").cast("string"), 19, "0"),
        F.lpad((F.lit(1_000_000_000_000) - F.col("pos")).cast("string"), 13, "0"),
    )
    win = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = (
        grams.withColumn("sel", F.min(key).over(win))
        .withColumn("nwin", F.count("*").over(win))
        .where(F.col("nwin") == w)  # full windows only
        .select(
            "doc_id",
            (
                F.lit(1_000_000_000_000)
                - F.substring("sel", 20, 13).cast("long")
            ).alias("pos"),
            F.substring("sel", 1, 19).cast("long").alias("fp"),
        )
        .distinct()
    )
    return sel


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_sents, n_words, n_syll, flesch) — Flesch Reading Ease
    (Flesch 1948: 206.835 − 1.015·words/sentences − 84.6·syllables/word),
    the classic curation-side readability signal (a C4/Gopher-family
    quality feature computable without any model).

    Heuristics, pinned so both engines agree bit-for-bit: sentences =
    maximal runs of [.!?], floored at 1 whenever the doc has words (an
    unterminated doc is one sentence); words = whitespace tokens;
    syllables = vowel groups ([aeiouy]+) over the text, floored at one
    per word. Pure codegen (regexp counts over the scan, zero shuffles);
    docs with no words emit NULL flesch."""
    t = F.lower(F.col(text_col))
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks)
    sent_runs = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0)))
    n_sents = F.when(n_words > 0, F.greatest(sent_runs, F.lit(1))).otherwise(
        F.lit(0)
    )
    # vowel groups across the whole text, but never fewer than one per word
    vgroups = F.size(F.regexp_extract_all(t, F.lit(r"[aeiouy]+"), F.lit(0)))
    n_syll = F.when(n_words > 0, F.greatest(vgroups, n_words)).otherwise(F.lit(0))
    flesch = F.when(
        n_words > 0,
        206.835
        - 1.015 * (n_words.cast("double") / n_sents.cast("double"))
        - 84.6 * (n_syll.cast("double") / n_words.cast("double")),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_sents.cast("long").alias("n_sents"),
        n_words.cast("long").alias("n_words"),
        n_syll.cast("long").alias("n_syll"),
        flesch.alias("flesch"),
    )


def token_zipf(
    docs: DataFrame,
    top_k: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row (n_types, n_tokens, slope, intercept, r2) — Zipf rank-
    frequency fit over the corpus vocabulary: OLS of log10(freq) on
    log10(rank) across the ``top_k`` most frequent tokens (ties broken by
    token asc so ranks are deterministic). A healthy natural-language
    corpus fits slope ≈ −1; synthetic/templated corpora diverge — the
    corpus-level twin of `degree_stats`' power-law tail MLE.

    Shape: one token explode → (token, freq) aggregate; ranking the top-k
    is a TakeOrderedAndProject (never a global sort); the regression is
    one aggregate over k rows."""
    toks = docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").cast("double").alias("f"))
    stats = freq.agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
    )
    top = freq.orderBy(F.col("f").desc(), F.col("tok").asc()).limit(top_k)
    from pyspark.sql.window import Window

    ranked = top.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.col("f").desc(), F.col("tok").asc()))
        .cast("double"),
    ).select(F.log10("r").alias("x"), F.log10("f").alias("y"))
    sums = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    reg = sums.select(
        slope.alias("slope"),
        ((F.col("sy") - F.col("sx") * slope) / F.col("n")).alias("intercept"),
        (
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("r2"),
    )
    return stats.crossJoin(F.broadcast(reg))
