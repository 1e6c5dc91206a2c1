"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All stages are JVM-side Spark SQL expressions (shingling via
``sequence``+``substring`` inside whole-stage codegen, signatures via one
groupBy with P min-aggregates, banding via explode + hash-partitioned
self-join) — no Python rows. The 100 TB shape:

* shingling explodes ~n_chars rows/doc but never materializes: it flows
  straight into a partial (map-side) min-aggregate, so shuffle volume is
  ``docs × P`` longs, not the shingle stream;
* LSH buckets are the classic band trick — only documents sharing a band key
  are ever paired, so the candidate join is band-key-partitioned and skew
  is bounded by bucket size (a pathological bucket means near-identical
  docs, which is exactly the output);
* the exact-Jaccard verify joins candidate pairs back to distinct shingle
  sets — proportional to candidates, not n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphscope_spark.datapipe.hashing import (
    base_hash32,
    portable_hash60,
    universal_hash,
)

# -- exact ----------------------------------------------------------------------


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id, group_size): canonical = min id per identical
    md5(text). Rows with canonical_id == doc_id are the keepers."""
    keyed = docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("h"))
    groups = keyed.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return keyed.join(groups, "h").select("doc_id", "canonical_id", "group_size")


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_df: int = 1,
) -> DataFrame:
    """(doc_id, text) — paragraph-level exact dedup, the CCNet/RefinedWeb
    boilerplate pass: split each document on ``sep``, drop every paragraph
    whose exact content appears in MORE than ``max_df`` distinct documents
    (site chrome, cookie banners, license footers), re-join the survivors
    in original order. Documents whose every paragraph is boilerplate are
    dropped entirely (CCNet's behavior).

    100 TB shape: paragraphs are exploded WITH their position but the
    document-frequency count shuffles only ``xxhash64(paragraph)`` + doc id
    (distinct → count>max_df), never the paragraph text; the heavy-hitter
    hash set that survives the HAVING is orders of magnitude smaller than
    the corpus and anti-joins back against the paragraph stream (hash
    equality stands in for string equality — a 64-bit collision mislabels
    one paragraph as boilerplate; at CCNet scale this is the standard
    trade). Reassembly is one groupBy(doc) with an in-group sort — three
    shuffles total, all on fixed-width keys.
    """
    paras = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).where(F.col("para") != "")
    hashed = paras.withColumn("h", F.xxhash64("para"))
    boiler = (
        hashed.select("h", "doc_id")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
        .select("h")
    )
    kept = hashed.join(boiler, "h", "left_anti")
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("text")
        )
    )


# -- shingling ------------------------------------------------------------------


def char_shingles(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    distinct: bool = True,
    hashed: bool = False,
) -> DataFrame:
    """Lowercase character k-grams per doc: (doc_id, shingle), distinct by
    default (set semantics, what Jaccard needs). ``distinct=False`` skips
    the dedup EXCHANGE — a full shuffle of every shingle — for consumers
    that are duplicate-insensitive (MinHash: min over a multiset == min
    over its set). ``hashed=True`` emits the 60-bit md5 hash of each
    shingle instead of the gram string: the distinct/set-intersection
    exchanges then move 8-byte longs instead of k-char strings, with
    the SAME values on the DuckDB side (portable md5 hash), so set sizes
    and intersections stay bit-identical between the engines.

    Shape note (measured): the obvious explode(positions)→substring plan
    is QUADRATIC per document — Catalyst inlines the lower(text) alias
    past the Generate, re-evaluating it per generated row, and Spark's
    UTF8 substring itself walks O(pos) to the codepoint boundary (9.56 s
    for 2,000×4,000-char docs vs 1.03 s for 20,000×400-char docs at EQUAL
    total gram count; real web pages are 10–40 KB, so quadratic is a
    scale-killer). Instead the whole overlapping gram array is built by
    ONE expression evaluation per row — ``regexp_extract_all`` with a
    lookahead capture ``(?s)(?=(.{k})).`` — and exploded: 2.32 s / 0.55 s
    on the same two layouts, linear in document length, character-exact
    vs the SQL oracle on any text."""
    grams = F.regexp_extract_all(
        F.lower(F.col(text_col)),
        F.lit(rf"(?s)(?=(.{{{k}}}))."),
        F.lit(1),
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle")
    )
    if hashed:
        out = out.select("doc_id", portable_hash60(F.col("shingle")).alias("shingle"))
    return out.distinct() if distinct else out


# -- MinHash + LSH ---------------------------------------------------------------


def minhash_signatures(
    shingles: DataFrame, num_perm: int = 16, hashed: bool = False
) -> DataFrame:
    """(doc_id, sig_0..sig_{P-1}): per-permutation min of a universal-hash
    family over ONE base hash per shingle (P md5 calls per shingle were
    the dominant signature cost — measured 16× ≈ 40 s at sf0.1). One
    groupBy, P partial-aggregated mins — shuffle is docs × P longs
    regardless of shingle volume.

    ``hashed=True``: the input carries 60-bit shingle hashes
    (``char_shingles(hashed=True)``); the base hash is their low 32 bits —
    no second md5, and the SAME distinct-hashed frame can feed both the
    signature aggregate and the exact verify."""
    if hashed:
        h0 = (F.col("shingle") % F.lit(4294967296)).alias("h0")
    else:
        h0 = base_hash32(F.col("shingle")).alias("h0")
    base = shingles.select("doc_id", h0)
    aggs = [
        F.min(universal_hash(F.col("h0"), p)).alias(f"sig_{p}")
        for p in range(num_perm)
    ]
    return base.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int = 16, bands: int = 4
) -> DataFrame:
    """Distinct (a, b) a<b sharing at least one LSH band. Band key =
    md5 of the band's signature slice."""
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        slice_cols = [F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("_", *slice_cols)).alias("key"),
            )
        )
    keyed = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = keyed.select(F.col("band"), F.col("key"), F.col("doc_id").alias("a"))
    right = keyed.select(F.col("band"), F.col("key"), F.col("doc_id").alias("b"))
    return (
        left.join(right, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_of_pairs(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs: (a, b, jac). |∩| via shingle
    equi-join restricted to candidates; |∪| = |A|+|B|-|∩|."""
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("doc_id").alias("a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("ninter"))
    )
    na = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    return (
        pairs.join(inter, ["a", "b"], "left")
        .join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (
                F.coalesce(F.col("ninter"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("ninter"), F.lit(0)))
            ).alias("jac"),
        )
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    k: int = 5,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "auto",
) -> DataFrame:
    """Near-duplicate pairs (a, b, jac) with exact Jaccard ≥ threshold among
    MinHash-LSH candidates. The full pipeline: shingle → signature → band →
    bucket join → exact verify.

    Two physical strategies, identical results (``mode``):

    Shingles are HASHED (60-bit md5 longs, mirrored exactly in the DuckDB
    oracle) everywhere: distinct/set-intersection exchanges move 8-byte
    longs, never shingle strings, and the signature base hash is the
    shingle hash's low 32 bits — one md5 per shingle total.

    Two physical strategies, identical results (``mode``):

    * ``shared`` — ONE hashed-distinct pass feeds both the signature
      aggregate and the exact verify (min over a set == min over the
      multiset, so distinct-first loses nothing). Optimal while the hashed
      shingle set fits cluster memory comfortably.
    * ``scan``  — signatures from the NON-distinct hashed stream (no
      full-corpus distinct anywhere: the only full-corpus shuffle is the
      partial-aggregated docs × num_perm longs), then hashed-distinct
      shingles built only for the docs the exact verify touches
      (semi-join on candidate ids). The 100 TB plan — verify work is
      proportional to candidates, not the corpus.
    * ``auto`` (default) — ``shared`` below 1M docs, ``scan`` above.
    """
    mode = mode if mode != "auto" else (
        "shared" if docs.count() <= 1_000_000 else "scan"
    )
    if mode == "shared":
        sh = char_shingles(docs, k, id_col, text_col, hashed=True).persist()
        sh.count()
        sig = minhash_signatures(sh, num_perm, hashed=True)
        cand = lsh_candidate_pairs(sig, num_perm, bands)
    else:
        # persist the (docs × num_perm longs) signature table: the band
        # bucket join references it on BOTH sides — uncached it would
        # re-run the shingle scan + hash twice
        sig = minhash_signatures(
            char_shingles(docs, k, id_col, text_col, distinct=False, hashed=True),
            num_perm,
            hashed=True,
        ).persist()
        cand = lsh_candidate_pairs(sig, num_perm, bands).persist()
        cand.count()
        sig.unpersist()
        cand_ids = (
            cand.select(F.col("a").alias(id_col))
            .unionByName(cand.select(F.col("b").alias(id_col)))
            .distinct()
        )
        sh = char_shingles(
            docs.join(cand_ids, id_col, "semi"), k, id_col, text_col, hashed=True
        ).persist()
        sh.count()
    out = jaccard_of_pairs(cand, sh).where(F.col("jac") >= threshold)
    # Materialize the (small) pair output, then release the caches —
    # persisted entries otherwise live in the CacheManager for the whole
    # session and repeated calls accumulate storage pressure.
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    cand.unpersist()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 5,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold via an inverted-index
    candidate join (docs sharing at least one shingle).

    ``max_df`` (default None = exact) optionally caps the inverted index:
    shingles appearing in more than ``max_df`` docs generate no candidates.
    This bounds bucket skew at corpus scale but is an APPROXIMATION — a pair
    whose shared shingles are ALL high-frequency would be missed. Callers at
    100 TB pass e.g. ``max_df=1000`` knowingly; the default matches the
    exact-Jaccard contract (and the DuckDB gate oracle, which has no cap).

    Shingles are hashed 60-bit longs (char_shingles(hashed=True)): the
    inverted-index join — this operator's core shuffle — exchanges 8-byte
    keys instead of k-char strings, with identical set cardinalities on
    the DuckDB side (same portable md5 hash, same collisions).
    """
    sh = char_shingles(docs, k, id_col, text_col, hashed=True).persist()
    sh.count()
    idx = sh
    if max_df is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        idx = sh.join(freq.where(F.col("df") <= max_df).select("shingle"), "shingle")
    a = idx.select(F.col("doc_id").alias("a"), "shingle")
    b = idx.select(F.col("doc_id").alias("b"), "shingle")
    cand = a.join(b, "shingle").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    out = jaccard_of_pairs(cand, sh).where(F.col("jac") >= threshold)
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


# -- SimHash ----------------------------------------------------------------------

SIMHASH_BITS = 60  # fits the 60-bit portable hash and a signed BIGINT


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp): 60-bit SimHash over whitespace tokens (frequency
    weighted). Bit votes are 60 conditional-sum aggregates in a single
    groupBy — no per-bit explosion, fully codegen'd."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = portable_hash60(F.col("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        fp = term if fp is None else (fp + term)
    return agg.select("doc_id", fp.alias("fp"))


def simhash_dedup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, hamming) pairs with SimHash Hamming distance ≤ max_hamming.

    Scale path: split the 60 bits into ``max_hamming+1`` bands — by
    pigeonhole any pair within distance d shares at least one intact band,
    so the band-bucket join finds EVERY qualifying pair (exact, not
    approximate), while never comparing docs that differ everywhere."""
    fps = simhash(docs, id_col, text_col).persist()
    fps.count()
    nbands = max_hamming + 1
    # Bands must cover ALL 60 bits or the pigeonhole guarantee breaks: use
    # near-even widths (e.g. d=7 → 8 bands of 8,8,8,8,7,7,7,7 bits).
    base, extra = divmod(SIMHASH_BITS, nbands)
    widths = [base + 1] * extra + [base] * (nbands - extra)
    offsets = [sum(widths[:b]) for b in range(nbands)]
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("fp"), offsets[b])
            .bitwiseAND(F.lit((1 << widths[b]) - 1))
            .alias("key"),
        )
        for b in range(nbands)
    ]
    keyed = fps.select(
        "doc_id", "fp", F.explode(F.array(*bands)).alias("bk")
    ).select("doc_id", "fp", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    left = keyed.select("band", "key", F.col("doc_id").alias("a"), F.col("fp").alias("fa"))
    right = keyed.select("band", "key", F.col("doc_id").alias("b"), F.col("fp").alias("fb"))
    cand = (
        left.join(right, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb")
        .distinct()
    )
    ham = F.bit_count(F.expr("fa ^ fb"))
    out = cand.select("a", "b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
    out = out.localCheckpoint(eager=True)
    fps.unpersist()
    return out


def dedup_clusters(
    docs: DataFrame,
    k: int = 5,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) — near-duplicate CLUSTERS, the
    canonical-election step a dedup pipeline actually ships: transitive
    closure over the MinHash-LSH near-dup pair graph. ``cluster_id`` is the
    min doc id of the connected component, so ``cluster_id == doc_id``
    marks the elected canonical; keeping one row per cluster_id dedups the
    corpus. Reference analog: GraphScope's dedup recipes run WCC over the
    similarity graph (apps/flash/connectivity/cc-log.h semantics).

    Scale shape: the iterative component loop runs ONLY on vertices
    incident to >= 1 near-dup pair (at web scale a small fraction of the
    corpus); the singleton majority never enters the loop and is
    re-attached with one left join, and cluster sizes are aggregated on
    the (small) component table — no full-corpus groupBy anywhere.
    """
    from graphscope_spark.algorithms.wcc import wcc_log
    from graphscope_spark.graph import LinkGraph

    pairs = minhash_dedup_pairs(
        docs, k=k, num_perm=num_perm, bands=bands, threshold=threshold,
        id_col=id_col, text_col=text_col, mode=mode,
    )
    spark = docs.sparkSession
    P = num_partitions or spark.sparkContext.defaultParallelism
    touched = (
        pairs.select(F.col("a").alias("vid"))
        .unionByName(pairs.select(F.col("b").alias("vid")))
        .distinct()
    )
    g = LinkGraph(
        vertices=touched,
        edges=pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        num_partitions=P,
    )
    comp = wcc_log(g)  # (vid, comp) — only the paired minority
    sizes = comp.groupBy("comp").agg(F.count("*").alias("sz"))
    ids = docs.select(F.col(id_col).alias("doc_id"))
    clustered = (
        ids.join(comp, ids["doc_id"] == comp["vid"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("comp"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    return (
        clustered.join(
            sizes, clustered["cluster_id"] == sizes["comp"], "left"
        )
        .select(
            "doc_id",
            "cluster_id",
            F.coalesce(F.col("sz"), F.lit(1)).cast("long").alias("cluster_size"),
        )
    )


# -- exact duplicated substrings (Lee et al. 2021) --------------------------------


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, total_tokens, dup_tokens, dup_spans, dup_frac) — exact
    duplicated-substring coverage, the ExactSubstr signal of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" (ACL 2022):
    a token position is *duplicated* when it is covered by any length-``n``
    token window whose n-gram occurs at least ``min_count`` times in the
    whole corpus (across documents OR repeated inside one — both are
    training-data leaks). ``dup_spans`` counts maximal merged spans;
    ``dup_frac = dup_tokens / total_tokens`` is the drop/trim signal real
    pipelines threshold on.

    The reference's recipe stack has no substring-level dedup (its dedup
    story is whole-doc), so this extends the datapipe family the way the
    suffix-array pipeline does — but in a Spark-native shape:

    * The paper's suffix array is a single-machine construction; the
      distributed equivalent is the **positional n-gram inverted index**:
      every length-n window (hashed to a long — the n-gram text never
      shuffles), its doc and its token offset. That stream is linear in
      corpus tokens, flows straight from a codegen ``transform`` +
      ``posexplode`` into a partial-aggregated count, and the surviving
      duplicate-hash set (a tiny fraction at web scale) semi-joins back to
      positions — candidates-proportional, never quadratic.
    * Span assembly is the gaps-and-islands pattern: one window over
      (doc, offset) — running max of span ends, island break where the
      next start clears it — then one per-island aggregate. Both shuffle
      on doc_id only.
    * Zero Python anywhere: tokenize/slice/hash are SQL expressions.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    base = toks.select(
        "doc_id", F.size("t").alias("total_tokens"), "t"
    )
    # positional n-gram hashes: index i (1-based) -> xxhash64 of tokens
    # t[i .. i+n-1] joined on an unprintable separator
    grams = base.select(
        "doc_id",
        "total_tokens",
        F.posexplode(
            F.expr(
                # sequence(1, 0) DESCENDS in Spark — short docs need an
                # explicit empty-array branch, not a clamped upper bound
                f"CASE WHEN size(t) >= {n} THEN "
                f"transform(sequence(1, size(t) - {n} + 1),"
                f" i -> xxhash64(concat_ws('\\u001f', slice(t, i, {n}))))"
                f" ELSE array() END"
            )
        ).alias("p", "h"),
    )
    dup_h = (
        grams.groupBy("h")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("h")
    )
    pos = grams.join(dup_h, "h").select("doc_id", "p")  # p: 0-based start
    w = Window.partitionBy("doc_id").orderBy("p")
    prev_end = F.max(F.col("p") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = pos.select(
        "doc_id",
        "p",
        F.when(prev_end.isNull() | (F.col("p") > prev_end), 1)
        .otherwise(0)
        .alias("brk"),
    )
    islands = flagged.select(
        "doc_id", "p", F.sum("brk").over(w).alias("isl")
    )
    per_doc = (
        islands.groupBy("doc_id", "isl")
        .agg(F.min("p").alias("s"), (F.max("p") + n).alias("e"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e") - F.col("s")).alias("dup_tokens"),
            F.count("*").alias("dup_spans"),
        )
    )
    out = base.select("doc_id", "total_tokens").join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        (
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest(F.col("total_tokens"), F.lit(1))
        ).alias("dup_frac"),
    )


def substring_dedup(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    max_dup_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents surviving the ExactSubstr policy: drop any doc whose
    duplicated-span coverage exceeds ``max_dup_frac`` (the doc-level
    removal variant — span *excision* changes tokenization offsets and is
    a downstream editorial choice; coverage is the stable signal)."""
    spans = duplicated_spans(
        docs, n=n, min_count=min_count, id_col=id_col, text_col=text_col
    )
    keep = spans.where(F.col("dup_frac") <= max_dup_frac).select("doc_id")
    return docs.join(
        keep, docs[id_col] == keep["doc_id"], "left_semi"
    )
