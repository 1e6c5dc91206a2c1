"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's graph algorithms, a web-scale engine needs the
data-curation operators a 100 TB training pipeline runs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
approximate similarity search, text analysis (language ID, quality scoring,
token counting, fingerprinting), and multimodal binary-column plumbing.

Everything is built from JVM-side `pyspark.sql.functions` expressions where
possible (shingling, hashing, banding, jaccard are all joins/aggs inside
whole-stage codegen); pandas UDFs appear only where vectorized NumPy
genuinely wins (multimodal byte decode). The shared hash primitive is a
portable md5-derived 60-bit integer (`portable_hash60`) that DuckDB can
reproduce exactly — every operator here is oracle-checkable.
"""

from graphscope_spark.datapipe.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    dedup_clusters,
    simhash,
    simhash_dedup_pairs,
    ngram_jaccard_pairs,
)
from graphscope_spark.datapipe.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    lsh_ann_topk,
)
from graphscope_spark.datapipe.curation import (
    pii_scan,
    c4_filters,
    deterministic_split,
    stratified_sample,
    contamination_check,
)
from graphscope_spark.datapipe.textstats import (
    token_counts,
    quality_scores,
    lang_id,
    fingerprints,
    tfidf_top_terms,
    repetition_scores,
    bm25_rank,
    chunk_documents,
    winnow_fingerprints,
    readability_scores,
    token_zipf,
)
from graphscope_spark.datapipe.kmeans import kmeans_lloyd
from graphscope_spark.datapipe.dsir import (
    dsir_weights,
    dsir_resample,
)
from graphscope_spark.datapipe.sketches import (
    hll_distinct,
    hll_partial,
    hll_merge,
    distinct_check,
    approx_quantiles,
    quantile_check,
)

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "dedup_clusters",
    "simhash",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embedding_neardup_pairs",
    "lsh_ann_topk",
    "token_counts",
    "quality_scores",
    "lang_id",
    "fingerprints",
    "tfidf_top_terms",
    "repetition_scores",
    "bm25_rank",
    "hll_distinct",
    "hll_partial",
    "hll_merge",
    "distinct_check",
    "approx_quantiles",
    "quantile_check",
    "pii_scan",
    "c4_filters",
    "deterministic_split",
    "stratified_sample",
    "contamination_check",
    "dsir_weights",
    "dsir_resample",
    "kmeans_lloyd",
    "chunk_documents",
    "winnow_fingerprints",
    "readability_scores",
    "token_zipf",
]
