"""Corpus-curation operators: PII scan/redaction, C4 heuristic filters,
deterministic splits, stratified sampling, benchmark decontamination —
correctness against hand-computed fixtures and Python re/hashlib oracles."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from graphscope_spark.datapipe import (
    c4_filters,
    contamination_check,
    deterministic_split,
    pii_scan,
    stratified_sample,
)
from graphscope_spark.datapipe.curation import PII_PATTERNS


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "mail me at alice.smith+x@example.co.uk or bob@test.org today", "en"),
        (1, "server at 192.168.0.1 and 10.0.255.7 responded", "en"),
        (2, "call 555-123-4567 or 555 987 6543 now", "en"),
        (3, "mixed: a@b.io from 8.8.8.8 dial 111-222-3333 end", "de"),
        (4, "no pii here just words and more words", "de"),
        (5, "", "fr"),
        (6, "short {code} block", "fr"),
        (7, "lorem ipsum dolor sit amet filler boilerplate", "fr"),
        (8, "Good line one.\nGood line two!\nno punct line", "en"),
        (9, "clean document with several normal words inside it", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_pii_counts_and_redaction(docs):
    out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (0, 2, 0)
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 0, 2)
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (1, 1, 1)
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
    # python re oracle for the full redacted stream
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in texts.items():
        red = text
        for _, pat, tok in PII_PATTERNS:
            red = re.sub(pat, tok, red)
        assert out[did]["redacted_len"] == len(red)
        assert out[did]["redacted_md5"] == hashlib.md5(red.encode()).hexdigest()
    assert "<EMAIL>" not in texts[0]  # sanity: fixture really changed


def test_c4_filters(docs):
    out = {r["doc_id"]: r for r in c4_filters(docs).collect()}
    assert out[6]["has_curly_brace"] and not out[9]["has_curly_brace"]
    assert out[7]["has_lorem_ipsum"] and not out[9]["has_lorem_ipsum"]
    assert not out[6]["keep"] and not out[7]["keep"]
    assert out[9]["keep"]
    assert out[5]["n_words"] == 0 and not out[5]["keep"]
    # 2 of 3 non-empty lines end in terminal punctuation
    assert out[8]["terminal_punct_line_frac"] == pytest.approx(2 / 3)
    w9 = "clean document with several normal words inside it".split()
    assert out[9]["n_words"] == len(w9)
    assert out[9]["mean_word_len"] == pytest.approx(
        sum(len(w) for w in w9) / len(w9)
    )


def test_deterministic_split(docs):
    out = {r["doc_id"]: r for r in deterministic_split(docs).collect()}
    assert len(out) == 10
    for did, r in out.items():
        b = _h60(f"split:{did}") % 100
        assert r["bucket"] == b
        assert r["split"] == ("train" if b < 90 else "val" if b < 95 else "test")
    # stability: same assignment on a different partitioning of the input
    out2 = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(7)).collect()
    }
    assert out2 == {k: v["split"] for k, v in out.items()}


def test_stratified_sample_exact_quota(docs):
    got = stratified_sample(docs, frac=0.5).collect()
    by_stratum: dict[str, list[int]] = {}
    for r in got:
        by_stratum.setdefault(r["stratum"], []).append(r["doc_id"])
    sizes = {"en": 5, "de": 2, "fr": 3}
    for lang, n in sizes.items():
        assert len(by_stratum[lang]) == math.ceil(n * 0.5)
    # the kept ids are exactly the smallest-hash prefix per stratum
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    for lang in sizes:
        ids = [d for d, l in langs.items() if l == lang]
        ids.sort(key=lambda d: (_h60(f"sample:{d}"), d))
        want = set(ids[: math.ceil(len(ids) * 0.5)])
        assert set(by_stratum[lang]) == want


def test_contamination_check(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (1, "alpha beta gamma delta epsilon"),  # the benchmark doc itself
            (2, "one two three four five six seven"),  # clean
            (3, "too short"),  # below n tokens
        ],
        "doc_id long, text string",
    )
    bench = corpus.where(F.col("doc_id") == 1)
    out = {r["doc_id"]: r for r in contamination_check(corpus, bench, n=5).collect()}
    assert out[0]["contaminated"] and out[0]["n_hit_grams"] == 1
    assert out[1]["contaminated"] and out[1]["n_hit_grams"] == 1
    assert not out[2]["contaminated"] and out[2]["n_grams"] == 3
    assert not out[3]["contaminated"] and out[3]["n_grams"] == 0
    assert out[0]["n_grams"] == 2


class TestDSIR:
    """DSIR importance resampling (datapipe/dsir.py)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "the cat sat on the mat", "en"),
                (2, "le chat est sur le tapis", "fr"),
                (3, "the dog ran in the park", "en"),
                (4, "un chien dans le parc", "fr"),
                (5, "cats and dogs in the park", "en"),
                (6, "", "en"),
            ],
            "doc_id long, text string, lang string",
        )

    def test_weights_direction_and_totality(self, spark):
        from graphscope_spark.datapipe.dsir import dsir_weights

        docs = self._docs(spark)
        w = {
            r.doc_id: r
            for r in dsir_weights(
                docs, docs.where("lang = 'en'"), buckets=64
            ).collect()
        }
        assert set(w) == {1, 2, 3, 4, 5, 6}  # total, incl. the empty doc
        assert w[6].n_feats == 0 and w[6].log_w == 0.0
        en = sum(w[i].log_w for i in (1, 3, 5)) / 3
        fr = sum(w[i].log_w for i in (2, 4)) / 2
        assert en > 0 > fr  # toward-target docs up-weighted

    def test_resample_topk_deterministic(self, spark):
        from graphscope_spark.datapipe.dsir import dsir_resample, dsir_weights

        docs = self._docs(spark)
        w = dsir_weights(docs, docs.where("lang = 'en'"), buckets=64)
        top = dsir_resample(w, k=3, seed=1).collect()
        assert [r.rank for r in sorted(top, key=lambda r: r.rank)] == [1, 2, 3]
        # strong signal: the 3 selected docs are the 3 English ones
        assert {r.doc_id for r in top} == {1, 3, 5}
        again = dsir_resample(w, k=3, seed=1).collect()
        assert sorted((r.doc_id, r.rank) for r in again) == sorted(
            (r.doc_id, r.rank) for r in top
        )
        # a different seed may reorder (noise changes) but stays weighted
        other = dsir_resample(w, k=3, seed=2).collect()
        assert len(other) == 3
