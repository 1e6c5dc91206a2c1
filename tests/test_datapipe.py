"""Training-data pipeline operators: dedup / similarity / textstats /
multimodal — correctness against constructed fixtures and numpy oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphscope_spark.datapipe import (
    cosine_topk,
    embedding_neardup_pairs,
    exact_dedup,
    fingerprints,
    lang_id,
    lsh_ann_topk,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    quality_scores,
    simhash,
    simhash_dedup_pairs,
    token_counts,
)
from graphscope_spark.datapipe.multimodal import extract_features, frame_sample_plan


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
        (3, "der schnelle braune fuchs und die faule katze ist das"),
        (4, "el perro y el gato que los dos"),
        (5, "completely different text about spark shuffles and joins"),
        (6, ""),  # empty doc
        (7, "aaaaa aaaaa aaaaa aaaaa"),  # degenerate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    got = {r["doc_id"]: (r["canonical_id"], r["group_size"]) for r in exact_dedup(docs).collect()}
    assert got[0] == (0, 2) and got[1] == (0, 2)
    assert got[2] == (2, 1)


def test_minhash_finds_near_dups(docs):
    pairs = {(r["a"], r["b"]): r["jac"] for r in
             minhash_dedup_pairs(docs, k=5, num_perm=16, bands=8, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 5) not in pairs
    # the scan strategy (non-distinct signatures + candidate-only verify —
    # the 100TB shuffle shape) must produce identical pairs and jaccards
    scan = {(r["a"], r["b"]): r["jac"] for r in
            minhash_dedup_pairs(docs, k=5, num_perm=16, bands=8,
                                threshold=0.5, mode="scan").collect()}
    assert scan == pairs


def test_ngram_jaccard_exact(docs):
    pairs = {(r["a"], r["b"]): r["jac"] for r in
             ngram_jaccard_pairs(docs, k=5, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    # python oracle for (0,2)
    t0 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumps over the lazy cat"
    s0 = {t0[i:i + 5] for i in range(len(t0) - 4)}
    s2 = {t2[i:i + 5] for i in range(len(t2) - 4)}
    assert np.isclose(pairs[(0, 2)], len(s0 & s2) / len(s0 | s2))


def test_ngram_jaccard_max_df_cap_drops_common_shingle_pairs(spark):
    # docs 0 and 1 share ONLY ubiquitous shingles (every doc contains them):
    # with max_df below the corpus size they generate no candidates — the
    # documented approximation — while the default (None) stays exact.
    # docs 0,1,2 identical → every shingle they contain has df=3
    rows = [(0, "commonpart shared"), (1, "commonpart shared"),
            (2, "commonpart shared"), (3, "totally different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["a"], r["b"]) for r in
             ngram_jaccard_pairs(df, k=5, threshold=0.9).collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= exact
    capped = {(r["a"], r["b"]) for r in
              ngram_jaccard_pairs(df, k=5, threshold=0.9, max_df=2).collect()}
    # with df=3 > max_df=2 ALL shared shingles are dropped from the inverted
    # index → the identical pairs are missed: the documented approximation
    assert capped == set()


def test_simhash_matches_python_oracle(docs):
    got = {r["doc_id"]: r["fp"] for r in simhash(docs).collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def oracle(text):
        votes = [0] * 60
        for tok in text.lower().split():
            if not tok:
                continue
            hv = h60(tok)
            for j in range(60):
                votes[j] += 1 if (hv >> j) & 1 else -1
        return sum(1 << j for j in range(60) if votes[j] > 0)

    for r in [(0, "the quick brown fox jumps over the lazy dog"),
              (5, "completely different text about spark shuffles and joins")]:
        assert got[r[0]] == oracle(r[1]), r[0]
    assert got[0] == got[1]


def test_simhash_pairs(docs):
    # true hamming(0,2) from the python oracle drives the threshold, so the
    # test checks the banded join's pigeonhole EXACTNESS, not a guess
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def fp_oracle(text):
        votes = [0] * 60
        for tok in text.lower().split():
            hv = h60(tok)
            for j in range(60):
                votes[j] += 1 if (hv >> j) & 1 else -1
        return sum(1 << j for j in range(60) if votes[j] > 0)

    t0 = "the quick brown fox jumps over the lazy dog"
    t2 = "the quick brown fox jumps over the lazy cat"
    d02 = bin(fp_oracle(t0) ^ fp_oracle(t2)).count("1")
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_dedup_pairs(docs, max_hamming=d02).collect()}
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == d02  # banded join must find the boundary pair


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def _numpy_topk(vecs, k):
    v = vecs.astype("float64")
    norms = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    out = {}
    for i in range(len(v)):
        order = sorted(range(len(v)), key=lambda j: (-round(sims[i, j], 9), j))
        out[i] = order[:k]
    return out, sims


def test_cosine_topk_vs_numpy(emb):
    df, vecs = emb
    got = {}
    for r in cosine_topk(df, k=3).collect():
        got.setdefault(r["id"], []).append((r["nbr"], r["sim"]))
    want, sims = _numpy_topk(vecs, 3)
    for i, nbrs in want.items():
        got_nbrs = [n for n, _ in sorted(got[i], key=lambda x: (-round(x[1], 9), x[0]))]
        assert got_nbrs == nbrs, i
        for n, s in got[i]:
            assert np.isclose(s, sims[i, n], atol=1e-9)


def test_embedding_neardup(emb):
    df, _ = emb
    pairs = {(r["a"], r["b"]) for r in embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in pairs


def test_embedding_neardup_refuses_above_bounds(emb):
    df, _ = emb
    with pytest.raises(ValueError, match="strategy='lsh'"):
        embedding_neardup_pairs(df, threshold=0.95, block_threshold=10)


def test_embedding_neardup_lsh_mode_equivalence(emb):
    """The bucketed scale mode: every emitted pair is exactly scored
    (subset of the exact pair set, identical sims), and the measured
    recall on the fixture clears the contract bit."""
    df, _ = emb
    exact = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_pairs(df, threshold=0.4, strategy="crossjoin").collect()
    }
    lsh = {
        (r["a"], r["b"]): r["sim"]
        for r in embedding_neardup_pairs(
            df, threshold=0.4, strategy="lsh", num_planes=16, bands=8
        ).collect()
    }
    assert set(lsh) <= set(exact)  # precision is exact
    for k, v in lsh.items():
        assert np.isclose(v, exact[k], atol=1e-9)
    assert exact, "fixture should contain qualifying pairs"
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, recall


def test_lsh_ann_recall(emb):
    df, vecs = emb
    got = {}
    for r in lsh_ann_topk(df, k=3, num_planes=9, bands=3).collect():
        got.setdefault(r["id"], set()).add(r["nbr"])
    want, _ = _numpy_topk(vecs, 3)
    hits = sum(len(got.get(i, set()) & set(want[i])) for i in want)
    recall = hits / (3 * len(want))
    assert recall > 0.5, recall  # approximate, but must beat random by far


def test_ivf_ann_recall_and_determinism(emb):
    from graphscope_spark.datapipe.similarity import ivf_ann_topk

    df, vecs = emb
    got = {}
    rows1 = ivf_ann_topk(df, k=3, n_centroids=4, nprobe=2, sample_cap=100).collect()
    for r in rows1:
        got.setdefault(r["id"], set()).add(r["nbr"])
    want, _ = _numpy_topk(vecs, 3)
    hits = sum(len(got.get(i, set()) & set(want[i])) for i in want)
    recall = hits / (3 * len(want))
    assert recall > 0.5, recall  # nprobe/n_centroids = 1/2 of the corpus scanned
    # deterministic across runs AND partitionings (hash-ordered sample,
    # first-rows init, fixed Lloyd rounds — no RNG state anywhere)
    rows2 = ivf_ann_topk(
        df.repartition(7), k=3, n_centroids=4, nprobe=2, sample_cap=100
    ).collect()
    key = lambda r: (r["id"], r["nbr"])
    assert sorted(map(key, rows1)) == sorted(map(key, rows2))


def test_token_counts(docs):
    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert got[0]["n_tokens"] == 9
    assert got[0]["n_distinct_tokens"] == 8  # 'the' twice
    assert got[6]["n_tokens"] == 0
    assert got[7]["n_distinct_tokens"] == 1


def test_quality_scores(docs):
    got = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert got[6]["score"] == 0.0
    assert got[0]["score"] > got[7]["score"] * 0  # defined for all
    assert 0 <= got[0]["alpha_ratio"] <= 1
    assert got[0]["n_tokens"] == 9


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[4] == "es"
    assert got[6] == "und"
    assert got[7] == "und"


def test_fingerprints(docs):
    got = {r["doc_id"]: r for r in fingerprints(docs, k=8).collect()}
    assert got[0]["fp_min"] == got[1]["fp_min"] and got[0]["fp_max"] == got[1]["fp_max"]
    assert got[6]["n_grams"] == 0 and got[6]["fp_min"] == 0
    assert got[0]["n_grams"] == len("the quick brown fox jumps over the lazy dog") - 7


def test_multimodal_features(spark, docs):
    payloads = docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )
    got = {r["doc_id"]: r for r in extract_features(payloads).collect()}
    t0 = "the quick brown fox jumps over the lazy dog"
    assert got[0]["n_bytes"] == len(t0)
    assert got[0]["digest"] == hashlib.md5(t0.encode()).hexdigest()
    assert got[0]["kind"] == "unknown"
    jpeg = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8\xffrest"))], "doc_id long, payload binary"
    )
    assert extract_features(jpeg).collect()[0]["kind"] == "jpeg"


def test_decode_image_ppm_bmp(spark):
    """Dependency-free raster decode: PPM/PGM (incl. header comments), BMP
    bottom-up rows + 4-byte padding, codec formats raise."""
    import numpy as np
    import pytest

    from graphscope_spark.datapipe.multimodal import decode_image, parse_image_header

    # P6 2x2 RGB with a header comment
    raster = bytes(range(12))
    ppm = b"P6\n# a comment\n2 2\n255\n" + raster
    img = decode_image(ppm)
    assert img.shape == (2, 2, 3) and img.tobytes() == raster
    assert parse_image_header(ppm) == {
        "kind": "ppm", "width": 2, "height": 2, "channels": 3, "maxval": 255,
    }
    # P5 3x1 grayscale
    pgm = b"P5\n3 1\n255\n\x01\x02\x03"
    assert decode_image(pgm).tolist() == [[[1], [2], [3]]]
    # 24-bit BMP, 2x2, bottom-up, rows padded to 4 bytes (stride 8)
    w, h = 2, 2
    row0, row1 = bytes(range(6)), bytes(range(6, 12))  # top row, bottom row
    pix = row1 + b"\x00\x00" + row0 + b"\x00\x00"  # stored bottom-up
    header = (
        b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    bmp = decode_image(header + pix)
    assert bmp.shape == (2, 2, 3)
    assert bmp[0].tobytes() == row0 and bmp[1].tobytes() == row1
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xffjpegdata")
    assert parse_image_header(b"T:not an image") is None
    # decoded dims flow through extract_features
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"T:plain"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (2, 2, 3)
    assert rows[2]["width"] is None and rows[2]["kind"] == "unknown"


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 5000)), (2, bytearray(b"y" * 100))],
        "doc_id long, payload binary",
    )
    got = {}
    for r in frame_sample_plan(df, every_n=2).collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    # doc 1: 5000//1024 + 1 = 5 frames → sampled 0,2,4
    assert sorted(got[1]) == [0, 2, 4]
    assert sorted(got[2]) == [0]


def test_paragraph_dedup(spark):
    """paragraph_dedup: boilerplate (> max_df distinct docs) dropped,
    order preserved, within-doc repeats counted once for df, docs whose
    every paragraph is boilerplate dropped entirely."""
    from graphscope_spark.datapipe.dedup import paragraph_dedup

    rows = [
        (1, "boiler\nkeep one\nboiler\nkeep two"),  # boiler twice in-doc
        (2, "boiler\nother text"),
        (3, "boiler"),  # all-boilerplate -> dropped
        (4, "solo\nboiler"),
    ]
    out = paragraph_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), max_df=2
    ).collect()
    got = {r["doc_id"]: r["text"] for r in out}
    # 'boiler' appears in 4 distinct docs (in-doc repeat counts once) > 2
    assert got == {
        1: "keep one\nkeep two",
        2: "other text",
        4: "solo",
    }
    # max_df large enough: nothing dropped, original text round-trips
    full = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), max_df=4
        ).collect()
    }
    assert full == dict(rows)


def test_repetition_scores(spark):
    from graphscope_spark.datapipe import repetition_scores

    rows = [
        # doc 1: 4 lines, "a b" repeated; 2-gram "a b" dominates
        (1, "a b\na b\nc d e\nc d e"),
        # doc 2: no repetition at all, 6 tokens -> two 5-grams, no dup
        (2, "one two three four five six"),
        # doc 3: heavy 5-gram repetition (same 5 tokens twice)
        (3, "p q r s t p q r s t"),
        # doc 4: empty text
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            round(r["dup_line_frac"], 9),
            round(r["dup_line_char_frac"], 9),
            round(r["top_2gram_char_frac"], 9),
            round(r["dup_5gram_char_frac"], 9),
        )
        for r in repetition_scores(docs).collect()
    }
    # doc 1: lines = [a b, a b, c d e, c d e] -> 4 lines, 2 distinct
    #   dup_line_frac = 2/4; line chars: (2-1)*3 + (2-1)*5 = 8 dup of 16 tot
    #   tokens: a b a b c d e c d e -> tok_chars = 10
    #   2-grams: "a b"×2 ... top = "a b" (count 2, tie-break lexical min over
    #   "b a"×1, "b c"×1, "c d"×2, "d e"×2, "e c"×1 -> max count 2, min gram "a b")
    #   top2_chars = 2 * len("ab") = 4 -> 0.4
    #   5-grams (6 of them, all distinct) -> dup5 = 0
    assert got[1] == (0.5, 0.5, 0.4, 0.0)
    # doc 2: no dup lines (1 line, distinct), top 2-gram count 1:
    #   tok_chars = 3+3+5+4+4+3 = 22; top 2-gram = "five six" (count 1, lexical
    #   min among all count-1 grams) -> len("fivesix")=7 -> 7/22
    assert got[2] == (0.0, 0.0, round(7 / 22, 9), 0.0)
    # doc 3: tokens p q r s t p q r s t -> tok_chars = 10
    #   5-grams: [p q r s t]×2, [q r s t p], [r s t p q], [s t p q r], [t p q r s]
    #   dup5 = 2 * 5 = 10 -> 1.0; top 2-gram "p q" count 2 -> 4/10
    assert got[3] == (0.0, 0.0, 0.4, 1.0)
    # doc 4: all zeros
    assert got[4] == (0.0, 0.0, 0.0, 0.0)


def test_parse_png_jpeg_headers(spark):
    import struct

    from graphscope_spark.datapipe.multimodal import (
        decode_image,
        extract_features,
        parse_image_header,
    )

    # minimal PNG: signature + IHDR(160x90, 8-bit RGBA)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", 160, 90, 8, 6, 0, 0, 0)
        + b"\x00" * 8
    )
    got = parse_image_header(png)
    assert got == {"kind": "png", "width": 160, "height": 90, "channels": 4, "maxval": 255}

    # minimal JPEG: SOI, APP0 stub, SOF0 (h=30, w=40, 3 components)
    jpg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"          # APP0, len 4
        + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])     # SOF0, len 11
        + struct.pack(">HH", 30, 40) + bytes([3]) + b"\x00" * 2
    )
    got = parse_image_header(jpg)
    assert got == {"kind": "jpeg", "width": 40, "height": 30, "channels": 3, "maxval": 255}

    # compressed rasters still refuse to decode (header-only metadata)
    for payload in (png, jpg):
        try:
            decode_image(payload)
            raise AssertionError("decode_image should refuse compressed codecs")
        except NotImplementedError:
            pass

    # dims flow through the mapInPandas feature extractor
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(jpg))],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert (rows[1]["kind"], rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == ("png", 160, 90, 4)
    assert (rows[2]["kind"], rows[2]["width"], rows[2]["height"], rows[2]["channels"]) == ("jpeg", 40, 30, 3)


def test_wav_header_and_audio_features(spark):
    import struct

    from graphscope_spark.datapipe.multimodal import (
        extract_audio_features,
        parse_wav_header,
    )

    def wav(channels=2, rate=44100, bits=16, data=b"\x00" * 8, extra=b""):
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * bits // 8, channels * bits // 8, bits)
        body = extra + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    got = parse_wav_header(wav())
    assert got == {"kind": "wav", "channels": 2, "sample_rate": 44100,
                   "bits_per_sample": 16, "n_samples": 2}
    # odd-length extra chunk before fmt exercises word-alignment
    lst = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    got = parse_wav_header(wav(channels=1, rate=8000, bits=8,
                               data=b"\x00" * 5, extra=lst))
    assert got == {"kind": "wav", "channels": 1, "sample_rate": 8000,
                   "bits_per_sample": 8, "n_samples": 5}
    assert parse_wav_header(b"RIFFxxxxAVI LIST") is None  # RIFF but not WAVE
    assert parse_wav_header(b"OggS....") is None

    df = spark.createDataFrame(
        [(1, bytearray(wav())), (2, bytearray(b"OggSgarbage"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(df).collect()}
    assert (rows[1]["kind"], rows[1]["sample_rate"], rows[1]["channels"],
            rows[1]["bits_per_sample"], rows[1]["n_samples"]) == ("wav", 44100, 2, 16, 2)
    assert rows[2]["kind"] == "ogg" and rows[2]["sample_rate"] is None


def test_duplicated_spans_islands_and_policy(spark):
    from graphscope_spark.datapipe.dedup import duplicated_spans, substring_dedup

    docs = spark.createDataFrame(
        [
            # docs 0/1 share one 4-gram -> one 4-token span each
            (0, "a b c d e f g h i j"),
            (1, "a b c d x y z w q r"),
            (2, "u1 u2 u3 u4 u5 u6 u7 u8"),  # unique -> zero coverage
            # self-repetition: overlapping windows merge into ONE island
            (3, "r1 r2 r1 r2 r1 r2 r1 r2 r1 r2"),
            (4, "short doc"),  # shorter than n -> no windows at all
            # two DISJOINT duplicated spans (shared with 0/1's gram and
            # with doc 6) separated by unique filler -> dup_spans == 2
            (5, "a b c d f1 f2 f3 f4 f5 m1 m2 m3 m4 z9 z9b z9c"),
            (6, "k1 k2 m1 m2 m3 m4 z9 z9b z9c k3 k4 k5"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_spans(docs, n=4).collect()
    }
    assert got[0]["dup_tokens"] == 4 and got[0]["dup_spans"] == 1
    assert got[1]["dup_tokens"] == 4 and got[1]["dup_spans"] == 1
    assert got[2]["dup_tokens"] == 0 and got[2]["dup_spans"] == 0
    assert got[3]["dup_tokens"] == 10 and got[3]["dup_spans"] == 1
    assert got[3]["dup_frac"] == 1.0
    assert got[4]["dup_tokens"] == 0 and got[4]["total_tokens"] == 2
    # doc 5: span [0,4) from "a b c d", span [9,16) from the 7-token run
    # "m1 m2 m3 m4 z9 z9b z9c" shared with doc 6 (windows 9..12 merge)
    assert got[5]["dup_tokens"] == 11 and got[5]["dup_spans"] == 2
    assert got[6]["dup_tokens"] == 7 and got[6]["dup_spans"] == 1
    kept = sorted(
        r["doc_id"]
        for r in substring_dedup(docs, n=4, max_dup_frac=0.5).collect()
    )
    # 3 (frac 1.0), 5 (11/16), and 6 (7/12) all exceed 0.5
    assert kept == [0, 1, 2, 4]


def test_kmeans_lloyd_matches_numpy(spark):
    """Lloyd contract path vs a NumPy replication: first-k init, ties to
    lowest cluster, empty clusters keep their centroid."""
    import numpy as np
    from graphscope_spark.datapipe.kmeans import kmeans_lloyd

    rng = np.random.RandomState(7)
    X = np.vstack(
        [rng.randn(20, 4) + 5, rng.randn(20, 4) - 5, rng.randn(10, 4)]
    )
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(len(X))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.id: (r.cluster, r.dist)
        for r in kmeans_lloyd(emb, k=3, rounds=3).collect()
    }
    C = X[:3].copy()
    for _ in range(3):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)  # argmin takes the lowest index on ties
        for c in range(3):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    a = d.argmin(1)
    for i in range(len(X)):
        assert got[i][0] == a[i], i
        assert np.isclose(got[i][1], d[i, a[i]], atol=1e-9), i


def test_chunk_documents_windows(spark):
    from graphscope_spark.datapipe.textstats import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    out = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk)
        for r in chunk_documents(docs, max_tokens=4, overlap=1).collect()
    )
    # doc 1: stride 3 -> windows [0:4),[3:7),[6:10) -> 1+ceil(6/3)=3 chunks
    assert [(d, c) for d, c, _, _ in out] == [(1, 0), (1, 1), (1, 2), (2, 0)]
    assert out[0][3] == "t0 t1 t2 t3"
    assert out[1][3] == "t3 t4 t5 t6"
    assert out[2][3] == "t6 t7 t8 t9"
    assert out[3][2:] == (2, "a b")  # short doc -> one short chunk
    # empty / whitespace-only docs produce no chunks (asserted by the
    # doc/chunk list above)
    # consecutive windows overlap by exactly `overlap` tokens
    assert out[0][3].split()[-1:] == out[1][3].split()[:1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing invariants: selected positions are window minima, density
    is bounded, and two docs sharing a long substring share a fingerprint
    (the k+w-1 guarantee)."""
    from graphscope_spark.datapipe.textstats import winnow_fingerprints

    shared = "abcdefghijklmnop"  # 16 chars >= k+w-1 = 11
    docs = spark.createDataFrame(
        [
            (1, "xxx " + shared + " yyyy"),
            (2, "zz2 " + shared + " 2wwz"),
            (3, "no overlap here at all!"),
            (4, "tiny"),  # shorter than k -> no grams -> no fingerprints
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert 4 not in by_doc
    assert by_doc[1] & by_doc[2]          # shared substring -> shared fp
    assert not (by_doc[1] & by_doc[2] & by_doc[3])
    # density: at most one selection per window start, dedup cuts further
    n_grams_1 = len(docs.collect()[0].text) - 7
    assert len(by_doc[1]) <= n_grams_1 - 3
    # determinism
    again = {(r.doc_id, r.pos, r.fp) for r in winnow_fingerprints(docs, k=8, w=4).collect()}
    assert again == {(r.doc_id, r.pos, r.fp) for r in out}


def test_readability_and_zipf(spark):
    import math

    from graphscope_spark.datapipe.textstats import readability_scores, token_zipf

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran! Did it?"),
            (2, "word"),            # no terminator -> one sentence
            (3, ""),                # no words -> NULL flesch
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in readability_scores(docs).collect()}
    assert (r[1].n_sents, r[1].n_words) == (3, 8)
    # syllable floor: every word has >= 1
    assert r[1].n_syll >= r[1].n_words
    w = r[1].n_words / r[1].n_sents
    s = r[1].n_syll / r[1].n_words
    assert math.isclose(r[1].flesch, 206.835 - 1.015 * w - 84.6 * s, rel_tol=1e-9)
    assert (r[2].n_sents, r[2].n_words) == (1, 1)
    assert r[3].flesch is None and r[3].n_words == 0
    # zipf: perfect power law f = 60/r (exact integers for r=1..5)
    # -> slope exactly -1, r2 = 1
    rows = [(0, " ".join(f"w{r}" for r in range(1, 6) for _ in range(60 // r)))]
    z = token_zipf(
        spark.createDataFrame(rows, "doc_id long, text string"), top_k=10
    ).collect()[0]
    assert z.n_types == 5
    assert math.isclose(z.slope, -1.0, rel_tol=1e-6)
    assert math.isclose(z.r2, 1.0, rel_tol=1e-9)
