"""HLL cardinality sketches and BM25 ranking — correctness against exact
counts and a hand-computed Okapi oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphscope_spark.datapipe import (
    approx_quantiles,
    bm25_rank,
    distinct_check,
    hll_distinct,
    hll_merge,
    hll_partial,
    quantile_check,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 3 groups × known distinct counts, values spread over 8 partitions;
    # group a: 1000 distincts each seen 3×, b: 137, c: 1.
    rows = (
        [("a", i % 1000, i % 4) for i in range(3000)]
        + [("b", i, i % 4) for i in range(137)]
        + [("c", 0, s) for s in range(4)]
    )
    return spark.createDataFrame(rows, "g string, v long, split int").repartition(8)


def test_hll_small_cardinality_is_exact(spark, keyed):
    # below the sparse→dense promotion the sketch stores raw coupons: the
    # estimate is exact, so this pins absolute correctness, not a bound
    got = {r["g"]: r["est_distinct"] for r in hll_distinct(keyed, ["g"], "v").collect()}
    assert got == {"a": 1000, "b": 137, "c": 1}


def test_distinct_check_bits(keyed):
    rows = distinct_check(keyed, ["g"], "v", lgk=14, rel_err=0.05).collect()
    assert {r["g"]: r["exact_distinct"] for r in rows} == {"a": 1000, "b": 137, "c": 1}
    assert all(r["err_ok"] == 1 for r in rows)


def test_hll_merge_matches_whole(keyed):
    merged = {
        r["g"]: r["est_distinct"]
        for r in hll_merge(hll_partial(keyed, ["g"], "split", "v"), ["g"]).collect()
    }
    whole = {r["g"]: r["est_distinct"] for r in hll_distinct(keyed, ["g"], "v").collect()}
    exact = {"a": 1000, "b": 137, "c": 1}
    for g, n in exact.items():
        # register merge is lossless; estimator drift (HIP while streaming
        # vs composite after union) stays inside the sketch's own bound
        assert abs(merged[g] - n) <= max(1, 0.02 * n)
        assert abs(merged[g] - whole[g]) <= max(1, 0.02 * n)


def test_hll_larger_cardinality_bound(spark):
    # 50k distincts — well past sparse mode; lgk=14 RSE ≈ 0.8%, assert 3σ
    df = spark.range(150_000).select(
        F.lit("g").alias("g"), (F.col("id") % 50_000).alias("v")
    )
    est = hll_distinct(df, ["g"], "v", lgk=14).collect()[0]["est_distinct"]
    assert abs(est - 50_000) <= 0.025 * 50_000


def test_quantile_exact_small(spark):
    # 1..101 per group: p50 = 51 exactly, p95 = 96 (type-7: 0.95*100 = 95
    # → element at 0-based index 95). GK at accuracy 10k on 101 rows is
    # exact, so approx_quantiles returns members equal to the exact values.
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 102)], "g string, v double"
    )
    row = quantile_check(df, ["g"], "v", probs=(0.5, 0.95)).collect()[0]
    assert row["n"] == 101
    assert row["exact_0_5"] == 51.0 and row["rank_ok_0_5"] == 1
    assert row["exact_0_95"] == 96.0 and row["rank_ok_0_95"] == 1
    a = approx_quantiles(df, ["g"], "v", probs=(0.5, 0.95)).collect()[0]
    assert a["q_0_5"] == 51.0 and a["q_0_95"] == 96.0


def test_quantile_rank_contract_low_accuracy(spark):
    # accuracy=100 over 10k rows → rank slack 101; the approx median can
    # drift but the rank_ok contract must still hold, per GK's guarantee
    df = spark.range(10_000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    row = quantile_check(df, ["g"], "v", probs=(0.5,), accuracy=100).collect()[0]
    assert row["rank_ok_0_5"] == 1
    assert row["exact_0_5"] == pytest.approx(4999.5)


def test_quantile_null_values_excluded(spark):
    # nulls are invisible to both percentile variants; n must count only
    # non-null values or the rank target drifts off the real population
    rows = [("g", float(i)) for i in range(1, 102)] + [("g", None)] * 40
    df = spark.createDataFrame(rows, "g string, v double")
    row = quantile_check(df, ["g"], "v", probs=(0.5,)).collect()[0]
    assert row["n"] == 101
    assert row["exact_0_5"] == 51.0 and row["rank_ok_0_5"] == 1


def test_bm25_hand_oracle(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "d d d")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in
           bm25_rank(docs, ["a", "d"], top_k=3).collect()}
    n, avgdl, k1, b = 3.0, 8.0 / 3.0, 1.2, 0.75

    def okapi(tf, df, dl):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp = {
        1: okapi(2, 2, 3),          # 'a' twice
        2: okapi(1, 2, 2),          # 'a' once, shorter doc
        3: okapi(3, 1, 3),          # 'd' thrice, rarer term
    }
    assert set(got) == {1, 2, 3}
    for d, s in exp.items():
        assert got[d][0] == pytest.approx(s, abs=1e-9)
    # rarer term d dominates; ranks follow score desc
    order = [d for d, _ in sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert [d for d, (_, r) in sorted(got.items(), key=lambda kv: kv[1][1])] == order


def test_bm25_no_match_and_topk(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} filler") for i in range(20)], "doc_id long, text string"
    )
    assert bm25_rank(docs, ["absent"], top_k=5).count() == 0
    got = bm25_rank(docs, ["filler"], top_k=5).collect()
    # equal scores → doc_id asc tie-break, exactly top_k rows
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
