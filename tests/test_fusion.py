"""Rank fusion + stratified sampling vs pure-Python oracles."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.fusion import rrf_fuse, stratified_sample
from tests.oracle import round_half_up


def test_rrf_fuse_golden(spark):
    """Hand-computable fusion of two 3-deep runs over one query.
    run A: d1, d2, d3; run B: d3, d4, d1."""
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "qid string, doc_id long, rank int")
    b = spark.createDataFrame(
        [("q", 3, 1), ("q", 4, 2), ("q", 1, 3)],
        "qid string, doc_id long, rank int")
    got = {r.doc_id: (r.rank, r.score) for r in
           rrf_fuse([a, b], k=10, rrf_k=60).collect()}
    exp = {
        1: 1.0 / 61 + 1.0 / 63,
        2: 1.0 / 62,
        3: 1.0 / 63 + 1.0 / 61,
        4: 1.0 / 62,
    }
    for d, s in exp.items():
        assert got[d][1] == pytest.approx(round_half_up(s, 6), abs=1e-9)
    # d1 and d3 tie on score → doc_id ascending breaks it; same for d2/d4
    assert [got[d][0] for d in (1, 3, 2, 4)] == [1, 2, 3, 4]


def test_rrf_single_run_is_rank_monotone(spark):
    a = spark.createDataFrame(
        [("q", 9, 1), ("q", 5, 2), ("q", 7, 3)],
        "qid string, doc_id long, rank int")
    got = [r.doc_id for r in
           rrf_fuse([a], k=3).orderBy("rank").collect()]
    assert got == [9, 5, 7]


def _py_coin(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16) % 1000


def test_stratified_sample_matches_md5_oracle(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"a": 0.2, "b": 0.7}
    got = {(r.doc_id, r.lang) for r in
           stratified_sample(df, "lang", "doc_id", rates,
                             default_rate=0.05).collect()}
    thr = {"a": 200, "b": 700, "c": 50}
    exp = {(i, s) for i, s in rows if _py_coin(i) < thr[s]}
    assert got == exp
    # sanity: each stratum's realized rate is near its target
    by = defaultdict(int)
    for _, s in exp:
        by[s] += 1
    assert 0.15 < by["a"] / 1000 < 0.25
    assert 0.65 < by["b"] / 1000 < 0.75


def test_stratified_sample_zero_default_drops_unlisted(spark):
    df = spark.createDataFrame([(i, "x") for i in range(100)],
                               "doc_id long, lang string")
    assert stratified_sample(df, "lang", "doc_id", {"y": 1.0}).count() == 0


def test_comb_fuse_sum_and_mnz_golden(spark):
    """Two 2-deep runs over one query; hand-computed min-max fusion.
    run A: d1 (2.0), d2 (1.0); run B: d2 (10.0), d3 (4.0)."""
    from search_engine_spark.operators.fusion import comb_fuse
    a = spark.createDataFrame(
        [("q", 1, 2.0), ("q", 2, 1.0)], "qid string, doc_id long, score double")
    b = spark.createDataFrame(
        [("q", 2, 10.0), ("q", 3, 4.0)], "qid string, doc_id long, score double")
    # norms: A: d1=1.0, d2=0.0 ; B: d2=1.0, d3=0.0
    got_sum = {r.doc_id: r.score for r in comb_fuse(a, b, mnz=False).collect()}
    assert got_sum == {1: 1.0, 2: 1.0, 3: 0.0}
    got_mnz = {r.doc_id: r.score for r in comb_fuse(a, b, mnz=True).collect()}
    # d1: 1.0*1 ; d2: 1.0*2 ; d3: 0.0*1
    assert got_mnz == {1: 1.0, 2: 2.0, 3: 0.0}
    ranks = {r.doc_id: r.rank for r in comb_fuse(a, b, mnz=True).collect()}
    assert ranks[2] == 1


def test_comb_fuse_degenerate_run_normalizes_to_zero(spark):
    """A run whose scores are all equal min-max-normalizes to 0 for
    every doc (mx == mn branch), not NaN."""
    from search_engine_spark.operators.fusion import comb_fuse
    a = spark.createDataFrame(
        [("q", 1, 3.0), ("q", 2, 3.0)], "qid string, doc_id long, score double")
    b = spark.createDataFrame(
        [("q", 1, 1.0)], "qid string, doc_id long, score double")
    got = {r.doc_id: r.score for r in comb_fuse(a, b, mnz=False).collect()}
    assert got == {1: 0.0, 2: 0.0}


def test_mixture_sample_rates_and_determinism(spark):
    """α=0.5 mixing: the smallest source keeps everything; a source 4×
    the size keeps ~sqrt(1/4)=50%; the row set is md5-deterministic."""
    from search_engine_spark.operators.fusion import mixture_sample
    rows = [(i, "small") for i in range(500)] + \
           [(i + 1000, "big") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, "lang", "doc_id", alpha=0.5)
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["small"] == 500                  # rate exactly 1.0
    assert 850 <= by_lang["big"] <= 1150            # ~50% ± binomial
    # determinism: same input → identical row set
    again = mixture_sample(df, "lang", "doc_id", alpha=0.5)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    # the md5 coin matches the portable reference computation
    kept = {r.doc_id for r in out.where(F.col("lang") == "big").collect()}
    import math
    thr = math.floor(math.sqrt(500 / 2000.0) * 1e6)
    for doc_id in range(1000, 1100):
        coin = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
        assert (doc_id in kept) == (coin < thr)
