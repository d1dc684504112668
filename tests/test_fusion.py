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
