"""SDM ranking: channel goldens + degeneracy to plain LM."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.conf import LM_MU
from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.bigrams import bigram_counts
from search_engine_spark.operators.index_build import doc_stats, term_stats
from search_engine_spark.operators.lm import lm_dirichlet_topk
from search_engine_spark.operators.query import query_terms_df
from search_engine_spark.operators.positional import positional_postings
from search_engine_spark.operators.sdm import (ordered_pair_counts,
                                               sdm_pairs_df, sdm_topk,
                                               window_pair_counts)

DOCS = [
    (1, "spark join spark join fast"),
    (2, "join the spark"),          # 'spark join' never adjacent-ordered
    (3, "spark x x x x x x join"),  # gap 7 → inside window 8, no bigram
    (4, "spark x x x x x x x join"),  # gap 8 → outside window 8
    (5, "other words only"),
]
QS = [("q1", "spark join"), ("q2", "fast fast spark")]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tc = term_counts_sql(docs)
    return docs, tc, doc_stats(tc), term_stats(tc)


def test_sdm_pairs_df_drops_identical_and_counts(spark):
    got = {(r.qid, r.term_a, r.term_b): r.ptf
           for r in sdm_pairs_df(spark, QS).collect()}
    # q2 "fast fast spark": (fast,fast) dropped, (fast,spark) kept
    assert got == {("q1", "spark", "join"): 1, ("q2", "fast", "spark"): 1}


def test_ordered_pair_counts_golden(spark, corpus):
    docs, tc, ds, ts = corpus
    pairs = sdm_pairs_df(spark, [("q1", "spark join")])
    got = {r.doc_id: r.otf for r in
           ordered_pair_counts(bigram_counts(docs), pairs).collect()}
    # doc1 has 'spark join' twice adjacently; docs 2-4 never adjacent
    assert got == {1: 2}


def test_window_pair_counts_golden(spark, corpus):
    docs, tc, ds, ts = corpus
    pairs = sdm_pairs_df(spark, [("q1", "spark join")])
    idx = positional_postings(docs)
    got = {r.doc_id: r.wtf for r in
           window_pair_counts(idx, pairs, window=8).collect()}
    # doc1: spark@{1,3} × join@{2,4} all gaps ≤ 3 → 4 pairs
    # doc2: gap 2 → 1 pair; doc3: gap 7 → 1 pair; doc4: gap 8 → none
    assert got == {1: 4, 2: 1, 3: 1}


def test_sdm_degenerates_to_lm_when_pair_weights_zero(spark, corpus):
    docs, tc, ds, ts = corpus
    q = query_terms_df(spark, QS)
    pairs = sdm_pairs_df(spark, QS)
    ct = int(ds.agg(F.sum("dl")).collect()[0][0])
    co = int(ds.agg(F.sum(F.greatest(F.col("dl") - 1, F.lit(0)))).collect()[0][0])
    got = sdm_topk(tc, ds, ts, q, bigram_counts(docs),
                   positional_postings(docs), pairs, ct, co,
                   lam_t=1.0, lam_o=0.0, lam_u=0.0, k=5)
    exp = lm_dirichlet_topk(tc, ds, ts, q, ct, k=5)
    g = [(r.qid, r.doc_id, r.rank, r.score) for r in
         got.orderBy("qid", "rank").collect()]
    x = [(r.qid, r.doc_id, r.rank, r.score) for r in
         exp.orderBy("qid", "rank").collect()]
    assert g == x


def test_sdm_rewards_ordered_adjacency(spark, corpus):
    """docs 1 and 2 both contain {spark, join}; only doc 1 has them
    adjacent in order AND more window pairs, so with pair channels on,
    doc 1 must outrank doc 2 for q1."""
    docs, tc, ds, ts = corpus
    q = query_terms_df(spark, [("q1", "spark join")])
    pairs = sdm_pairs_df(spark, [("q1", "spark join")])
    ct = int(ds.agg(F.sum("dl")).collect()[0][0])
    co = int(ds.agg(F.sum(F.greatest(F.col("dl") - 1, F.lit(0)))).collect()[0][0])
    got = sdm_topk(tc, ds, ts, q, bigram_counts(docs),
                   positional_postings(docs), pairs, ct, co, k=5)
    ranks = {r.doc_id: r.rank for r in got.collect()}
    assert ranks[1] < ranks[2]
