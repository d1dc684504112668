"""Bigram phrase acceleration, static doc priors, and QPP
(operators/bigrams.py, operators/boosts.py)."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators.bigrams import (bigram_counts,
                                                   phrase_bigrams_df,
                                                   phrase_match_by_bigrams)
from search_engine_spark.operators.boosts import (prior_boosted_topk,
                                                  query_difficulty)


def test_bigram_counts_golden(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "solo"), (3, None), (4, "x y")],
        "doc_id long, text string")
    got = {(r.doc_id, r.bigram): r.tf for r in bigram_counts(docs).collect()}
    assert got == {(1, "a b"): 2, (1, "b a"): 1, (4, "x y"): 1}


def test_bigram_phrase_exact_for_two_terms(spark):
    """2-term phrase via bigrams ≡ positional phrase containment."""
    from search_engine_spark.operators.positional import (phrase_occurrences,
                                                          phrase_terms_df,
                                                          positional_postings)
    from search_engine_spark.sources.transcripts import generate_transcripts
    docs = (generate_transcripts(spark, n_convs=20)
            .selectExpr("monotonically_increasing_id() AS doc_id", "text"))
    phrases = [("p1", "a se"), ("p2", "se a")]
    bigram_docs = {(r.qid, r.doc_id) for r in phrase_match_by_bigrams(
        bigram_counts(docs), phrase_bigrams_df(spark, phrases)).collect()}
    pos_docs = {(r.qid, r.doc_id) for r in phrase_occurrences(
        positional_postings(docs), phrase_terms_df(spark, phrases)).collect()}
    assert bigram_docs == pos_docs and bigram_docs


def test_bigram_phrase_superset_for_three_terms(spark):
    # doc 2 has both pairs but not contiguously → bigram candidate,
    # NOT a true phrase match (the documented false-positive class)
    docs = spark.createDataFrame(
        [(1, "u v w"), (2, "u v x v w"), (3, "u w v")],
        "doc_id long, text string")
    got = {r.doc_id: r.min_pair_tf for r in phrase_match_by_bigrams(
        bigram_counts(docs),
        phrase_bigrams_df(spark, [("p1", "u v w")])).collect()}
    assert set(got) == {1, 2}
    assert got[1] == 1  # min pair tf bounds phrase tf


def test_prior_boost_reorders(spark):
    scored = spark.createDataFrame(
        [("q1", 1, 2.0), ("q1", 2, 1.5)],
        "qid string, doc_id long, score double")
    priors = spark.createDataFrame([(1, 0), (2, 9)],
                                   "doc_id long, prior long")
    got = sorted(prior_boosted_topk(scored, priors, k=10).collect(),
                 key=lambda r: r.rank)
    # doc 2: 1.5 + ln(10) ≈ 3.803 beats doc 1: 2.0 + ln(1) = 2.0
    assert [r.doc_id for r in got] == [2, 1]
    assert got[0].score == pytest.approx(1.5 + math.log(10.0), abs=1e-6)
    # alpha=0 restores the text-only order
    off = sorted(prior_boosted_topk(scored, priors, k=10, alpha=0.0).collect(),
                 key=lambda r: r.rank)
    assert [r.doc_id for r in off] == [1, 2]


def test_query_difficulty_golden(spark):
    q = spark.createDataFrame(
        [("q1", "rare", 1), ("q1", "oov", 1), ("q2", "common", 1)],
        "qid string, term string, qtf int")
    ts = spark.createDataFrame([("rare", 1, 2), ("common", 90, 500)],
                               "term string, df long, cf long")
    got = {r.qid: r for r in
           query_difficulty(q, ts, n_docs=100, collection_len=1000).collect()}
    idf_rare = math.log(1.0 + (100 - 1 + 0.5) / 1.5)
    assert got["q1"].n_terms == 2 and got["q1"].n_matched == 1
    assert got["q1"].avg_idf == pytest.approx(idf_rare, abs=1e-6)
    assert got["q1"].max_idf == got["q1"].avg_idf  # single matched term
    assert got["q1"].avg_ictf == pytest.approx(math.log(1000 / 2), abs=1e-6)
    assert got["q1"].scq == pytest.approx(
        (1.0 + math.log(2.0)) * idf_rare, abs=1e-6)
    assert got["q2"].n_matched == 1 and got["q2"].max_idf < got["q1"].max_idf


def test_recency_boost_reorders_and_decays(spark):
    from search_engine_spark.operators.boosts import recency_boosted_topk
    import math
    scored = spark.createDataFrame(
        [("q1", 1, 10.0), ("q1", 2, 8.0), ("q1", 3, 8.0)],
        "qid string, doc_id long, score double")
    # doc 1 is old (age 2tau), docs 2/3 fresh (age 0 / tau)
    ts = spark.createDataFrame(
        [(1, 0), (2, 200), (3, 100)], "doc_id long, ts_s long")
    out = recency_boosted_topk(scored, ts, ref_ts_s=200, tau_s=100.0, k=3)
    rows = {r.doc_id: r for r in out.collect()}
    # decayed: d1 = 10*e^-2 ≈ 1.353, d2 = 8, d3 = 8*e^-1 ≈ 2.943
    assert [r.doc_id for r in sorted(rows.values(), key=lambda r: r.rank)] == [2, 3, 1]
    assert abs(rows[1].score - round(10 * math.exp(-2.0), 6)) <= 1e-6
    assert rows[2].score == 8.0
    assert abs(rows[3].score - round(8 * math.exp(-1.0), 6)) <= 1e-6


def test_next_word_topk_golden(spark):
    """Counts, MLE prob over ALL continuations (not just top-k), and
    the (n desc, term asc) tie order."""
    from search_engine_spark.operators.bigrams import (bigram_counts,
                                                       next_word_topk)
    docs = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "to be is to do"),
         (3, "do be do be do")],
        "doc_id long, text string")
    ctx = spark.createDataFrame([("to",), ("do",)], "term string")
    got = {(r.context, r.rank): (r.next_term, r.n, r.prob) for r in
           next_word_topk(bigram_counts(docs), ctx, k=2).collect()}
    # 'to' continuations: be×3, do×1 (tot 4); 'do' (doc3 only,
    # doc2's trailing 'do' has no successor): be×2 (tot 2)
    assert got == {("to", 1): ("be", 3, 0.75), ("to", 2): ("do", 1, 0.25),
                   ("do", 1): ("be", 2, 1.0)}
