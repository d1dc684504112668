"""Benchmark decontamination (operators/decontam.py)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.decontam import contaminated_docs


def test_contaminated_docs_golden(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, base + " tail tokens here"),        # contains the 8-gram
         (2, "prefix words " + base),            # also contains it
         (3, "alpha beta gamma delta unrelated suffix tokens here"),
         (4, None)],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [("e1", base), ("e2", "no match at all for this one really")],
        "eval_id string, text string")
    got = {(r.doc_id, r.eval_id): r.n_hits
           for r in contaminated_docs(docs, ev, n=8).collect()}
    assert got == {(1, "e1"): 1, (2, "e1"): 1}  # doc 3: only a 4-gram


def test_contaminated_docs_counts_distinct_ngrams(spark):
    # eval item of 9 tokens = two 8-grams; a doc containing all 9
    # shares both
    ev_text = "a b c d e f g h i"
    docs = spark.createDataFrame([(1, "x " + ev_text + " y")],
                                 "doc_id long, text string")
    ev = spark.createDataFrame([("e1", ev_text)],
                               "eval_id string, text string")
    got = contaminated_docs(docs, ev, n=8).collect()
    assert [(r.doc_id, r.eval_id, r.n_hits) for r in got] == [(1, "e1", 2)]


def test_doc_perplexity_golden(spark):
    """Hand-computed unigram cross-entropy on a 2-doc corpus."""
    import math
    from search_engine_spark.operators.textstats import doc_perplexity
    # corpus: doc1 = [a, a, b]; doc2 = [b]. cf: a=2, b=2, |C|=4
    tc = spark.createDataFrame([(1, "a", 2), (1, "b", 1), (2, "b", 1)],
                               "doc_id long, term string, tf int")
    ts = spark.createDataFrame([("a", 2, 2), ("b", 2, 2)],
                               "term string, df long, cf long")
    got = {r.doc_id: r for r in doc_perplexity(tc, ts, 4).collect()}
    # doc1: -(2·ln(1/2) + 1·ln(1/2)) / 3 = ln 2 ; ppl = 2
    assert got[1].avg_nll == pytest.approx(math.log(2.0), abs=1e-6)
    assert got[1].ppl == pytest.approx(2.0, abs=1e-6)
    assert got[2].avg_nll == pytest.approx(math.log(2.0), abs=1e-6)
    assert got[1].dl == 3 and got[2].dl == 1
