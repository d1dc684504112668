"""Benchmark decontamination (operators/decontam.py)."""

from __future__ import annotations

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
