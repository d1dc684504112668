"""Multinomial Naive Bayes (operators/classify.py): hand-computed
posterior, separable-corpus accuracy, smoothing floor for unseen
terms."""

from __future__ import annotations

import math

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.classify import nb_predict, nb_train


def _fit(spark, rows, labels):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tc = term_counts_sql(docs)
    lab = spark.createDataFrame(labels, "doc_id long, label string")
    tcl, cst, v = nb_train(tc, lab)
    return tc, tcl, cst, v


def test_nb_separable_corpus(spark):
    # two topics with disjoint vocabulary -> resubstitution accuracy 1.0
    rows, labels = [], []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, "spark shuffle partition executor"))
            labels.append((i, "eng"))
        else:
            rows.append((i, "sonnet stanza rhyme meter"))
            labels.append((i, "poem"))
    tc, tcl, cst, v = _fit(spark, rows, labels)
    pred = {r.doc_id: r.pred for r in nb_predict(tc, tcl, cst, v).collect()}
    assert all(pred[i] == ("eng" if i % 2 == 0 else "poem")
               for i in range(20))


def test_nb_hand_computed_posterior(spark):
    # 2 docs, 1 per class: P(c)=1/2; vocab {a,b,c}=3.
    # class x: tokens "a a b" (3 tokens); class y: tokens "c" (1 token)
    rows = [(1, "a a b"), (2, "c")]
    labels = [(1, "x"), (2, "y")]
    tc, tcl, cst, v = _fit(spark, rows, labels)
    assert v == 3
    out = {r.doc_id: r for r in nb_predict(tc, tcl, cst, v).collect()}
    # doc 1 under x: ln(1/2) + 2·ln((2+1)/(3+3)) + 1·ln((1+1)/(3+3))
    exp = round(round(math.log(0.5), 6) + 2 * math.log(3 / 6)
                + math.log(2 / 6), 6)
    assert out[1].pred == "x"
    assert abs(out[1].score - exp) < 1e-9


def test_nb_unseen_terms_fall_to_floor(spark):
    # a doc whose terms the training class never saw still scores via
    # the add-one floor and the prior decides
    rows = [(1, "a a a a a"), (2, "b"), (3, "zz qq")]
    labels = [(1, "big"), (2, "small"), (3, "big")]
    tc, tcl, cst, v = _fit(spark, rows, labels)
    out = {r.doc_id: r.pred for r in nb_predict(tc, tcl, cst, v).collect()}
    assert set(out) == {1, 2, 3}  # every doc classified, none dropped
