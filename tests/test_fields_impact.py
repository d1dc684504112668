"""BM25F fielded ranking, impact quantization, and hit counts
(operators/fields.py, operators/impact.py, operators/query.py)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.fields import (TITLE_TOKENS, bm25f_topk,
                                                  field_doc_stats,
                                                  field_term_counts)
from search_engine_spark.operators.impact import (impact_postings,
                                                  quantize_impacts,
                                                  quantized_topk)
from search_engine_spark.operators.query import hit_counts


@pytest.fixture(scope="module")
def field_docs(spark):
    # Equal field lengths (title 8, body 8) so ONLY the field weight
    # differs: doc 1 has "zebra" in the title slice, doc 2 in the body.
    t = [f"t{i}" for i in range(TITLE_TOKENS)]
    b = [f"b{i}" for i in range(TITLE_TOKENS)]
    d1 = " ".join(["zebra"] + t[1:] + b)
    d2 = " ".join(t + ["zebra"] + b[1:])
    d3 = " ".join(t + b)
    return spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string")


def test_field_split_boundary(spark, field_docs):
    tcf = field_term_counts(field_docs)
    rows = {(r.doc_id, r.field, r.term): r.tf for r in tcf.collect()}
    assert rows[(1, "title", "zebra")] == 1
    assert (1, "body", "zebra") not in rows
    assert rows[(2, "body", "zebra")] == 1
    assert (2, "title", "zebra") not in rows
    # doc with exactly TITLE_TOKENS*2 tokens: body present; a short doc
    short = spark.createDataFrame([(9, "one two")], "doc_id long, text string")
    assert {r.field for r in field_term_counts(short).collect()} == {"title"}


def test_bm25f_title_boost(spark, field_docs):
    tcf = field_term_counts(field_docs)
    dsf = field_doc_stats(tcf)
    q = spark.createDataFrame([("q1", "zebra", 1)],
                              "qid string, term string, qtf int")
    got = sorted(bm25f_topk(tcf, dsf, q, n_docs=3, k=10).collect(),
                 key=lambda r: r.rank)
    # same tf/df; only the field differs → title hit must rank first
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].score > got[1].score > 0


def test_quantize_monotone_and_top_bucket(spark):
    tc = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 4), (2, "a", 2)],
        "doc_id long, term string, tf int")
    ds = spark.createDataFrame([(1, 5), (2, 2)], "doc_id long, dl long")
    ts = spark.createDataFrame([("a", 2), ("b", 1)], "term string, df long")
    imps = impact_postings(tc, ds, ts, n_docs=2, avgdl=3.5)
    qp, m = quantize_impacts(imps, bits=8)
    rows = {(r.term, r.doc_id): r.bucket for r in qp.collect()}
    ivals = {(r.term, r.doc_id): r.imp for r in imps.collect()}
    top = max(ivals, key=ivals.get)
    assert rows[top] == 255  # the max posting fills the top bucket
    assert all(0 <= b <= 255 for b in rows.values())
    # monotone: higher exact impact never gets a lower bucket
    for k1 in ivals:
        for k2 in ivals:
            if ivals[k1] < ivals[k2]:
                assert rows[k1] <= rows[k2]


def test_quantized_topk_integer_scores(spark):
    qp = spark.createDataFrame(
        [("a", 1, 200), ("a", 2, 100), ("b", 1, 50)],
        "term string, doc_id long, bucket int")
    q = spark.createDataFrame([("q1", "a", 2), ("q1", "b", 1)],
                              "qid string, term string, qtf int")
    got = sorted(quantized_topk(qp, q, k=10).collect(), key=lambda r: r.rank)
    assert [(r.doc_id, r.score) for r in got] == [(1, 450), (2, 200)]


def test_hit_counts_golden(spark):
    tc = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 1), (2, "x", 3), (3, "y", 1)],
        "doc_id long, term string, tf int")
    q = spark.createDataFrame(
        [("q1", "x", 1), ("q1", "y", 1), ("q2", "zzz", 1)],
        "qid string, term string, qtf int")
    got = {r.qid: (r.n_any, r.n_all) for r in hit_counts(tc, q).collect()}
    assert got["q1"] == (3, 1)  # docs {1,2,3} match any; only doc 1 has both
    assert "q2" not in got      # nothing matches → no row


def test_bm25f_unknown_field_weight_is_zero(spark, field_docs):
    """A field missing from the weight map contributes zero, not NULL
    (which would silently null the whole doc's pseudo-tf)."""
    tcf = field_term_counts(field_docs)
    dsf = field_doc_stats(tcf)
    q = spark.createDataFrame([("q1", "zebra", 1)],
                              "qid string, term string, qtf int")
    got = sorted(bm25f_topk(tcf, dsf, q, n_docs=3, k=10,
                            field_weights={"title": 2.0}).collect(),
                 key=lambda r: r.rank)
    # body weight 0 → the body-only zebra doc scores 0, title doc > 0
    by_doc = {r.doc_id: r.score for r in got}
    assert by_doc[1] > 0 and by_doc.get(2, 0.0) == 0.0
