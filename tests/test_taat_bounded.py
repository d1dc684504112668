"""Accumulator-bounded TAAT (operators/query.py::taat_bounded_topk):
admission semantics, exact scores for admitted docs, budget→exhaustive
identity."""

from __future__ import annotations

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.index_build import doc_stats, term_stats
from search_engine_spark.operators.query import bm25_topk, taat_bounded_topk


def _corpus(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tc = term_counts_sql(docs)
    ds = doc_stats(tc)
    ts = term_stats(tc)
    n = docs.count()
    avgdl = ds.agg({"dl": "avg"}).collect()[0][0]
    return tc, ds, ts, n, avgdl


def _q(spark, qid, title):
    from search_engine_spark.operators.query import query_terms_df
    return query_terms_df(spark, [(qid, title)])


def test_admission_excludes_frequent_only_docs(spark):
    # 'rare' appears in docs 1-2 (df=2); 'common' in all 10 (df=10).
    # Budget 5 admits only the 'rare' prefix (cumdf 2; adding 'common'
    # would make 12 > 5), so docs matching ONLY 'common' are excluded.
    rows = [(i, "common rare filler") for i in (1, 2)]
    rows += [(i, "common other filler") for i in range(3, 11)]
    tc, ds, ts, n, avgdl = _corpus(spark, rows)
    q = _q(spark, "q1", "rare common")
    out = taat_bounded_topk(tc, ds, ts, q, n, avgdl, acc_budget=5, k=10)
    got = {r.doc_id for r in out.collect()}
    assert got == {1, 2}


def test_admitted_scores_are_exact(spark):
    # Admitted docs must carry the FULL BM25 score (all query terms),
    # equal to the exhaustive ranking's score for the same doc.
    rows = [(i, "common rare filler") for i in (1, 2)]
    rows += [(i, "common other filler") for i in range(3, 11)]
    tc, ds, ts, n, avgdl = _corpus(spark, rows)
    q = _q(spark, "q1", "rare common")
    bounded = {r.doc_id: r.score
               for r in taat_bounded_topk(tc, ds, ts, q, n, avgdl,
                                          acc_budget=5, k=10).collect()}
    full = {r.doc_id: r.score
            for r in bm25_topk(tc, ds, ts, q, n, avgdl, k=10).collect()}
    for d, s in bounded.items():
        assert s == full[d]


def test_rarest_term_always_admits(spark):
    # Even a budget of 0 keeps the rank-1 (rarest) term, so the query
    # still returns its matches.
    rows = [(1, "needle a b"), (2, "a b c"), (3, "a c d")]
    tc, ds, ts, n, avgdl = _corpus(spark, rows)
    q = _q(spark, "q1", "needle a")
    out = taat_bounded_topk(tc, ds, ts, q, n, avgdl, acc_budget=0, k=10)
    assert {r.doc_id for r in out.collect()} == {1}


def test_large_budget_equals_exhaustive(spark):
    rows = [(i, f"t{i % 3} t{i % 5} shared") for i in range(20)]
    tc, ds, ts, n, avgdl = _corpus(spark, rows)
    q = _q(spark, "q1", "t1 shared")
    bounded = taat_bounded_topk(tc, ds, ts, q, n, avgdl,
                                acc_budget=10**9, k=10)
    full = bm25_topk(tc, ds, ts, q, n, avgdl, k=10)
    assert [tuple(r) for r in bounded.collect()] == \
           [tuple(r) for r in full.collect()]
