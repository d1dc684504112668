"""Facet counts, field collapsing, and synonym expansion (operators/
facets.py, operators/synonyms.py)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.facets import collapse_topk, facet_counts
from search_engine_spark.operators.synonyms import (expand_query_terms,
                                                    synonyms_df)


def test_expand_query_terms_weights_and_collisions(spark):
    q = spark.createDataFrame([("q1", "fast", 2), ("q1", "slow", 1)],
                              "qid string, term string, qtf int")
    syn = synonyms_df(spark, [("fast", "slow"), ("fast", "quick")])
    got = {r.term: r.qtf for r in
           expand_query_terms(q, syn, weight=0.5).where("qid = 'q1'").collect()}
    # original fast qtf 2; slow = original 1 + fast-expansion 2*0.5 = 2.0;
    # quick = 2*0.5; symmetric slow→fast adds 1*0.5 onto fast
    assert got["fast"] == pytest.approx(2.5)
    assert got["slow"] == pytest.approx(2.0)
    assert got["quick"] == pytest.approx(1.0)


def test_synonyms_df_symmetric_dedup(spark):
    rows = {(r.term, r.synonym) for r in
            synonyms_df(spark, [("a", "b"), ("b", "a"), ("c", "c")]).collect()}
    assert rows == {("a", "b"), ("b", "a")}  # mirrored once, self-pair dropped


@pytest.fixture(scope="module")
def facet_fixture(spark):
    tc = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 2), (3, "x", 1), (3, "y", 1), (4, "y", 1)],
        "doc_id long, term string, tf int")
    q = spark.createDataFrame([("q1", "x", 1), ("q2", "y", 1)],
                              "qid string, term string, qtf int")
    meta = spark.createDataFrame(
        [(1, "s1"), (2, "s1"), (3, "s2"), (4, "s2")],
        "doc_id long, source string")
    return tc, q, meta


def test_facet_counts_disjunctive_distinct(spark, facet_fixture):
    tc, q, meta = facet_fixture
    got = {(r.qid, r.facet): (r.n_docs, r.rank)
           for r in facet_counts(tc, q, meta, "source").collect()}
    # q1 matches docs {1,2,3}: s1×2, s2×1; q2 matches {3,4}: s2×2
    assert got[("q1", "s1")] == (2, 1)
    assert got[("q1", "s2")] == (1, 2)
    assert got[("q2", "s2")] == (2, 1)
    assert ("q2", "s1") not in got


def test_facet_counts_topk_cut(spark, facet_fixture):
    tc, q, meta = facet_fixture
    got = facet_counts(tc, q, meta, "source", k=1).collect()
    assert {(r.qid, r.facet) for r in got} == {("q1", "s1"), ("q2", "s2")}


def test_collapse_topk_one_per_group(spark, facet_fixture):
    _tc, _q, meta = facet_fixture
    scored = spark.createDataFrame(
        [("q1", 1, 3.0), ("q1", 2, 2.0), ("q1", 3, 1.5), ("q1", 4, 1.0)],
        "qid string, doc_id long, score double")
    got = collapse_topk(scored, meta, "source", k=10).collect()
    # doc 2 (s1) is shadowed by doc 1 (s1, higher score)
    assert [(r.doc_id, r.group, r.rank) for r in
            sorted(got, key=lambda r: r.rank)] == [(1, "s1", 1), (3, "s2", 2)]


def test_collapse_topk_rounded_tie_order(spark, facet_fixture):
    _tc, _q, meta = facet_fixture
    # scores differ only past 6 decimals → tie after rounding → doc_id asc
    scored = spark.createDataFrame(
        [("q1", 3, 1.0000000), ("q1", 4, 1.0000001)],
        "qid string, doc_id long, score double")
    got = collapse_topk(scored, meta, "source", k=10).collect()
    assert [(r.doc_id, r.rank) for r in sorted(got, key=lambda r: r.rank)] \
        == [(3, 1)]  # same group s2: doc 3 wins the rounded tie by doc_id


def test_filtered_topk_global_stats(spark):
    """Drilldown keeps GLOBAL scoring stats: surviving docs score
    exactly as in the unfiltered ranking; non-facet docs are gone."""
    from search_engine_spark.operators.facets import filtered_topk
    from search_engine_spark.operators.query import bm25_topk
    tc = spark.createDataFrame(
        [(1, "x", 2), (2, "x", 1), (3, "x", 5)],
        "doc_id long, term string, tf int")
    ds = spark.createDataFrame([(1, 4), (2, 4), (3, 9)],
                               "doc_id long, dl long")
    ts = spark.createDataFrame([("x", 3)], "term string, df long")
    meta = spark.createDataFrame([(1, "s1"), (2, "s2"), (3, "s1")],
                                 "doc_id long, source string")
    q = spark.createDataFrame([("q1", "x", 1)],
                              "qid string, term string, qtf int")
    full = {r.doc_id: r.score
            for r in bm25_topk(tc, ds, ts, q, 3, 17 / 3, k=10).collect()}
    got = sorted(filtered_topk(tc, ds, ts, q, meta, "source", "s1",
                               3, 17 / 3, k=10).collect(),
                 key=lambda r: r.rank)
    assert [r.doc_id for r in got] == sorted(
        [1, 3], key=lambda d: (-full[d], d))
    for r in got:
        assert r.score == full[r.doc_id]  # filter never changes scores


def test_grouped_topk_golden(spark):
    """Per-(qid, group) top-k with the pinned (score desc, doc_id)
    order and rank cut."""
    from search_engine_spark.operators.facets import grouped_topk
    scored = spark.createDataFrame(
        [("q1", 1, 5.0), ("q1", 2, 4.0), ("q1", 3, 3.0), ("q1", 4, 3.0),
         ("q1", 5, 2.0), ("q2", 1, 1.0)],
        "qid string, doc_id long, score double")
    meta = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")],
        "doc_id long, source string")
    got = {(r.qid, r.group, r.grank): (r.doc_id, r.score) for r in
           grouped_topk(scored, meta, "source", k=2).collect()}
    assert got[("q1", "a", 1)] == (1, 5.0)
    assert got[("q1", "a", 2)] == (2, 4.0)        # doc 3 cut at k=2
    assert got[("q1", "b", 1)] == (4, 3.0)
    assert got[("q1", "b", 2)] == (5, 2.0)
    assert got[("q2", "a", 1)] == (1, 1.0)
    assert len(got) == 5
