"""Document-centric index pruning: goldens + self-consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.index_build import term_stats
from search_engine_spark.operators.pruning import (overlap_at_k,
                                                   prune_doc_centric,
                                                   pruned_term_stats)


@pytest.fixture(scope="module")
def tiny_tc(spark):
    # 'common' appears everywhere (low idf); 'rare1/2' in one doc each
    docs = spark.createDataFrame(
        [(1, "common common rare1 filler"),
         (2, "common rare2 filler filler"),
         (3, "common filler")],
        "doc_id long, text string")
    tc = term_counts_sql(docs)
    return tc, term_stats(tc), 3


def test_prune_keeps_high_idf_terms(spark, tiny_tc):
    tc, ts, n = tiny_tc
    got = {(r.doc_id, r.term) for r in
           prune_doc_centric(tc, ts, n, keep_k=1).collect()}
    # rare terms have much higher idf than 'common' (df=3) or 'filler'
    assert (1, "rare1") in got and (2, "rare2") in got
    assert len([1 for d, _ in got if d == 1]) == 1  # exactly keep_k per doc


def test_prune_keep_k_bounds_terms_per_doc(spark, tiny_tc):
    tc, ts, n = tiny_tc
    out = prune_doc_centric(tc, ts, n, keep_k=2)
    per_doc = {r.doc_id: r.cnt for r in
               out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
    assert all(c <= 2 for c in per_doc.values())
    # a doc with fewer distinct terms than keep_k keeps them all
    assert per_doc[3] == 2


def test_pruned_term_stats_self_consistent(spark, tiny_tc):
    tc, ts, n = tiny_tc
    pruned = prune_doc_centric(tc, ts, n, keep_k=1)
    pts = {r.term: (r.df, r.cf) for r in pruned_term_stats(pruned).collect()}
    # df counts only KEEPING docs; every (term, df) pair must match a
    # recount of the pruned relation
    recount = {r.term: (r.df, r.cf) for r in
               pruned.groupBy("term")
               .agg(F.count("*").cast("long").alias("df"),
                    F.sum("tf").cast("long").alias("cf")).collect()}
    assert pts == recount


def test_overlap_at_k_bounds(spark):
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "qid string, doc_id long, rank int")
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], "qid string, doc_id long, rank int")
    got = overlap_at_k(a, b, k=2).collect()[0]
    assert got.n_hit == 1 and got.recall == 0.5
    full = overlap_at_k(b, b, k=2).collect()[0]
    assert full.n_hit == 2 and full.recall == 1.0
