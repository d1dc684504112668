"""Percolation (reverse search), proximity rescore, significant terms,
and the date_histogram aggregation, vs hand-computed expectations."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.facets import (date_histogram,
                                                  significant_terms)
from search_engine_spark.operators.percolate import percolate
from search_engine_spark.operators.positional import positional_postings
from search_engine_spark.operators.query import query_terms_df
from search_engine_spark.operators.rescore import rescore_topk


def _corpus(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs, term_counts_sql(docs)


def test_percolate_conjunctive_and_oov(spark):
    docs, tc = _corpus(spark, [
        (1, "spark join fast"), (2, "spark"), (3, "join join spark")])
    q = query_terms_df(spark, [("qa", "spark join"), ("qb", "spark"),
                               ("qc", "spark zzz")])  # qc unsatisfiable
    got = {r.doc_id: (r.qids, r.n_queries)
           for r in percolate(tc, q).collect()}
    assert got == {1: ("qa,qb", 2), 2: ("qb", 1), 3: ("qa,qb", 2)}


def test_rescore_proximity_reorders(spark):
    # doc 1: terms adjacent (dist 1); doc 2: far apart (dist 3); doc 3:
    # only one query term. BM25 alone can't separate 1 vs 2 here (same
    # tf/dl); the proximity boost must rank doc 1 first.
    docs, tc = _corpus(spark, [
        (1, "spark join other other"), (2, "spark other other join"),
        (3, "spark spark spark spark")])
    from search_engine_spark.operators.index_build import (doc_stats,
                                                           term_stats)
    ds = doc_stats(tc)
    ts = term_stats(tc)
    q = query_terms_df(spark, [("q1", "spark join")])
    from search_engine_spark.operators.query import bm25_scores
    scored = bm25_scores(tc, ds, ts, q, 3, 4.0)
    out = rescore_topk(scored, positional_postings(docs), q, k=3)
    rows = {r.rank: r for r in out.collect()}
    assert rows[1].doc_id == 1 and rows[2].doc_id == 2
    # boost = 2/(1+dist): dist 1 → 1.0, dist 3 → 0.5
    assert math.isclose(rows[1].score - rows[1].base_score, 1.0,
                        abs_tol=1e-6)
    assert math.isclose(rows[2].score - rows[2].base_score, 0.5,
                        abs_tol=1e-6)
    assert rows[3].score == rows[3].base_score  # one term: no boost


def test_significant_terms_jlh(spark):
    # fg = docs matching "spark" = {1, 2}; term "gpu" appears in both
    # fg docs but only 2/4 of the corpus → lifted; "common" is
    # everywhere → fg_rate == bg_rate → excluded.
    docs, tc = _corpus(spark, [
        (1, "spark gpu common"), (2, "spark gpu common"),
        (3, "other common"), (4, "other common")])
    from search_engine_spark.operators.index_build import term_stats
    q = query_terms_df(spark, [("q1", "spark")])
    got = {r.term: r for r in
           significant_terms(tc, term_stats(tc), q, 4, k=10).collect()}
    assert "common" not in got
    assert got["gpu"].fg_df == 2 and got["gpu"].bg_df == 2
    # fgr=1, bgr=0.5 → (1-0.5)*(1/0.5) = 1.0
    assert math.isclose(got["gpu"].score, 1.0, abs_tol=1e-6)
    assert got["spark"].score == got["gpu"].score  # same counts
    assert got["gpu"].rank == 1  # tie broken term asc


def test_date_histogram_buckets(spark):
    t0 = dt.datetime(2026, 1, 1, 10, 15)
    ev = spark.createDataFrame(
        [(1, t0, "click", 1.5), (2, t0.replace(minute=50), "click", 2.0),
         (3, t0.replace(hour=11), "click", 3.0), (4, t0, "view", 4.0)],
        "event_id long, ts timestamp, event_type string, value double")
    got = {(str(r.bucket), r.key): (r.n_events, r.sum_value)
           for r in date_histogram(ev).collect()}
    assert got == {("2026-01-01 10:00:00", "click"): (2, 3.5),
                   ("2026-01-01 11:00:00", "click"): (1, 3.0),
                   ("2026-01-01 10:00:00", "view"): (1, 4.0)}


def test_burst_scores_trailing_window(spark):
    import datetime as dt

    from search_engine_spark.operators.facets import burst_scores
    base = dt.datetime(2026, 1, 1, 0, 30)
    rows = []
    eid = 0
    # clicks: hours 0-3 have 2/hour, hour 4 spikes to 6
    for h, n in [(0, 2), (1, 2), (2, 2), (3, 2), (4, 6)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base.replace(hour=h), "click", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double")
    got = {str(r.bucket): r for r in burst_scores(ev).collect()}
    # only hours 3 and 4 have a full 3-bucket trailing window
    assert set(got) == {"2026-01-01 03:00:00", "2026-01-01 04:00:00"}
    assert got["2026-01-01 03:00:00"].score == 1.0
    assert got["2026-01-01 04:00:00"].trail_avg == 2.0
    assert got["2026-01-01 04:00:00"].score == 3.0
