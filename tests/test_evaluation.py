"""MAP / P@k gates with hand-computed golden values (the trec_eval
analogue, SURVEY.md §2.6 O4)."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.evaluation import (mean_average_precision,
                                                      per_query_ap,
                                                      precision_at_k)


@pytest.fixture(scope="module")
def run_and_qrels(spark):
    # q1: ranks 1..5 → docs 10,20,30,40,50; relevant {10, 30, 99}
    #   AP = (1/1 + 2/3) / 3 = 0.555556 ; P@3 = 2/3
    # q2: ranks 1..3 → docs 1,2,3; relevant {7}  → AP 0, P@3 0
    # q3: judged but never retrieved → AP 0 (counted in MAP)
    results = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 20, 2), ("q1", 30, 3), ("q1", 40, 4), ("q1", 50, 5),
         ("q2", 1, 1), ("q2", 2, 2), ("q2", 3, 3)],
        "qid string, doc_id long, rank int")
    qrels = spark.createDataFrame(
        [("q1", 10), ("q1", 30), ("q1", 99), ("q2", 7), ("q3", 5)],
        "qid string, doc_id long")
    return results, qrels


def test_per_query_ap_golden(spark, run_and_qrels):
    results, qrels = run_and_qrels
    got = {r.qid: r for r in per_query_ap(results, qrels).collect()}
    assert got["q1"].ap == pytest.approx(0.555556, abs=1e-6)
    assert got["q1"].n_rel == 3 and got["q1"].n_ret_rel == 2
    assert got["q2"].ap == 0.0 and got["q2"].n_ret_rel == 0
    assert got["q3"].ap == 0.0 and got["q3"].n_rel == 1


def test_map_golden(spark, run_and_qrels):
    results, qrels = run_and_qrels
    row = mean_average_precision(results, qrels).collect()[0]
    assert row.n_queries == 3
    assert row.map == pytest.approx(0.555556 / 3, abs=1e-5)


def test_precision_at_k_golden(spark, run_and_qrels):
    results, qrels = run_and_qrels
    got = {r.qid: r.p_at_k for r in precision_at_k(results, qrels, 3).collect()}
    assert got["q1"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["q2"] == 0.0
    assert got["q3"] == 0.0


def test_depth_cutoff(spark, run_and_qrels):
    results, qrels = run_and_qrels
    got = {r.qid: r for r in per_query_ap(results, qrels, depth=2).collect()}
    # only rank-1 hit counts at depth 2 → AP = (1/1)/3
    assert got["q1"].ap == pytest.approx(1 / 3, abs=1e-6)
    assert got["q1"].n_ret_rel == 1


def test_ndcg_at_k_golden(spark, run_and_qrels):
    """Hand-computed binary nDCG@3:
    q1: rel ranks {1, 3} → DCG = 1/log2(2) + 1/log2(4) = 1.5;
        IDCG(3 rel, k=3) = 1 + 1/log2(3) + 1/2 = 2.130930
        → 0.703917
    q2: no relevant retrieved → 0.0 (n_rel = 1)
    q3: judged, never retrieved → 0.0"""
    import math

    from search_engine_spark.functions.evaluation import ndcg_at_k
    results, qrels = run_and_qrels
    got = {r.qid: r for r in ndcg_at_k(results, qrels, k=3).collect()}
    idcg3 = 1.0 + 1.0 / math.log2(3) + 0.5
    assert got["q1"].ndcg == pytest.approx(round(1.5 / idcg3, 6), abs=1e-6)
    assert got["q1"].n_rel == 3
    assert got["q2"].ndcg == 0.0
    assert got["q3"].ndcg == 0.0 and got["q3"].n_rel == 1


def test_reciprocal_rank_golden(spark, run_and_qrels):
    from search_engine_spark.functions.evaluation import reciprocal_rank
    results, qrels = run_and_qrels
    got = {r.qid: r for r in reciprocal_rank(results, qrels).collect()}
    # q1: first relevant at rank 1 → rr 1.0; q2/q3: none → rr 0, rank 0
    assert got["q1"].rr == 1.0 and got["q1"].first_rel_rank == 1
    assert got["q2"].rr == 0.0 and got["q2"].first_rel_rank == 0
    assert got["q3"].rr == 0.0
    # depth cut excludes q1's rank-1 hit when depth=0 semantics via depth=2
    shallow = {r.qid: r for r in
               reciprocal_rank(results.where("doc_id != 10"), qrels,
                               depth=2).collect()}
    assert shallow["q1"].rr == 0.0  # next relevant (30) is at rank 3 > depth


def test_recall_at_k_golden(spark, run_and_qrels):
    from search_engine_spark.functions.evaluation import recall_at_k
    results, qrels = run_and_qrels
    got = {r.qid: r for r in recall_at_k(results, qrels, k=5).collect()}
    assert got["q1"].recall == pytest.approx(2 / 3, abs=1e-6)
    assert got["q1"].n_rel == 3 and got["q1"].n_ret_rel == 2
    assert got["q2"].recall == 0.0 and got["q3"].recall == 0.0
    # k=1 keeps only the rank-1 hit
    top1 = {r.qid: r for r in recall_at_k(results, qrels, k=1).collect()}
    assert top1["q1"].recall == pytest.approx(1 / 3, abs=1e-6)


def test_err_at_k_golden(spark, run_and_qrels):
    from search_engine_spark.functions.evaluation import err_at_k
    results, qrels = run_and_qrels
    got = {r.qid: r for r in err_at_k(results, qrels, k=5).collect()}
    # q1: rel at ranks 1 and 3 → 0.5/1 + 0.5·0.5/3 = 0.583333
    assert got["q1"].err == pytest.approx(0.5 + 0.25 / 3, abs=1e-6)
    assert got["q1"].n_rel == 3
    # q2/q3: nothing relevant retrieved → 0, but still reported
    assert got["q2"].err == 0.0 and got["q3"].err == 0.0
    # k=1 keeps only q1's rank-1 contribution
    top1 = {r.qid: r for r in err_at_k(results, qrels, k=1).collect()}
    assert top1["q1"].err == pytest.approx(0.5, abs=1e-6)


def test_bm25plus_beats_plain_on_long_match(spark):
    """BM25+'s δ keeps a long matching doc above non-matching ones and
    adds exactly qtf·idf·δ over plain BM25 per matched term."""
    import math
    from search_engine_spark.functions.tokenize import term_counts
    from search_engine_spark.operators.index_build import doc_stats, term_stats
    from search_engine_spark.operators.query import (bm25_topk, bm25plus_topk,
                                                     query_terms_df)
    long_doc = "x " * 50 + "needle"
    tw = spark.createDataFrame(
        [(0, long_doc), (1, "y y y"), (2, "needle z")],
        "doc_id long, text string")
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    q = query_terms_df(spark, [("g1", "needle")])
    n_docs, avgdl = 3, (51 + 3 + 2) / 3.0
    plain = {r.doc_id: r.score for r in
             bm25_topk(tc, ds, ts_, q, n_docs, avgdl, k=10).collect()}
    plus = {r.doc_id: r.score for r in
            bm25plus_topk(tc, ds, ts_, q, n_docs, avgdl, k=10,
                          delta=1.0).collect()}
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    for d in (0, 2):
        assert plus[d] == pytest.approx(plain[d] + idf, abs=2e-6)
    assert 1 not in plus  # non-matching doc never scores


def test_rbo_identical_and_disjoint_runs(spark):
    """RBO bounds: identical rankings score the truncated maximum
    (1-p)·Σ p^(d-1) — with p=0.5, depth 3 → 0.5·(1+0.5+0.25) = 0.875 —
    and disjoint rankings score 0."""
    from search_engine_spark.functions.evaluation import (rbo_at_depth,
                                                          rbo_weights)
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "qid string, doc_id long, rank int")
    same = rbo_at_depth(a, a, depth=3, p=0.5).collect()[0]
    assert same.rbo == pytest.approx(0.875, abs=1e-9)
    b = spark.createDataFrame(
        [("q", 7, 1), ("q", 8, 2), ("q", 9, 3)],
        "qid string, doc_id long, rank int")
    assert rbo_at_depth(a, b, depth=3, p=0.5).collect()[0].rbo == 0.0


def test_rbo_partial_overlap_golden(spark):
    """A=[1,2], B=[2,1] at depth 2, p=0.5: both docs enter the
    intersection at depth 2 → RBO = 0.5 · 2·W(2) = 0.5·2·(0.5/2) =
    0.25; doc-for-doc agreement at depth 1 contributes nothing."""
    from search_engine_spark.functions.evaluation import rbo_at_depth
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "qid string, doc_id long, rank int")
    b = spark.createDataFrame(
        [("q", 2, 1), ("q", 1, 2)], "qid string, doc_id long, rank int")
    got = rbo_at_depth(a, b, depth=2, p=0.5).collect()[0]
    assert got.rbo == pytest.approx(0.25, abs=1e-9)


def test_rbo_weights_telescope():
    """W(1) must equal the full truncated sum; W(depth) the last term."""
    from search_engine_spark.functions.evaluation import rbo_weights
    w = rbo_weights(10, 0.5)
    assert w[10] == pytest.approx(0.5 ** 9 / 10, abs=1e-15)
    acc = sum(0.5 ** (d - 1) / d for d in range(1, 11))
    assert w[1] == pytest.approx(acc, abs=1e-12)


# ------------------------------------------------- paired permutation test

def _ap_df(spark, pairs):
    return spark.createDataFrame(pairs, "qid string, ap double")


def test_sign_test_consistent_wins(spark):
    from search_engine_spark.functions.evaluation import paired_sign_test
    # A beats B on all 3 queries (unequal margins): only the identity
    # and the all-flipped pattern reach |mean|, p = 2/8
    a = _ap_df(spark, [("q1", 0.5), ("q2", 0.62), ("q3", 0.68)])
    b = _ap_df(spark, [("q1", 0.4), ("q2", 0.5), ("q3", 0.6)])
    r = paired_sign_test(a, b).collect()[0]
    assert r.n_queries == 3
    assert abs(r.mean_diff - 0.1) < 1e-9
    assert r.p_value == 0.25
    assert r.t_stat > 0  # variance > 0 here (margins differ)


def test_sign_test_zero_mean(spark):
    from search_engine_spark.functions.evaluation import paired_sign_test
    # differences cancel: every flip pattern's |mean| >= 0 = |mean_obs|
    a = _ap_df(spark, [("q1", 0.5), ("q2", 0.4)])
    b = _ap_df(spark, [("q1", 0.4), ("q2", 0.5)])
    r = paired_sign_test(a, b).collect()[0]
    assert abs(r.mean_diff) < 1e-9
    assert r.p_value == 1.0


def test_sign_test_identical_runs(spark):
    from search_engine_spark.functions.evaluation import paired_sign_test
    a = _ap_df(spark, [("q1", 0.5), ("q2", 0.4), ("q3", 0.3)])
    r = paired_sign_test(a, a).collect()[0]
    assert r.mean_diff == 0.0 and r.t_stat == 0.0 and r.p_value == 1.0


def test_sign_test_guard_raises_beyond_max_n(spark):
    from search_engine_spark.functions.evaluation import (SIGN_TEST_MAX_N,
                                                          paired_sign_test)
    n = SIGN_TEST_MAX_N + 1
    a = _ap_df(spark, [(f"q{i:02d}", 0.5 + i * 0.001) for i in range(n)])
    b = _ap_df(spark, [(f"q{i:02d}", 0.4) for i in range(n)])
    with pytest.raises(ValueError, match="paired_sign_test_mc"):
        paired_sign_test(a, b)


def test_sign_test_mc_consistent_wins(spark):
    from search_engine_spark.functions.evaluation import paired_sign_test_mc
    # A beats B on all 24 queries by ≥0.05: very few sampled sign
    # patterns reach |mean_obs|, so p must be small; deterministic
    # given (seed, n_samples)
    a = _ap_df(spark, [(f"q{i:02d}", 0.5 + i * 0.001) for i in range(24)])
    b = _ap_df(spark, [(f"q{i:02d}", 0.4) for i in range(24)])
    r = paired_sign_test_mc(a, b, n_samples=512, seed="t1").collect()[0]
    assert r.n_queries == 24 and r.n_samples == 512
    assert r.mean_diff > 0.1
    assert r.p_value <= 3.0 / 513  # identity-ish patterns only
    r2 = paired_sign_test_mc(a, b, n_samples=512, seed="t1").collect()[0]
    assert r2.p_value == r.p_value  # bit-reproducible, no host RNG


def test_sign_test_mc_identical_runs(spark):
    from search_engine_spark.functions.evaluation import paired_sign_test_mc
    a = _ap_df(spark, [(f"q{i:02d}", 0.3 + i * 0.01) for i in range(22)])
    r = paired_sign_test_mc(a, a, n_samples=256).collect()[0]
    assert r.mean_diff == 0.0 and r.p_value == 1.0


# ------------------------------------------------- bpref / R-prec / GMAP

def _run_df(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id long, rank int")


def _pairs_df(spark, rows):
    return spark.createDataFrame(rows, "qid string, doc_id long")


def test_bpref_textbook(spark):
    from search_engine_spark.functions.evaluation import bpref
    # run: d1(rel) d2(non) d3(rel) d4(unjudged) d5(non); R=3 (d6 not
    # retrieved), N=2, min(R,N)=2
    run = _run_df(spark, [("q1", i, i) for i in range(1, 6)])
    rel = _pairs_df(spark, [("q1", 1), ("q1", 3), ("q1", 6)])
    non = _pairs_df(spark, [("q1", 2), ("q1", 5)])
    r = bpref(run, rel, non).collect()[0]
    # d1: 0 non above -> 1; d3: 1 non above -> 1 - 1/2; d6: not
    # retrieved -> 0; bpref = (1 + 0.5)/3
    assert r.n_rel == 3 and r.n_nonrel == 2
    assert r.bpref == pytest.approx(0.5, abs=1e-9)


def test_bpref_no_nonrelevant_judgments(spark):
    from search_engine_spark.functions.evaluation import bpref
    run = _run_df(spark, [("q1", 1, 1), ("q1", 2, 2)])
    rel = _pairs_df(spark, [("q1", 1), ("q1", 2), ("q1", 9)])
    non = _pairs_df(spark, [])
    r = bpref(run, rel, non.selectExpr("cast(null as string) qid",
                                       "cast(null as long) doc_id")
              .where("qid is not null")).collect()[0]
    # min(R,N)=0: each retrieved relevant contributes 1 -> 2/3
    assert r.bpref == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_r_precision(spark):
    from search_engine_spark.functions.evaluation import r_precision
    # R=2; top-2 of the run holds exactly one relevant doc
    run = _run_df(spark, [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)])
    rel = _pairs_df(spark, [("q1", 1), ("q1", 3)])
    r = r_precision(run, rel).collect()[0]
    assert r.n_rel == 2 and r.rprec == pytest.approx(0.5, abs=1e-9)


def test_gmap_floor_and_geometry(spark):
    from search_engine_spark.functions.evaluation import gmap
    import math
    # q1 AP=1.0 (1 rel, retrieved at rank 1), q2 AP=0 (nothing found)
    run = _run_df(spark, [("q1", 1, 1), ("q2", 9, 1)])
    rel = _pairs_df(spark, [("q1", 1), ("q2", 2)])
    r = gmap(run, rel).collect()[0]
    assert r.n_queries == 2
    assert r.gmap == pytest.approx(math.sqrt(1.0 * 1e-5), abs=1e-6)


def test_iprec_at_recall_golden(spark):
    """11-point interpolated PR curve, hand-computed: qrels {1,3,5}
    (n_rel=3), run hits rel docs at ranks 1 (P=1, R=1/3) and 3
    (P=2/3, R=2/3) → iprec is 1.0 for levels 0.0-0.3, 2/3 for
    0.4-0.6, and 0 beyond the achieved recall."""
    from search_engine_spark.functions.evaluation import iprec_at_recall
    results = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q1", 4, 4),
         ("q1", 6, 5)],
        "qid string, doc_id long, rank int")
    qrels = spark.createDataFrame(
        [("q1", 1), ("q1", 3), ("q1", 5)], "qid string, doc_id long")
    got = {r.level: r.iprec for r in
           iprec_at_recall(results, qrels).collect()}
    assert len(got) == 11
    for lv in (0, 1, 2, 3):
        assert got[lv] == pytest.approx(1.0)
    for lv in (4, 5, 6):
        assert got[lv] == pytest.approx(0.666667, abs=1e-6)
    for lv in (7, 8, 9, 10):
        assert got[lv] == 0.0
