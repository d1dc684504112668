"""Pseudo-relevance feedback vs a pure-Python oracle on the seeded
tiny corpus: expansion-term mining (Rocchio idf * sum(tf/dl) weights,
original-term exclusion, pinned tie order) and the second-pass
interpolated BM25."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from search_engine_spark.conf import PRF_BETA
from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.feedback import (bm25_prf_topk,
                                                    prf_expansion_terms)
from search_engine_spark.operators.index_build import (corpus_stats,
                                                       doc_stats, term_stats)
from search_engine_spark.operators.query import query_terms_df
from tests.oracle import OracleIndex, round_half_up

QUERIES = [
    ("q1", "a se moc"),
    ("q2", "jsem jsem ten"),
    ("q3", "hodne zzznothing"),
    ("q4", "zzznothing"),       # no first-pass docs -> no expansion
    ("q5", "a"),
]
FB_DOCS, FB_TERMS = 5, 3


def _oracle_expansion(oracle: OracleIndex, title: str):
    """[(term, w, rank)] — mirrors prf_expansion_terms semantics."""
    fb = [d for d, _, _ in oracle.bm25_topk(title, k=FB_DOCS)]
    qset = set(tokenize_py(title))
    s: dict[str, float] = defaultdict(float)
    for d in fb:
        for term, tf in oracle.tf[d].items():
            s[term] += tf / oracle.dl[d]
    cand = [(t, round_half_up(oracle.idf(t) * v))
            for t, v in s.items() if t not in qset]
    cand.sort(key=lambda it: (-it[1], it[0]))
    return [(t, w, i + 1) for i, (t, w) in enumerate(cand[:FB_TERMS])]


@pytest.fixture(scope="module")
def prf_built(spark, tiny_corpus):
    tw, rows = tiny_corpus
    tc = term_counts(tw).cache()
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    cs = corpus_stats(tw, ds)
    return tc, ds, ts_, cs, OracleIndex(rows)


def test_prf_expansion_terms_match_oracle(spark, prf_built):
    tc, ds, ts_, cs, oracle = prf_built
    q = query_terms_df(spark, QUERIES)
    res = prf_expansion_terms(tc, ds, ts_, q, cs["N"], cs["avgdl"],
                              fb_docs=FB_DOCS, fb_terms=FB_TERMS)
    got: dict[str, list] = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r.qid, []).append((r.term, r.w, r.rank))
    for qid, title in QUERIES:
        exp = _oracle_expansion(oracle, title)
        g = got.get(qid, [])
        assert [(t, r) for t, _, r in g] == [(t, r) for t, _, r in exp], qid
        for (gt, gw, _), (_, ew, _) in zip(g, exp):
            assert math.isclose(gw, ew, abs_tol=1e-6), f"{qid} term {gt}"
    assert "q4" not in got  # no feedback docs, no expansion


def test_prf_topk_matches_oracle(spark, prf_built):
    tc, ds, ts_, cs, oracle = prf_built
    q = query_terms_df(spark, QUERIES)
    res = bm25_prf_topk(tc, ds, ts_, q, cs["N"], cs["avgdl"],
                        fb_docs=FB_DOCS, fb_terms=FB_TERMS, k=10)
    got: dict[str, list] = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r.qid, []).append((r.doc_id, r.rank, r.score))
    k1, b = 1.2, 0.75
    for qid, title in QUERIES:
        exp_terms = _oracle_expansion(oracle, title)
        weights: dict[str, float] = defaultdict(float)
        for term, qtf in Counter(tokenize_py(title)).items():
            weights[term] += float(qtf)
        if exp_terms:
            maxw = max(w for _, w, _ in exp_terms)
            for term, w, _ in exp_terms:
                weights[term] += PRF_BETA * w / maxw
        scores: dict[int, float] = defaultdict(float)
        for term, qw in sorted(weights.items()):
            idf = oracle.idf(term)
            for doc_id, tf in oracle.postings.get(term, []):
                dl_norm = 1.0 - b + b * oracle.dl[doc_id] / oracle.avgdl
                sat = tf * (k1 + 1.0) / (tf + k1 * dl_norm)
                scores[doc_id] += qw * idf * sat
        exp = sorted(((d, round_half_up(s)) for d, s in scores.items()),
                     key=lambda it: (-it[1], it[0]))[:10]
        g = got.get(qid, [])
        assert [(d, r) for d, r, _ in g] == \
            [(d, i + 1) for i, (d, _) in enumerate(exp)], qid
        for (gd, _, gs), (_, es) in zip(g, exp):
            assert math.isclose(gs, es, abs_tol=1e-6), f"{qid} doc {gd}"
