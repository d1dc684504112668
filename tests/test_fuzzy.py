"""Fuzzy term lookup vs a brute-force Levenshtein oracle on the
seeded tiny corpus: the SymSpell deletion-neighborhood blocking must
be lossless at max_dist=1 (every true candidate proposed, the verify
step kills every false one), and fuzzy BM25 must equal the Python
expand-weight-score oracle."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from search_engine_spark.conf import FUZZY_DECAY
from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.fuzzy import (fuzzy_bm25_topk,
                                                 fuzzy_query_terms_df,
                                                 fuzzy_term_candidates)
from search_engine_spark.operators.index_build import (corpus_stats,
                                                       doc_stats, term_stats)
from tests.oracle import OracleIndex, round_half_up


def _lev(a: str, b: str) -> int:
    """Plain dynamic-programming Levenshtein (insert/delete/substitute)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def fuzzy_built(spark, tiny_corpus):
    tw, rows = tiny_corpus
    tc = term_counts(tw).cache()
    ts_ = term_stats(tc).cache()
    vocab = {r.term: r.df for r in ts_.collect()}
    return tw, rows, tc, ts_, vocab


def _mk_queries(vocab: dict[str, int]) -> list[tuple[str, str]]:
    """Deterministic misspellings exercising every edit kind: for a
    sample of vocabulary terms, one deletion, one substitution, one
    insertion, the exact term, plus a guaranteed miss and a
    single-character probe (empty-variant path)."""
    sample = sorted(vocab)[:12]
    queries: list[tuple[str, str]] = []
    for i, t in enumerate(sample):
        msp = [t[1:],                       # leading deletion
               "q" + t[1:],                 # leading substitution
               "x" + t,                     # leading insertion
               t]                           # exact
        queries.append((f"f{i:03d}", " ".join(msp)))
    queries.append(("fmiss", "zzzzzzzz"))
    queries.append(("fone", "q"))
    return queries


def test_fuzzy_candidates_equal_bruteforce(spark, fuzzy_built):
    _, _, _, ts_, vocab = fuzzy_built
    queries = _mk_queries(vocab)
    fq = fuzzy_query_terms_df(spark, queries)
    got = {(r.qid, r.qterm, r.term): (r.dist, r.df)
           for r in fuzzy_term_candidates(ts_, fq, max_dist=1).collect()}
    exp = {}
    for qid, title in queries:
        for qterm in set(tokenize_py(title)):
            for term, df in vocab.items():
                d = _lev(qterm, term)
                if d <= 1:
                    exp[(qid, qterm, term)] = (d, df)
    assert got == exp
    assert not any(qid == "fmiss" for qid, _, _ in got)


def test_fuzzy_topk_matches_python_oracle(spark, fuzzy_built):
    tw, rows, tc, ts_, vocab = fuzzy_built
    ds = doc_stats(tc)
    cs = corpus_stats(tw, ds)
    oracle = OracleIndex(rows)
    queries = _mk_queries(vocab)
    fq = fuzzy_query_terms_df(spark, queries)
    res = fuzzy_bm25_topk(tc, ds, ts_, fq, cs["N"], cs["avgdl"],
                          max_dist=1, k=10)
    got: dict[str, list] = {}
    for r in res.orderBy("qid", "rank").collect():
        got.setdefault(r.qid, []).append((r.doc_id, r.rank, r.score))
    k1, b = 1.2, 0.75
    for qid, title in queries:
        # expand: per dictionary term, summed decayed weight
        from collections import Counter
        w: dict[str, float] = defaultdict(float)
        for qterm, qtf in Counter(tokenize_py(title)).items():
            for term in vocab:
                d = _lev(qterm, term)
                if d <= 1:
                    w[term] += qtf * FUZZY_DECAY ** d
        scores: dict[int, float] = defaultdict(float)
        for term, wt in sorted(w.items()):
            idf = oracle.idf(term)
            for doc_id, tf in oracle.postings.get(term, []):
                dl_norm = 1.0 - b + b * oracle.dl[doc_id] / oracle.avgdl
                sat = tf * (k1 + 1.0) / (tf + k1 * dl_norm)
                scores[doc_id] += wt * idf * sat
        exp = sorted(((d, round_half_up(s)) for d, s in scores.items()),
                     key=lambda it: (-it[1], it[0]))[:10]
        g = got.get(qid, [])
        assert [(d, r) for d, r, _ in g] == \
            [(d, i + 1) for i, (d, _) in enumerate(exp)], qid
        for (gd, _, gs), (_, es) in zip(g, exp):
            assert math.isclose(gs, es, abs_tol=1e-6), f"{qid} doc {gd}"


def test_prefix_window_caps_fanout_but_finds_long_matches(spark):
    """Ultra-long tokens generate variants only from their first
    FUZZY_PREFIX_WINDOW chars (bounded fan-out), yet a distance-1 pair
    differing BEYOND the window still matches: both sides truncate, so
    the shared prefix collides and the exact verify scores the full
    strings."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.fuzzy import (FUZZY_PREFIX_WINDOW,
                                                     _explode_neighborhood,
                                                     fuzzy_term_candidates)

    long_a = "x" * 30 + "abcdefghij"          # 40 chars
    long_b = "x" * 30 + "abcdefghiz"          # differs at position 40
    tstats = spark.createDataFrame([(long_a, 3)], "term string, df long")
    fq = spark.createDataFrame([("q1", long_b, 1)],
                               "qid string, qterm string, qtf int")
    got = fuzzy_term_candidates(tstats, fq, max_dist=1).collect()
    assert [(r.term, r.dist) for r in got] == [(long_a, 1)]
    # fan-out bound: variants per string <= window + 1, not len + 1
    nv = (_explode_neighborhood(tstats.select("term"), "term", 1)
          .count())
    assert nv <= FUZZY_PREFIX_WINDOW + 1


def test_suggest_terms_argmin_and_ties(spark):
    """Best correction = argmin (dist, -df, term); exact hits suggest
    themselves at dist 0; OOV-beyond-distance terms yield no row; df
    breaks distance ties, term breaks df ties."""
    from search_engine_spark.operators.fuzzy import suggest_terms

    tstats = spark.createDataFrame(
        [("spark", 100), ("spars", 40), ("sparo", 40),
         ("join", 7), ("junk", 1)],
        "term string, df long")
    fq = spark.createDataFrame(
        [("q1", "spark", 1),   # exact -> itself, dist 0
         ("q1", "sparq", 1),   # dist-1 ties spark(100)/spars/sparo -> spark
         ("q2", "sparj", 1),   # dist-1 ties spars(40)/sparo(40) + spark(100)
         ("q2", "zzzzzzzz", 1)],  # nothing within distance
        "qid string, qterm string, qtf int")
    got = {(r.qid, r.qterm): (r.suggestion, r.dist, r.df)
           for r in suggest_terms(tstats, fq, max_dist=1).collect()}
    assert got[("q1", "spark")] == ("spark", 0, 100)
    assert got[("q1", "sparq")] == ("spark", 1, 100)
    assert got[("q2", "sparj")] == ("spark", 1, 100)
    assert ("q2", "zzzzzzzz") not in got
    assert len(got) == 3
