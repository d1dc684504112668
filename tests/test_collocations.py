"""Adjacent-bigram PMI collocations vs a brute-force Python oracle on
the seeded tiny corpus (frozen multiply order + round-6)."""

from __future__ import annotations

import math
from collections import Counter

from search_engine_spark.functions.tokenize import tokenize_py
from search_engine_spark.operators.collocations import collocations
from tests.oracle import round_half_up


def _oracle(rows, min_count):
    uc: Counter = Counter()
    bc: Counter = Counter()
    for _, text in rows:
        toks = tokenize_py(text)
        uc.update(toks)
        bc.update(zip(toks, toks[1:]))
    u = float(sum(uc.values()))
    t = float(sum(bc.values()))
    out = {}
    for (a, b), cab in bc.items():
        if cab >= min_count:
            out[(a, b)] = (cab, round_half_up(
                math.log((cab * u * u) / (t * uc[a] * uc[b]))))
    return out


def test_collocations_match_bruteforce(spark, tiny_corpus):
    tw, rows = tiny_corpus
    for min_count in (2, 5):
        got = {(r.t1, r.t2): (r.c_ab, r.pmi)
               for r in collocations(tw, min_count=min_count).collect()}
        exp = _oracle(rows, min_count)
        assert set(got) == set(exp)
        for pair in exp:
            assert got[pair][0] == exp[pair][0], pair
            assert math.isclose(got[pair][1], exp[pair][1],
                                abs_tol=1e-6), pair


def test_cooccurrence_edges_window(spark):
    from search_engine_spark.operators.collocations import (
        cooccurrence_edges, textrank_terms)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha beta")],
        "doc_id long, text string")
    got = {(r.ta, r.tb) for r in cooccurrence_edges(docs, window=2).collect()}
    # doc1 window-2 pairs: (alpha,beta) (alpha,gamma) (beta,gamma);
    # doc2 adds only repeats of (alpha,beta); self-pairs (beta,beta) drop
    assert got == {("alpha", "beta"), ("alpha", "gamma"),
                   ("beta", "gamma")}
    # triangle graph → all degrees equal → uniform PageRank 1/3
    pr = {r.term: r.pr for r in textrank_terms(docs, window=2).collect()}
    assert set(pr) == {"alpha", "beta", "gamma"}
    for v in pr.values():
        assert abs(v - 1.0 / 3.0) < 1e-6
