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
