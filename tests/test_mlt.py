"""More-like-this: ltc TF-IDF cosine top-k vs a brute-force numpy
oracle; the max_df hot-term guard only ever removes matching terms,
never changes norms."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.index_build import term_stats
from search_engine_spark.operators.mlt import more_like_this


def _brute(rows, seeds, k=5, max_df=None):
    """rows: [(doc_id, text)] → {(seed, doc): (rank, score)} oracle."""
    tcs = {d: Counter(tokenize_py(t)) for d, t in rows}
    df = Counter()
    for c in tcs.values():
        df.update(c.keys())
    n = float(len(rows))

    def w(tf, term):
        return (1.0 + math.log10(tf)) * math.log10(n / df[term])

    norms = {d: math.sqrt(sum(w(tf, t) ** 2 for t, tf in c.items()))
             for d, c in tcs.items()}
    out = defaultdict(list)
    for s in seeds:
        for d, c in tcs.items():
            if d == s:
                continue
            shared = set(c) & set(tcs[s])
            if max_df is not None:
                shared = {t for t in shared if df[t] <= max_df}
            dot = sum(w(c[t], t) * w(tcs[s][t], t) for t in shared)
            if not shared or norms[d] == 0 or norms[s] == 0:
                continue
            out[s].append((round(dot / (norms[d] * norms[s]), 6), d))
    res = {}
    for s, lst in out.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for r, (sc, d) in enumerate(lst[:k], 1):
            res[(s, d)] = (r, sc)
    return res


ROWS = [
    (0, "spark join window fast"),
    (1, "spark join window fast"),          # exact twin of 0
    (2, "spark join table"),
    (3, "window fast query query"),
    (4, "hash table batch"),
    (5, "spark spark spark join"),
    (6, "unrelated tokens entirely here"),
]


def test_mlt_matches_brute_force(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    tc = term_counts(docs)
    got = {(r.seed_id, r.doc_id): (r.rank, r.score)
           for r in more_like_this(tc, term_stats(tc), [0, 4],
                                   len(ROWS), k=5).collect()}
    assert got == _brute(ROWS, [0, 4], k=5)
    # the exact twin ranks first at cosine 1.0
    assert got[(0, 1)][0] == 1 and abs(got[(0, 1)][1] - 1.0) < 1e-6


def test_mlt_max_df_guard_drops_hot_terms_from_matching(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    tc = term_counts(docs)
    cap = 2
    got = {(r.seed_id, r.doc_id): (r.rank, r.score)
           for r in more_like_this(tc, term_stats(tc), [0], len(ROWS),
                                   k=5, max_df=cap).collect()}
    assert got == _brute(ROWS, [0], k=5, max_df=cap)
