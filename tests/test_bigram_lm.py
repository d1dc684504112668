from __future__ import annotations

import math
import sys
import os
from collections import Counter

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from search_engine_spark.operators.index_build import term_stats
from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.textstats import bigram_perplexity

LAM = 0.75


def _expected(docs: dict[int, str]) -> dict[int, tuple[int, float, float]]:
    toks = {d: t.split() for d, t in docs.items()}
    c1 = Counter(w for t in toks.values() for w in t)
    c2 = Counter((t[i], t[i + 1]) for t in toks.values()
                 for i in range(len(t) - 1))
    clen = sum(c1.values())
    out = {}
    for d, t in toks.items():
        pairs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        if not pairs:
            continue
        nll = sum(-math.log(LAM * (c2[p] / c1[p[0]])
                            + (1 - LAM) * (c1[p[1]] / clen)) for p in pairs)
        avg = nll / len(pairs)
        out[d] = (len(pairs), round(avg, 6), round(math.exp(avg), 6))
    return out


def test_bigram_perplexity_golden(spark):
    docs = {
        0: "new york new york city",
        1: "new york is a big city",
        2: "york new city big a",     # same unigrams, damaged order
        3: "single",                  # no bigrams -> absent
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    tc = term_counts_sql(df)
    ts = term_stats(tc)
    clen = sum(r.cf for r in ts.collect())
    got = {r.doc_id: (r.n_bigrams, r.avg_nll, r.ppl)
           for r in bigram_perplexity(df, ts, clen).collect()}
    exp = _expected(docs)
    assert set(got) == set(exp)          # doc 3 absent from both
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert abs(got[d][1] - exp[d][1]) <= 1e-6
        assert abs(got[d][2] - exp[d][2]) <= 1e-5
    # word-order sensitivity: the scrambled doc is more surprising than
    # the natural one even though its unigram profile is similar
    assert got[2][1] > got[1][1]


def test_batch_drift_golden(spark):
    """Batch 0 matches the corpus blend, batch 1 is pure 'zzz' -> its
    observed-vocab KL is far higher and 'zzz' is its top contributor.
    Values checked against a hand-rolled replica of the formula."""
    from search_engine_spark.operators.textstats import batch_drift
    from pyspark.sql import functions as F
    docs = [(0, "a b c a b"), (1, "a c b b a"),
            (100, "zzz zzz zzz zzz"), (101, "zzz zzz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tc = term_counts_sql(df)
    ts = term_stats(tc)
    clen = sum(r.cf for r in ts.collect())
    out = {r.batch: r for r in
           batch_drift(tc, F.expr("doc_id div 100"), ts, clen).collect()}
    # replica
    from collections import Counter, defaultdict
    toks = {d: t.split() for d, t in docs}
    cf = Counter(w for t in toks.values() for w in t)
    batches = defaultdict(list)
    for d, t in toks.items():
        batches[d // 100].extend(t)
    for b, words in batches.items():
        n = len(words)
        per = Counter(words)
        kl = sum((c / n) * math.log((c / n) / (cf[w] / clen))
                 for w, c in per.items())
        assert out[b].n_tokens == n
        assert abs(out[b].kl - round(kl, 6)) <= 1e-6
    assert out[1].kl > out[0].kl
    assert out[1].top_term == "zzz"
