"""Query-likelihood (Dirichlet) ranking vs a pure-Python oracle on the
seeded tiny corpus, plus a hand-computed micro golden."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.index_build import doc_stats, term_stats
from search_engine_spark.operators.lm import lm_dirichlet_topk
from search_engine_spark.operators.query import query_terms_df
from tests.oracle import round_half_up

MU = 500.0


def _py_lm_topk(rows, query_set, mu, k):
    """Sparse Dirichlet QL oracle: same operation order as the
    operator (tf·C/(μ·cf), then qlen·ln(μ/(dl+μ)))."""
    tc: dict[tuple[int, str], int] = defaultdict(int)
    dl: dict[int, int] = defaultdict(int)
    cf: dict[str, int] = defaultdict(int)
    for doc_id, text in rows:
        for t in tokenize_py(text):
            tc[(doc_id, t)] += 1
            dl[doc_id] += 1
            cf[t] += 1
    c = float(sum(dl.values()))
    out = {}
    for qid, title in query_set:
        q = {t: f for t, f in Counter(tokenize_py(title)).items() if t in cf}
        if not q:
            out[qid] = []
            continue
        qlen = float(sum(q.values()))
        s: dict[int, float] = defaultdict(float)
        for t, qtf in q.items():
            for (d, tt), tf in tc.items():
                if tt == t:
                    s[d] += qtf * math.log(1.0 + tf * c / (mu * cf[t]))
        scored = [(round_half_up(v + qlen * math.log(mu / (dl[d] + mu)), 6), d)
                  for d, v in s.items()]
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = scored[:k]
    return out


def test_lm_matches_python_oracle(spark, tiny_corpus):
    tw, rows = tiny_corpus
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    total = sum(len(tokenize_py(t)) for _, t in rows)
    vocab = sorted({t for _, x in rows for t in tokenize_py(x)})
    query_set = [
        ("l001", f"{vocab[0]} {vocab[len(vocab) // 2]}"),
        ("l002", f"{vocab[1]} {vocab[1]}"),          # qtf > 1
        ("l003", f"zzzmiss {vocab[-1]}"),            # OOV beside a hit
        ("l004", " ".join(vocab[:4])),
    ]
    q = query_terms_df(spark, query_set)
    got = defaultdict(list)
    res = lm_dirichlet_topk(tc, ds, ts_, q, total, mu=MU, k=10)
    for r in res.orderBy("qid", "rank").collect():
        got[r.qid].append((r.score, r.doc_id))
    exp = _py_lm_topk(rows, query_set, MU, 10)
    for qid, want in exp.items():
        assert got.get(qid, []) == [(pytest.approx(s, abs=1e-9), d)
                                    for s, d in want], qid


def test_lm_golden_micro(spark):
    """2-doc corpus, hand-computable: C=5, docs: 'a a b' (dl 3),
    'b c' (dl 2); query 'a c'."""
    tw = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string")
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    q = query_terms_df(spark, [("g1", "a c")])
    got = {r.doc_id: (r.rank, r.score) for r in
           lm_dirichlet_topk(tc, ds, ts_, q, 5, mu=MU, k=10).collect()}
    # doc 0: matched a (tf 2, cf 2) → ln(1 + 2·5/(500·2)); qlen 2
    s0 = round_half_up(math.log(1.0 + 2 * 5.0 / (MU * 2))
                       + 2.0 * math.log(MU / (3 + MU)), 6)
    # doc 1: matched c (tf 1, cf 1) → ln(1 + 1·5/(500·1)); dl 2
    s1 = round_half_up(math.log(1.0 + 1 * 5.0 / (MU * 1))
                       + 2.0 * math.log(MU / (2 + MU)), 6)
    assert got[0][1] == pytest.approx(s0, abs=1e-9)
    assert got[1][1] == pytest.approx(s1, abs=1e-9)
    want_order = [d for _, d in sorted([(s0, 0), (s1, 1)],
                                       key=lambda x: (-x[0], x[1]))]
    got_order = sorted(got, key=lambda d: got[d][0])
    assert got_order == want_order


def test_lm_jm_golden_micro(spark):
    """JM smoothing, same 2-doc micro corpus: λ=0.5 → odds ratio 1;
    score(d) = Σ qtf·ln(1 + (tf·C)/(dl·cf))."""
    from search_engine_spark.operators.lm import lm_jm_topk
    tw = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string")
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    q = query_terms_df(spark, [("g1", "a c")])
    got = {r.doc_id: r.score for r in
           lm_jm_topk(tc, ds, ts_, q, 5, lam=0.5, k=10).collect()}
    # doc 0: matched a (tf 2, cf 2, dl 3) → ln(1 + 2·5/(3·2))
    s0 = round_half_up(math.log(1.0 + 1.0 * (2 * 5.0) / (3 * 2.0)), 6)
    # doc 1: matched c (tf 1, cf 1, dl 2) → ln(1 + 1·5/(2·1))
    s1 = round_half_up(math.log(1.0 + 1.0 * (1 * 5.0) / (2 * 1.0)), 6)
    assert got[0] == pytest.approx(s0, abs=1e-9)
    assert got[1] == pytest.approx(s1, abs=1e-9)


def test_lm_jm_python_oracle(spark, tiny_corpus):
    """JM vs a pure-Python sparse oracle on the seeded tiny corpus."""
    from search_engine_spark.operators.lm import lm_jm_topk
    tw, rows = tiny_corpus
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    total = sum(len(tokenize_py(t)) for _, t in rows)
    vocab = sorted({t for _, x in rows for t in tokenize_py(x)})
    query_set = [("j001", f"{vocab[0]} {vocab[len(vocab) // 2]}"),
                 ("j002", f"{vocab[1]} {vocab[1]}")]
    lam = 0.5
    ratio = (1.0 - lam) / lam
    tcd: dict[tuple[int, str], int] = defaultdict(int)
    dl: dict[int, int] = defaultdict(int)
    cf: dict[str, int] = defaultdict(int)
    for doc_id, text in rows:
        for t in tokenize_py(text):
            tcd[(doc_id, t)] += 1
            dl[doc_id] += 1
            cf[t] += 1
    exp = {}
    for qid, title in query_set:
        qq = {t: f for t, f in Counter(tokenize_py(title)).items() if t in cf}
        s: dict[int, float] = defaultdict(float)
        for t, qtf in qq.items():
            for (d, tt), tf in tcd.items():
                if tt == t:
                    s[d] += qtf * math.log(
                        1.0 + ratio * (tf * float(total)) / (dl[d] * cf[t]))
        scored = sorted([(round_half_up(v, 6), d) for d, v in s.items()],
                        key=lambda x: (-x[0], x[1]))[:10]
        exp[qid] = scored
    q = query_terms_df(spark, query_set)
    got = defaultdict(list)
    res = lm_jm_topk(tc, ds, ts_, q, total, lam=lam, k=10)
    for r in res.orderBy("qid", "rank").collect():
        got[r.qid].append((r.score, r.doc_id))
    for qid, want in exp.items():
        assert got.get(qid, []) == [(pytest.approx(s, abs=1e-9), d)
                                    for s, d in want], qid
