"""Prefix (trailing-wildcard) expansion + retrieval vs a pure-Python
oracle on the seeded tiny corpus: the substr-keyed equi-join must be
exactly the startswith set, the df-cap must keep the top-df terms
(tie: term asc), and a term reached via two prefixes of one query must
sum its qtf before BM25."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.index_build import doc_stats, term_stats
from search_engine_spark.operators.query import bm25_topk, query_terms_df
from search_engine_spark.operators.wildcard import (prefix_expansions,
                                                    prefix_query_df,
                                                    prefix_topk)


def _py_expand(vocab_df: dict[str, int], prefix_set, cap: int):
    """(qid → {term: qtf}) via brute-force startswith, capped."""
    out: dict[str, Counter] = defaultdict(Counter)
    for qid, title in prefix_set:
        for pfx, qtf in Counter(title.lower().split()).items():
            hits = sorted((t for t in vocab_df if t.startswith(pfx)),
                          key=lambda t: (-vocab_df[t], t))[:cap]
            for t in hits:
                out[qid][t] += qtf
    return out


def test_prefix_expansions_match_bruteforce(spark, tiny_corpus):
    tw, rows = tiny_corpus
    tc = term_counts(tw)
    ts_ = term_stats(tc)
    vocab = {r.term: r.df for r in ts_.collect()}
    some = sorted(vocab)
    prefix_set = [
        ("w1", some[0][:1]),                       # 1-char fanout
        ("w2", f"{some[1][:2]} {some[-1][:3]}"),   # two prefixes
        ("w3", some[2]),                           # exact word
        ("w4", "zzzzz"),                           # miss
        ("w5", f"{some[0][:1]} {some[0][:2]}"),    # overlapping prefixes
    ]
    cap = 3
    pq = prefix_query_df(spark, prefix_set)
    got = defaultdict(set)
    for r in prefix_expansions(ts_, pq, cap).collect():
        got[(r.qid, r.prefix)].add((r.term, r.df))
    exp = defaultdict(set)
    for qid, title in prefix_set:
        for pfx in set(title.lower().split()):
            hits = sorted((t for t in vocab if t.startswith(pfx)),
                          key=lambda t: (-vocab[t], t))[:cap]
            for t in hits:
                exp[(qid, pfx)].add((t, vocab[t]))
    assert got == exp


def test_prefix_topk_equals_expanded_bm25(spark, tiny_corpus):
    """prefix_topk ≡ plain bm25_topk fed the brute-force-expanded,
    qtf-summed term set (including the overlapping-prefix qtf sum)."""
    tw, rows = tiny_corpus
    tc = term_counts(tw).cache()
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    vocab = {r.term: r.df for r in ts_.collect()}
    n_docs = tw.count()
    avgdl = float(ds.agg(F.avg("dl")).collect()[0][0])
    some = sorted(vocab)
    prefix_set = [("w1", f"{some[0][:1]} {some[0][:2]}"),
                  ("w2", f"{some[3][:2]} zz")]
    cap = 3
    pq = prefix_query_df(spark, prefix_set)
    got = [(r.qid, r.doc_id, r.rank, r.score) for r in
           prefix_topk(tc, ds, ts_, pq, n_docs, avgdl, k=10,
                       max_expansions=cap).orderBy("qid", "rank").collect()]
    expanded = _py_expand(vocab, prefix_set, cap)
    eq_rows = [(qid, t, int(qtf)) for qid, terms in expanded.items()
               for t, qtf in sorted(terms.items())]
    eq = spark.createDataFrame(eq_rows, "qid string, term string, qtf int")
    want = [(r.qid, r.doc_id, r.rank, r.score) for r in
            bm25_topk(tc, ds, ts_, eq, n_docs, avgdl, k=10)
            .orderBy("qid", "rank").collect()]
    assert got == want


def test_regex_search_anchor_prefilter(spark):
    from search_engine_spark.functions.tokenize import term_counts_sql
    from search_engine_spark.operators.wildcard import regex_search
    docs = spark.createDataFrame(
        [(1, "spark join now"), (2, "spark  merge"), (3, "spark scan"),
         (4, "xspark join"), (5, "join spark")],
        "doc_id long, text string")
    got = {r.doc_id for r in regex_search(
        term_counts_sql(docs), docs, r"\bspark\s+(join|merge)",
        "spark").collect()}
    # 1: match; 2: multi-space \s+ match; 3: wrong verb; 4: token is
    # "xspark" (anchor absent AND \b blocks the regex); 5: wrong order
    assert got == {1, 2}


def test_suffix_expansions_match_bruteforce(spark, tiny_corpus):
    from search_engine_spark.operators.wildcard import (suffix_expansions,
                                                        suffix_query_df)
    tw, rows = tiny_corpus
    tc = term_counts(tw)
    ts_ = term_stats(tc)
    vocab = {r.term: r.df for r in ts_.collect()}
    some = sorted(vocab)
    suffix_set = [
        ("x1", some[0][-1:]),                        # 1-char fanout
        ("x2", f"{some[1][-2:]} {some[-1][-3:]}"),   # two suffixes
        ("x3", some[2]),                             # exact word
        ("x4", "zzzzz"),                             # miss
        ("x5", f"{some[0][-1:]} {some[0][-2:]}"),    # overlapping suffixes
    ]
    cap = 3
    sq = suffix_query_df(spark, suffix_set)
    got = defaultdict(set)
    for r in suffix_expansions(ts_, sq, cap).collect():
        got[(r.qid, r.suffix)].add((r.term, r.df))
    exp = defaultdict(set)
    for qid, title in suffix_set:
        for sfx in set(title.lower().split()):
            hits = sorted((t for t in vocab if t.endswith(sfx)),
                          key=lambda t: (-vocab[t], t))[:cap]
            for t in hits:
                exp[(qid, sfx)].add((t, vocab[t]))
    assert got == exp


def test_suffix_topk_matches_expanded_bm25(spark, tiny_corpus):
    from search_engine_spark.operators.wildcard import (suffix_query_df,
                                                        suffix_topk)
    tw, rows = tiny_corpus
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    n_docs = tw.count()
    avgdl = ds.agg(F.avg("dl")).collect()[0][0]
    vocab = {r.term: r.df for r in ts_.collect()}
    some = sorted(vocab)
    suffix_set = [("x1", f"{some[0][-1:]} {some[3][-2:]}")]
    cap = 3
    expanded = _py_expand_suffix(vocab, suffix_set, cap)
    eq_rows = [(qid, t, int(q)) for qid, c in expanded.items()
               for t, q in sorted(c.items())]
    eq = spark.createDataFrame(eq_rows, "qid string, term string, qtf int")
    want = {(r.qid, r.doc_id, r.rank, r.score)
            for r in bm25_topk(tc, ds, ts_, eq, n_docs, avgdl, k=10).collect()}
    sq = suffix_query_df(spark, suffix_set)
    got = {(r.qid, r.doc_id, r.rank, r.score)
           for r in suffix_topk(tc, ds, ts_, sq, n_docs, avgdl,
                                k=10, max_expansions=cap).collect()}
    assert got == want


def _py_expand_suffix(vocab_df: dict[str, int], suffix_set, cap: int):
    out: dict[str, Counter] = defaultdict(Counter)
    for qid, title in suffix_set:
        for sfx, qtf in Counter(title.lower().split()).items():
            hits = sorted((t for t in vocab_df if t.endswith(sfx)),
                          key=lambda t: (-vocab_df[t], t))[:cap]
            for t in hits:
                out[qid][t] += qtf
    return out


# ------------------------------------------------------------------ infix

def test_infix_kgram_candidates_and_postfilter(spark):
    from search_engine_spark.operators.wildcard import (infix_expansions,
                                                        infix_query_df)
    ts = spark.createDataFrame(
        [("filter", 10, 20), ("filler", 8, 16), ("flute", 5, 10),
         ("lite", 3, 6), ("abcb", 2, 4)],
        "term string, df long, cf long")
    iq = infix_query_df(spark, [("q1", "ilt"), ("q2", "bc")])
    got = {(r.qid, r.term) for r in infix_expansions(ts, iq).collect()}
    # 'ilt' matches filter only ('filler' has il+ll, 'lite' lacks il)
    assert ("q1", "filter") in got
    assert ("q1", "filler") not in got and ("q1", "lite") not in got
    assert ("q2", "abcb") in got


def test_infix_noncontiguous_bigrams_rejected(spark):
    # term contains BOTH bigrams of the infix but not contiguously:
    # the k-gram candidate must die in the contains post-filter
    from search_engine_spark.operators.wildcard import (infix_expansions,
                                                        infix_query_df)
    ts = spark.createDataFrame([("abxbc", 4, 8), ("xabcx", 4, 8)],
                               "term string, df long, cf long")
    iq = infix_query_df(spark, [("q1", "abc")])
    got = {r.term for r in infix_expansions(ts, iq).collect()}
    assert got == {"xabcx"}  # 'abxbc' has ab+bc but not 'abc'


def test_infix_single_char_fallback(spark):
    from search_engine_spark.operators.wildcard import (infix_expansions,
                                                        infix_query_df)
    ts = spark.createDataFrame([("cat", 3, 6), ("dog", 2, 4)],
                               "term string, df long, cf long")
    iq = infix_query_df(spark, [("q1", "o")])
    got = {r.term for r in infix_expansions(ts, iq).collect()}
    assert got == {"dog"}
