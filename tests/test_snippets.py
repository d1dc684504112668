"""KWIC snippet extraction vs a brute-force window-scan oracle on the
seeded tiny corpus: the banded window scoring must pick exactly the
occurrence-anchored window with the most query-term hits (tie:
earliest start), and the rendered snippet must be the literal token
slice."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.tokenize import term_counts, tokenize_py
from search_engine_spark.operators.index_build import (corpus_stats,
                                                       doc_stats, term_stats)
from search_engine_spark.operators.positional import positional_postings
from search_engine_spark.operators.query import query_terms_df
from search_engine_spark.operators.snippets import snippet_topk
from tests.oracle import OracleIndex, round_half_up

QUERIES = [
    ("s1", "a se moc"),
    ("s2", "jsem jsem ten"),
    ("s3", "a"),
    ("s4", "hodne zzznothing"),
]
W = 6


def _oracle_snippet(text: str, qterms: set[str], w: int):
    """(start, n_hits, snippet) by scanning every occurrence-anchored
    window; None if the doc has no query-term occurrence."""
    toks = tokenize_py(text)
    occ = [i + 1 for i, t in enumerate(toks) if t in qterms]
    if not occ:
        return None
    best = None
    for p in occ:
        n = sum(1 for o in occ if p <= o <= p + w - 1)
        cand = (-n, p)
        if best is None or cand < best:
            best = cand
    n_hits, start = -best[0], best[1]
    return start, n_hits, " ".join(toks[start - 1:start - 1 + w])


@pytest.mark.parametrize("k", [5, 10])
def test_snippets_match_bruteforce(spark, tiny_corpus, k):
    tw, rows = tiny_corpus
    tc = term_counts(tw).cache()
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    cs = corpus_stats(tw, ds)
    pos_idx = positional_postings(tw)
    oracle = OracleIndex(rows)
    q = query_terms_df(spark, QUERIES)
    res = snippet_topk(tw, tc, ds, ts_, pos_idx, q,
                       cs["N"], cs["avgdl"], window=W, k=k)
    got = {(r.qid, r.doc_id): (r.rank, r.start, r.n_hits, r.snippet)
           for r in res.collect()}
    texts = dict(rows)
    n_expected = 0
    for qid, title in QUERIES:
        qset = set(tokenize_py(title))
        for doc_id, rank, _ in oracle.bm25_topk(title, k=k):
            exp = _oracle_snippet(texts[doc_id], qset, W)
            assert exp is not None  # a ranked doc always has a hit
            n_expected += 1
            assert got[(qid, doc_id)] == (rank, *exp), (qid, doc_id)
    assert len(got) == n_expected
