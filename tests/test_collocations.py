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


def test_term_associations_and_doc_keywords(spark):
    import math

    from search_engine_spark.functions.tokenize import term_counts_sql
    from search_engine_spark.operators.collocations import term_associations
    from search_engine_spark.operators.index_build import term_stats
    from search_engine_spark.operators.textstats import doc_keywords
    docs = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat dog"), (3, "cat bird"), (4, "fish")],
        "doc_id long, text string")
    tc = term_counts_sql(docs)
    ts = term_stats(tc)
    got = {(r.ta, r.tb): (r.codf, r.score)
           for r in term_associations(tc, ts, min_codf=2).collect()}
    # only (cat,dog) co-occurs twice; df(cat)=3, df(dog)=2
    assert set(got) == {("cat", "dog")}
    assert got[("cat", "dog")][0] == 2
    assert math.isclose(got[("cat", "dog")][1],
                        round(2 / math.sqrt(3 * 2), 6), abs_tol=1e-6)
    # hot-term guard drops "cat" (df 3/4 > 0.5) before the self-join
    guarded = term_associations(tc, ts, min_codf=1, max_df_frac=0.5,
                                n_docs=4).collect()
    assert all("cat" not in (r.ta, r.tb) for r in guarded)

    kw = {(r.doc_id, r.rank): (r.term, r.score)
          for r in doc_keywords(tc, ts, 4, k=2).collect()}
    # doc 4: "fish" df=1 → idf ln(4) — its only and top keyword
    assert kw[(4, 1)][0] == "fish"
    assert math.isclose(kw[(4, 1)][1], round(math.log(4.0), 6),
                        abs_tol=1e-6)
    # doc 3: bird (idf ln 4) beats cat (idf ln 4/3)
    assert kw[(3, 1)][0] == "bird" and kw[(3, 2)][0] == "cat"
    assert (1, 3) not in kw  # k=2 caps per-doc output


def test_segment_queries_golden(spark):
    """Crafted corpus: 'new york' is a strong collocation, 'red car'
    never co-occurs adjacently -> the query 'new york red car' splits
    exactly between york and red; floor and tau boundaries covered."""
    from search_engine_spark.operators.collocations import (collocations,
                                                            segment_queries)
    docs = ([(i, "new york " * 3 + "apple") for i in range(2)]
            + [(2 + i, "red apple car blue red apple car blue")
               for i in range(2)])
    d = spark.createDataFrame(docs, "doc_id long, text string")
    colloc = collocations(d, min_count=2).select("t1", "t2", "pmi")
    qp = spark.createDataFrame(
        [("q1", 0, "new"), ("q1", 1, "york"), ("q1", 2, "red"), ("q1", 3, "car"),
         ("q2", 0, "oov"), ("q2", 1, "new")],
        "qid string, off int, term string")
    out = {(r.qid, r.seg_idx): (r.segment, r.n_terms)
           for r in segment_queries(qp, colloc, tau=0.05).collect()}
    assert out[("q1", 0)] == ("new york", 2)      # high-PMI pair merges
    assert out[("q1", 1)][0] == "red"             # red->car never adjacent: break
    assert out[("q1", 2)][0] == "car"
    assert out[("q2", 0)] == ("oov", 1)           # OOV always breaks
    assert out[("q2", 1)] == ("new", 1)
