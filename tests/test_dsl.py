"""Boolean query-DSL: parser shapes/errors, positive-term extraction,
and end-to-end matching + ranking on a micro corpus."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.dsl import (DslError, dsl_matches,
                                               dsl_positive_terms, dsl_topk,
                                               parse_dsl)


def test_parse_precedence_and_assoc():
    # OR binds loosest; AND/NOT left-associative at equal precedence
    assert parse_dsl("a AND b OR c") == \
        ("or", ("and", ("term", "a"), ("term", "b")), ("term", "c"))
    assert parse_dsl("a NOT b AND c") == \
        ("and", ("not", ("term", "a"), ("term", "b")), ("term", "c"))
    assert parse_dsl("a AND (b OR c)") == \
        ("and", ("term", "a"), ("or", ("term", "b"), ("term", "c")))
    assert parse_dsl('"x y" NOT z') == \
        ("not", ("phrase", ["x", "y"]), ("term", "z"))
    # one-word phrase degenerates to a term; words fold via tokenizer
    assert parse_dsl('"Hello"') == ("term", "hello")


@pytest.mark.parametrize("bad", ["a AND", "(a OR b", "a b)", 'a ""',
                                 "AND a", "a OR OR b"])
def test_parse_errors(bad):
    with pytest.raises(DslError):
        parse_dsl(bad)


def test_positive_terms_exclude_not_arm():
    c = dsl_positive_terms(parse_dsl('a AND ("b c" OR a) NOT (d OR e)'))
    assert c == {"a": 2, "b": 1, "c": 1}


@pytest.fixture(scope="module")
def micro(spark):
    from search_engine_spark.functions.tokenize import term_counts
    from search_engine_spark.operators.index_build import doc_stats, term_stats
    from search_engine_spark.operators.positional import positional_postings
    tw = spark.createDataFrame(
        [(0, "red fish blue fish"),
         (1, "red cat"),
         (2, "blue dog red"),
         (3, "fish blue red"),
         (4, "green bird")],
        "doc_id long, text string")
    tc = term_counts(tw)
    return tw, tc, doc_stats(tc), term_stats(tc), positional_postings(tw)


def test_dsl_matches_golden(spark, micro):
    tw, tc, ds, ts_, pos = micro
    queries = [
        ("m1", "red AND blue"),            # docs 0, 2, 3
        ("m2", "red NOT fish"),            # docs 1, 2
        ("m3", '"blue fish"'),             # doc 0 only (positional)
        ("m4", '"red fish" OR cat'),       # docs 0 (phrase), 1 (cat)
        ("m5", "(green OR cat) NOT bird"), # doc 1
    ]
    got = {(r.qid, r.doc_id) for r in
           dsl_matches(spark, tc, pos, queries).collect()}
    assert got == {("m1", 0), ("m1", 2), ("m1", 3),
                   ("m2", 1), ("m2", 2),
                   ("m3", 0),
                   ("m4", 0), ("m4", 1),
                   ("m5", 1)}


def test_dsl_topk_scores_positive_terms_only(spark, micro):
    from search_engine_spark.operators.query import bm25_topk, query_terms_df
    tw, tc, ds, ts_, pos = micro
    n_docs, avgdl = 5, (4 + 2 + 3 + 3 + 2) / 5.0
    got = {r.doc_id: r.score for r in
           dsl_topk(spark, tc, ds, ts_, pos, [("m2", "red NOT fish")],
                    n_docs, avgdl, k=10).collect()}
    # the excluded term contributes nothing: scores equal plain BM25
    # of "red" on the surviving docs
    ref = {r.doc_id: r.score for r in
           bm25_topk(tc, ds, ts_, query_terms_df(spark, [("m2", "red")]),
                     n_docs, avgdl, k=10).collect()}
    assert set(got) == {1, 2}
    for d in got:
        assert got[d] == ref[d]
