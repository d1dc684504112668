"""Tokenizer contract tests (SURVEY.md §5.2): the three
implementations (Python oracle, Arrow mapInPandas, pure SQL) agree
byte-for-byte, including edge strings."""

from __future__ import annotations

import pytest

from search_engine_spark.functions.tokenize import (term_counts, term_counts_sql,
                                                    tokenize_py, tokens_col)
from search_engine_spark.conf import load_stopwords

EDGES = [
    "",
    "   ",
    None,
    "Hello WORLD hello",
    "a-b,c. x1__y 42 9lives",       # digit-leading and punct junk
    "Čaj sněžívka ťuk",              # non-ASCII letters are split/dropped by the ASCII contract
    "tok tok tok tok",               # tf>1
    "ve se a ten",                   # pure stopwords
]


def test_tokenize_py_edges():
    assert tokenize_py("") == []
    assert tokenize_py(None) == []
    assert tokenize_py("Hello WORLD hello") == ["hello", "world", "hello"]
    assert tokenize_py("a-b,c. 42 9lives") == ["a", "b", "c", "lives"]
    assert tokenize_py("x1__y") == ["x1", "y"]


def test_stopword_filter_flag():
    toks = tokenize_py("ve se a ten spark", filter_stopwords=True)
    assert toks == ["spark"]
    assert len(load_stopwords()) == 37


def test_sql_tokens_match_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGES)], "doc_id long, text string")
    got = {r.doc_id: list(r.toks) for r in df.select("doc_id", tokens_col("text").alias("toks")).collect()}
    for i, t in enumerate(EDGES):
        assert got[i] == tokenize_py(t), f"row {i}: {t!r}"


def test_arrow_term_counts_match_sql(spark, tiny_corpus):
    tw, _ = tiny_corpus
    a = set(map(tuple, term_counts(tw).collect()))
    b = set(map(tuple, term_counts_sql(tw).collect()))
    assert a == b and len(a) > 0
