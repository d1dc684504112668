"""Tokenization — the P1/P2/P3 operators of SURVEY.md §2.2.

Reference semantics (/root/reference/src/invertedIndex.py:40-69):
regex token extraction + lowercase (P2, :66); stopword filter present
but disabled (P3, :65). Our input is plain prose, so the frozen
contract is: lower(text) → findall(conf.TOKEN_RE) → optional stopword
drop.

Three byte-identical implementations:

- ``tokens_col``      — pure Spark SQL expression (JVM, whole-stage
                        codegen; used by the oracle-checked queries).
- ``term_counts``     — vectorized Arrow path: mapInPandas that
                        tokenizes AND counts per document in one pass,
                        emitting (doc_id, term, tf). This skips the
                        explode→groupBy(doc_id,term) shuffle entirely
                        (per-doc counting is partition-local), which is
                        the hot build path at 10^12-turn scale.
- ``tokenize_py``     — plain Python, shared by the pytest oracle.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..conf import TOKEN_RE, FILTER_STOPWORDS_DEFAULT, load_stopwords

_TOKEN_PAT = re.compile(TOKEN_RE)

TERM_COUNTS_SCHEMA = "doc_id long, term string, tf int"


def tokenize_py(text: str | None, filter_stopwords: bool = FILTER_STOPWORDS_DEFAULT,
                _stop: frozenset[str] | None = None) -> list[str]:
    """Oracle tokenizer — single source of truth in Python."""
    if not text:
        return []
    toks = _TOKEN_PAT.findall(text.lower())
    if filter_stopwords:
        stop = _stop if _stop is not None else load_stopwords()
        toks = [t for t in toks if t not in stop]
    return toks


def tokens_col(col: Column | str, filter_stopwords: bool = FILTER_STOPWORDS_DEFAULT) -> Column:
    """array<string> of tokens as a pure JVM expression (codegen'd).

    Equivalent DuckDB SQL: regexp_extract_all(lower(text), TOKEN_RE).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.coalesce(F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0),
                      F.array().cast("array<string>"))  # NULL text → [] (parity with tokenize_py)
    if filter_stopwords:
        # lambda filter (not array_except, which would dedup duplicates)
        toks = F.filter(toks, lambda t: ~t.isin(*sorted(load_stopwords())))
    return toks


def term_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                filter_stopwords: bool = FILTER_STOPWORDS_DEFAULT) -> DataFrame:
    """(doc_id, term, tf) via one Arrow-batched pass (A1 of SURVEY §2.3).

    Reference analogue: Counter(parseWords(text)) per doc
    (src/invertedIndex.py:629-659). No shuffle: counting is local to
    the scan partition; downstream aggs shuffle the already-reduced
    (doc, term) pairs instead of raw token occurrences.
    """
    stop = load_stopwords() if filter_stopwords else None
    pat = _TOKEN_PAT

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            terms: list[str] = []
            tfs: list[int] = []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None or not isinstance(text, str):
                    continue
                toks = pat.findall(text.lower())
                if stop is not None:
                    toks = [t for t in toks if t not in stop]
                if not toks:
                    continue
                cnt = Counter(toks)
                ids.extend([did] * len(cnt))
                terms.extend(cnt.keys())
                tfs.extend(cnt.values())
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "term": pd.Series(terms, dtype="object"),
                                "tf": pd.Series(tfs, dtype="int32")})

    return df.select(id_col, text_col).mapInPandas(run, schema=TERM_COUNTS_SCHEMA)


def term_counts_sql(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                    filter_stopwords: bool = FILTER_STOPWORDS_DEFAULT) -> DataFrame:
    """Pure-DataFrame twin of term_counts (explode + groupBy).

    Used by oracle-gated queries so the plan is 100% JVM; the pandas
    path above is the scale path (identical output, property-tested).
    """
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  tokens_col(text_col,
                             filter_stopwords=filter_stopwords).alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )
