"""S-stemmer (Harman 1991, "How effective is suffixing?") term
conflation.

The reference engine tokenizes morphologically-annotated "vertical
format" text and can index the LEMMA instead of the surface form
(/root/reference/src/invertedIndex.py:40-69) — lemmatization is its
term-conflation channel. Our input is plain prose, so the equivalent
frozen contract is the classic S-stemmer: three ordered suffix rules,
first match wins,

    1. -ies → -y   unless the word ends in -eies / -aies
    2. -es  → -e   unless the word ends in -aes / -ees / -oes
    3. -s   → ε    unless the word ends in -us / -ss

It is a pure regular-expression rewrite, so all three engines (Spark
Java regex, DuckDB RE2, Python re) execute the byte-identical
contract JVM-side / vectorized — no UDF anywhere. At 100 TB the stem
is one extra projection on the tokenize map stage; the re-count after
conflation reuses the same (doc_id, term) groupBy shuffle the
unstemmed build already pays, so the stemmed index costs no extra
shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (guard-pattern, suffix-pattern, replacement) — first match wins.
S_STEM_RULES: tuple[tuple[str, str, str], ...] = (
    ("[^ea]ies$", "ies$", "y"),
    ("[^aeo]es$", "es$", "e"),
    ("[^us]s$", "s$", ""),
)


def s_stem(term: Column) -> Column:
    """The S-stemmer as a JVM-side expression chain."""
    out = None
    for guard, suf, repl in S_STEM_RULES:
        branch = F.regexp_replace(term, suf, repl)
        out = (F.when(term.rlike(guard), branch) if out is None
               else out.when(term.rlike(guard), branch))
    return out.otherwise(term)


def s_stem_py(term: str) -> str:
    """Python twin of s_stem (query-side stemming + oracle VALUES)."""
    for guard, suf, repl in S_STEM_RULES:
        if re.search(guard, term):
            return re.sub(suf, repl, term)
    return term


def s_stem_sql(col: str = "term") -> str:
    """DuckDB twin of s_stem as a SQL CASE expression."""
    arms = " ".join(
        f"WHEN regexp_matches({col}, '{guard}') "
        f"THEN regexp_replace({col}, '{suf}', '{repl}')"
        for guard, suf, repl in S_STEM_RULES)
    return f"CASE {arms} ELSE {col} END"


def stemmed_term_counts(tc: DataFrame) -> DataFrame:
    """(doc_id, term, tf) with S-stemmed terms — conflated variants'
    tfs merge per doc. Input is the standard term-count relation, so
    the stem is a projection and the merge rides one groupBy."""
    return (tc.select("doc_id", s_stem(F.col("term")).alias("term"), "tf")
            .groupBy("doc_id", "term")
            .agg(F.sum("tf").cast("int").alias("tf")))
