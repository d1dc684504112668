"""S-stemmer rules + stemmed term counts vs hand goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.stemming import (s_stem, s_stem_py,
                                                    stemmed_term_counts)

# rule arms + guards + no-op shapes, exercised against both engines
GOLDEN = ["queries", "movies", "eies", "aies", "tables", "goes", "sees",
          "joins", "bus", "class", "spark", "s"]


def test_s_stem_py_rule_arms():
    assert s_stem_py("queries") == "query"
    assert s_stem_py("tables") == "table"
    assert s_stem_py("joins") == "join"
    assert s_stem_py("bus") == "bus"
    assert s_stem_py("class") == "class"
    assert s_stem_py("spark") == "spark"
    # guard shapes: -oes/-ees block rule 2, then rule 3 sees 'e' before
    # the final s — not in {u, s} — so the plain -s rule fires
    assert s_stem_py("goes") == "goe"
    assert s_stem_py("sees") == "see"
    # bare suffix strings: no preceding char → guarded rules skip
    assert s_stem_py("s") == "s"
    assert s_stem_py("ies") == "ie"   # rule 2: 'i' not in {a,e,o}


def test_s_stem_spark_matches_python(spark):
    terms = GOLDEN + ["ies", "es", "stories", "phrases",
                      "gas", "its", "is", "this", "miss"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {r.term: r.stem for r in
           df.select("term", s_stem(F.col("term")).alias("stem")).collect()}
    for t in terms:
        assert got[t] == s_stem_py(t), t


def test_stemmed_term_counts_merges_variants(spark):
    tc = spark.createDataFrame(
        [(1, "query", 2), (1, "queries", 3), (1, "join", 1),
         (2, "joins", 4)],
        "doc_id long, term string, tf int")
    got = {(r.doc_id, r.term): r.tf
           for r in stemmed_term_counts(tc).collect()}
    assert got == {(1, "query"): 5, (1, "join"): 1, (2, "join"): 4}
