"""Corpus diff + index checksums (operators/corpusops.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.corpusops import corpus_diff, index_checksums


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_diff_partitions(spark):
    old = _docs(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    new = _docs(spark, [(1, "a"), (2, "B CHANGED"), (4, "d"), (9, "new doc")])
    got = {r.doc_id: r.change for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 9: "added"}


def test_corpus_diff_identical_is_empty(spark):
    d = _docs(spark, [(1, "a"), (2, "b")])
    assert corpus_diff(d, d).count() == 0


def test_checksums_detect_any_mutation(spark):
    base = _docs(spark, [(i, f"tok{i % 5} common text {i}") for i in range(40)])
    tc = term_counts_sql(base)
    ref = {r.bucket: (r.n_postings, r.checksum)
           for r in index_checksums(tc, n_buckets=8).collect()}
    # identical corpus, different partitioning -> identical checksums
    same = {r.bucket: (r.n_postings, r.checksum)
            for r in index_checksums(tc.repartition(13), n_buckets=8).collect()}
    assert same == ref
    # one tf flipped -> that bucket's checksum changes, count unchanged
    mut = tc.withColumn("tf", F.when((F.col("doc_id") == 7)
                                     & (F.col("term") == "common"),
                                     F.col("tf") + 1).otherwise(F.col("tf")))
    mch = {r.bucket: (r.n_postings, r.checksum)
           for r in index_checksums(mut, n_buckets=8).collect()}
    diff = {b for b in ref if mch[b] != ref[b]}
    assert len(diff) == 1
    b = diff.pop()
    assert mch[b][0] == ref[b][0] and mch[b][1] != ref[b][1]
    # one posting dropped -> count and checksum both change
    dropped = tc.where(~((F.col("doc_id") == 3) & (F.col("term") == "common")))
    dch = {r.bucket: (r.n_postings, r.checksum)
           for r in index_checksums(dropped, n_buckets=8).collect()}
    assert sum(v[0] for v in dch.values()) == sum(v[0] for v in ref.values()) - 1
