"""Elias-Fano codec gates (functions/ef_codec.py): round-trip
properties, golden small cases, density advantage over varbyte, and
Spark encode/decode index identity."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.codec import encode_block
from search_engine_spark.functions.ef_codec import (decoded_postings_long_ef,
                                                    ef_decode,
                                                    ef_decode_block,
                                                    ef_encode,
                                                    ef_encode_block,
                                                    encode_index_ef)


def test_ef_golden_small():
    # n=1, value 0: u=1, l=0, one high bit
    assert ef_decode(ef_encode(np.array([0], dtype=np.uint64))).tolist() == [0]
    assert ef_decode(ef_encode(np.array([], dtype=np.uint64))).tolist() == []
    v = np.array([2, 3, 5, 7, 11, 13, 24], dtype=np.uint64)
    assert ef_decode(ef_encode(v)).tolist() == v.tolist()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**13),
                max_size=300, unique=True))
def test_ef_roundtrip_property(vals):
    v = np.array(sorted(vals), dtype=np.uint64)
    assert np.array_equal(ef_decode(ef_encode(v)), v.astype(np.int64))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=10**13),
                          st.integers(min_value=1, max_value=70000)),
                max_size=200, unique_by=lambda p: p[0]))
def test_ef_block_roundtrip_property(postings):
    postings.sort()
    d = np.array([p[0] for p in postings], dtype=np.uint64)
    t = np.array([p[1] for p in postings], dtype=np.uint64)
    ids, tfs = ef_decode_block(ef_encode_block(d, t))
    assert np.array_equal(ids, d.astype(np.int64))
    assert np.array_equal(tfs, t.astype(np.int64))


def test_ef_beats_varbyte_on_dense_lists():
    # dense list (gap 1): EF ~2 bits/id, varbyte >= 8 bits/id — the
    # stopword-list regime that dominates index bytes at corpus scale
    d = np.arange(0, 8192, dtype=np.uint64)
    t = np.ones(8192, dtype=np.uint64)
    ef_bytes = len(ef_encode(d))
    vb_bytes = len(encode_block(d, t)) - 8192  # subtract the tf stream
    assert ef_bytes * 2 < vb_bytes
    assert ef_bytes / 8192 < 0.5  # < 4 bits per doc-id


def test_ef_sparse_list_worst_case_bound():
    # u/n = 2^20: EF worst case 2 + log2(u/n) = 22 bits/id
    rng = np.random.default_rng(7)
    d = np.sort(rng.choice(2**30, size=1024, replace=False)).astype(np.uint64)
    bits_per_id = len(ef_encode(d)) * 8 / 1024
    assert bits_per_id <= 2 + np.ceil(np.log2(2**30 / 1024)) + 1  # +1 header amortization


def test_spark_ef_index_identity(spark, tiny_corpus):
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import term_counts_sql
    from search_engine_spark.operators.index_build import postings_blocked
    tw, _rows = tiny_corpus
    tc = term_counts_sql(tw.select("doc_id", "text"))
    blocked = postings_blocked(tc, n_docs=tw.count(), salt_buckets=4)
    flat = (decoded_postings_long_ef(encode_index_ef(blocked))
            .select("term", "doc_id", "tf"))
    orig = (blocked.select("term", F.explode("postings").alias("p"))
            .select("term", F.col("p.doc_id").alias("doc_id"),
                    F.col("p.tf").cast("int").alias("tf")))
    assert flat.exceptAll(orig).count() == 0
    assert orig.exceptAll(flat).count() == 0
