"""Dedup / similarity scale-path identity tests: the bucketed
(non-quadratic) variants must produce exactly the rows of their
all-pairs exact twins on the same input. The oracle gates
(entry_queries) verify the same identities against DuckDB at sf0.01;
these tests pin them on the seeded synthetic corpus so a regression is
caught before the gate runs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark, tiny_corpus):
    tw, _ = tiny_corpus
    return tw.select("doc_id", "text").where(F.col("text").isNotNull())


@pytest.fixture(scope="module")
def emb(spark):
    """Deterministic small embedding table: 64 vectors, dim 8, values
    a pure function of (vec_id, component)."""
    base = spark.range(64).select(F.col("id").cast("long").alias("vec_id"))
    comps = [F.round(F.sin(F.col("vec_id") * (i + 1) + i), 6).cast("float")
             for i in range(8)]
    return base.select("vec_id", F.array(*comps).alias("embedding"))


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("max_hamming", [1, 3, 6])
def test_simhash_banded_equals_exact(docs, max_hamming):
    exact = _pairs(dedup.simhash_pairs(docs, bits=32, max_hamming=max_hamming))
    banded = _pairs(dedup.simhash_pairs_banded(docs, bits=32,
                                               max_hamming=max_hamming))
    assert banded == exact


def test_embedding_dup_pairs_matches_selfjoin(emb):
    """The bucket-groupBy pair expansion ≡ the naive bucketed self-join
    it replaced (cap high enough to be a no-op here)."""
    got = _pairs(similarity.embedding_dup_pairs(
        emb, threshold=0.2, n_planes=4, max_bucket_size=10_000))
    with_b = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
                        similarity.sign_bucket(F.col("embedding"), 4).alias("bucket"))
    a, b = with_b.alias("a"), with_b.alias("b")
    exp = _pairs(
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"),
                F.round(similarity.cosine(F.col("a.v"), F.col("b.v")), 4).alias("cos"))
        .where(F.col("cos") >= 0.2))
    assert got == exp and len(got) > 0


def test_embedding_dup_pairs_bucket_cap_drops_hot_buckets(emb):
    """With a tiny cap every bucket above the cap contributes nothing;
    surviving pairs are a subset of the uncapped output."""
    uncapped = set(_pairs(similarity.embedding_dup_pairs(
        emb, threshold=0.2, n_planes=4, max_bucket_size=None)))
    capped = set(_pairs(similarity.embedding_dup_pairs(
        emb, threshold=0.2, n_planes=4, max_bucket_size=4)))
    assert capped <= uncapped and len(capped) < len(uncapped)


def test_lsh_candidates_bucket_cap_subset(docs):
    uncapped = set(_pairs(dedup.lsh_candidates(docs, n=3)))
    capped = set(_pairs(dedup.lsh_candidates(docs, n=3, max_bucket_size=3)))
    assert capped <= uncapped


def test_filtered_brute_topk_prefilter(spark):
    """Metadata pre-filter: only matching candidates are ranked; the
    unfiltered winner disappears when its facet doesn't match."""
    from search_engine_spark.operators.similarity import (brute_topk,
                                                          filtered_brute_topk)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.99, 0.1]), (2, [0.5, 0.5]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    meta = spark.createDataFrame(
        [(0, "en"), (1, "de"), (2, "en"), (3, "en")],
        "doc_id long, lang string")
    full = brute_topk(emb, n_queries=1, k=3).collect()
    assert full[0].vec_id == 1  # closest overall
    got = filtered_brute_topk(emb, meta, "lang", "en",
                              n_queries=1, k=3).collect()
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rank)] == [2, 3]
