"""MMR diversification vs a hand-computed golden + invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.diversify import mmr_topk
from search_engine_spark.operators.similarity import brute_topk


@pytest.fixture(scope="module")
def toy_emb(spark):
    # 3-d vectors: vec_id 0 is the query; 1 and 2 are a redundant pair
    # (sim≈1.0), 3 trades ~0.1 relevance for ~0.1 less redundancy — at
    # λ=0.5 the diverse doc wins the second slot by a clear margin
    # (mmr(3)≈+0.002 vs mmr(2)≈−0.003).
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0]),    # closest to query
        (2, [1.0, 0.11, 0.0]),   # near-duplicate of 1
        (3, [0.9, 0.0, 0.44]),   # diverse, slightly less relevant
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_prefers_diversity_over_redundancy(spark, toy_emb):
    got = (mmr_topk(toy_emb, n_queries=1, k=3, pool=3, lam=0.5)
           .orderBy("rank").collect())
    assert [r.vec_id for r in got][:2] == [1, 3], \
        "second pick must skip the near-duplicate of the first"
    assert [r.rank for r in got] == [1, 2, 3]


def test_mmr_first_pick_is_relevance_top1(spark, toy_emb):
    top1 = brute_topk(toy_emb, n_queries=1, k=1).collect()[0]
    got1 = (mmr_topk(toy_emb, n_queries=1, k=3, pool=3, lam=0.5)
            .where(F.col("rank") == 1).collect()[0])
    assert got1.vec_id == top1.vec_id
    assert got1.mmr == pytest.approx(
        math.floor(0.5 * top1.cos * 1e6 + 0.5) / 1e6, abs=1e-12)


def test_mmr_lambda_one_is_pure_relevance(spark, toy_emb):
    """λ=1 removes the diversity penalty: MMR order == cosine order."""
    rel = [r.vec_id for r in
           brute_topk(toy_emb, n_queries=1, k=3).orderBy("rank").collect()]
    got = [r.vec_id for r in
           mmr_topk(toy_emb, n_queries=1, k=3, pool=3, lam=1.0)
           .orderBy("rank").collect()]
    assert got == rel


def test_mmr_selects_k_distinct_per_query(spark, toy_emb):
    out = mmr_topk(toy_emb, n_queries=1, k=3, pool=3).collect()
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids)) == 3
    assert all(r.qid == 0 for r in out)
