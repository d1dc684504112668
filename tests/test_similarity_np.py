"""Ranking-identity of the Arrow/numpy cosine kernel vs the JVM fold
(operators/similarity.py::_cosine_np — VERDICT r4 item 6): at
production embedding dims the einsum kernel must return EXACTLY the
rows the fold path returns (same round(cos,4) values, same tie order),
so the two scorers are interchangeable plan choices, not approximations
of each other.
"""

import numpy as np
import pytest

from search_engine_spark.operators import similarity


@pytest.fixture(scope="module")
def emb768(spark):
    """Seeded dim-768 corpus: 400 vectors with planted near-duplicate
    structure (every 7th vector is a noisy copy of vector i-7) so the
    top-k boundary is contested, not degenerate."""
    rng = np.random.default_rng(768)
    v = rng.normal(size=(400, 768))
    for i in range(7, 400, 7):
        v[i] = v[i - 7] + rng.normal(scale=0.05, size=768)
    rows = [(i, [float(x) for x in v[i]]) for i in range(400)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").cache()


def _rows(df):
    return sorted((r.qid, r.vec_id, r.rank, r.cos) for r in df.collect())


def test_brute_topk_pair_udf_identical_dim768(emb768):
    fold = _rows(similarity.brute_topk(emb768, n_queries=6, k=10))
    npk = _rows(similarity.brute_topk(emb768, n_queries=6, k=10,
                                      scorer="np"))
    assert fold == npk


def test_brute_topk_matrix_kernel_identical_dim768(emb768):
    fold = _rows(similarity.brute_topk(emb768, n_queries=6, k=10))
    npk = _rows(similarity.brute_topk_np(emb768, n_queries=6, k=10))
    assert fold == npk


def test_matrix_kernel_identical_many_partitions(emb768):
    """Per-batch candidate pruning must survive any partitioning: the
    global window merges per-batch top-k under the same total order."""
    fold = _rows(similarity.brute_topk(emb768, n_queries=4, k=7))
    npk = _rows(similarity.brute_topk_np(emb768.repartition(13),
                                         n_queries=4, k=7))
    assert fold == npk


def test_ivf_topk_np_identical_dim768(emb768):
    fold = _rows(similarity.ivf_topk(emb768, n_queries=6, k=8,
                                     n_cells=8, n_probe=3))
    npk = _rows(similarity.ivf_topk(emb768, n_queries=6, k=8,
                                    n_cells=8, n_probe=3, scorer="np"))
    assert fold == npk


def test_brute_topk_np_identical_fixture(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    fold = _rows(similarity.brute_topk(emb, n_queries=5, k=5))
    npk = _rows(similarity.brute_topk_np(emb, n_queries=5, k=5))
    assert fold == npk


def test_unknown_scorer_rejected():
    with pytest.raises(ValueError, match="fold"):
        similarity._cosine_scorer("simd")
