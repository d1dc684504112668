"""Unit tests: token-window chunking and hybrid score fusion."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.chunking import chunk_docs
from search_engine_spark.operators.fusion import hybrid_fuse


def test_chunk_docs_windows_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(1, 41))  # 40 tokens
    docs = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, None)],
        "doc_id long, text string")
    out = chunk_docs(docs, chunk_tokens=16, overlap=4)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: stride 12, starts while s <= 40-4=36 -> 1, 13, 25 (37 > 36 stops)
    d1 = sorted(k for k in rows if k[0] == 1)
    assert d1 == [(1, 0), (1, 1), (1, 2)]
    assert rows[(1, 0)].start_tok == 1 and rows[(1, 0)].n_chunk_tokens == 16
    assert rows[(1, 0)].chunk_text.startswith("w1 w2 ")
    assert rows[(1, 1)].start_tok == 13
    # overlap: chunk 1 begins 4 tokens before chunk 0 ends
    assert rows[(1, 1)].chunk_text.split()[0] == "w13"
    assert rows[(1, 0)].chunk_text.split()[-4:] == ["w13", "w14", "w15", "w16"]
    # tail chunk truncates at the document end
    assert rows[(1, 2)].start_tok == 25 and rows[(1, 2)].n_chunk_tokens == 16
    # short doc: one chunk, truncated
    assert rows[(2, 0)].n_chunk_tokens == 3 and rows[(2, 0)].chunk_text == "a b c"
    # empty/null docs emit no chunks
    assert not any(k[0] in (3, 4) for k in rows)


def test_chunk_docs_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_docs(docs, chunk_tokens=8, overlap=8)


def test_hybrid_fuse_minmax_union(spark):
    sparse = spark.createDataFrame(
        [("q1", 10, 4.0), ("q1", 11, 2.0), ("q1", 12, 0.0)],
        "qid string, doc_id long, score double")
    dense = spark.createDataFrame(
        [("q1", 11, 0.9), ("q1", 13, 0.5), ("q1", 14, 0.1)],
        "qid string, doc_id long, score double")
    out = {r.doc_id: r for r in hybrid_fuse(sparse, dense, alpha=0.5, k=10).collect()}
    # doc 11 is in both runs: 0.5*(2-0)/(4-0) + 0.5*(0.9-0.1)/(0.8) = 0.75
    assert abs(out[11].score - 0.75) < 1e-9
    # doc 10 sparse-only: 0.5*1.0 + 0 = 0.5; doc 13 dense-only: 0.5*0.5
    assert abs(out[10].score - 0.5) < 1e-9
    assert abs(out[13].score - 0.25) < 1e-9
    # union ranked: 11 > 10 > 13 > {12, 14 at 0.0, doc_id tiebreak}
    assert [out[d].rank for d in (11, 10, 13, 12, 14)] == [1, 2, 3, 4, 5]


def test_hybrid_fuse_degenerate_channel(spark):
    # all-equal sparse scores: channel normalizes to 0 (mx == mn guard)
    sparse = spark.createDataFrame(
        [("q1", 1, 3.0), ("q1", 2, 3.0)], "qid string, doc_id long, score double")
    dense = spark.createDataFrame(
        [("q1", 2, 0.4), ("q1", 3, 0.2)], "qid string, doc_id long, score double")
    out = {r.doc_id: r for r in hybrid_fuse(sparse, dense, k=10).collect()}
    assert out[1].score == 0.0
    assert abs(out[2].score - 0.5) < 1e-9  # dense max normalizes to 1
    assert out[3].score == 0.0


def test_kmeans_train_hand_checked(spark):
    from search_engine_spark.operators.similarity import kmeans_train
    # two tight clusters on orthogonal axes in 2-d; init = first 2 vecs
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
         (2, [0.9, 0.1]), (3, [0.1, 0.9]), (4, [0.8, 0.0])],
        "vec_id long, embedding array<float>")
    out = kmeans_train(emb, n_cells=2, n_iters=2)
    rows = {(r.cell, r.pos): r for r in out.collect()}
    # cluster 0 = {0, 2, 4}; cluster 1 = {1, 3} in every iteration
    assert rows[(0, 0)].n_members == 3 and rows[(1, 0)].n_members == 2
    import math
    # cell 0 centroid = mean of (1,0),(0.9,0.1),(0.8,0) rounded to 6dp
    assert math.isclose(rows[(0, 0)].cval, 0.9, abs_tol=1e-9)
    assert math.isclose(rows[(0, 1)].cval, round(0.1 / 3, 6), abs_tol=1e-9)
    assert math.isclose(rows[(1, 0)].cval, 0.05, abs_tol=1e-9)
    assert math.isclose(rows[(1, 1)].cval, 0.95, abs_tol=1e-9)
