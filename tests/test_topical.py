"""Topical sharding for selective search (operators/shards.py):
hashed tf·idf signatures, deterministic k-means shard maps, the
reassign-to-id-ranges production layout, and the measured routing
recall the topical layout buys (the round-4 verdict's "turn the
honest-but-low selective-search recall into the production number").
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts_sql
from search_engine_spark.operators.docids import mint_doc_ids
from search_engine_spark.operators.index_build import doc_stats, term_stats
from search_engine_spark.operators.query import bm25_topk, query_terms_df
from search_engine_spark.operators.shards import (
    doc_topic_features, routed_topk, routing_recall, shard_id_from_ranges,
    topical_reassign, topical_shard_map)
from search_engine_spark.sources.transcripts import (
    generate_transcripts, topic_vocab_slices)


@pytest.fixture(scope="module")
def corpus(spark):
    """Small topical corpus (4 topics) with index relations."""
    t = mint_doc_ids(generate_transcripts(
        spark, n_convs=300, seed=11, n_topics=4, partitions=4)).cache()
    tc = term_counts_sql(t).cache()
    ds = doc_stats(tc).cache()
    ts = term_stats(tc).cache()
    n_docs = t.count()
    avgdl = float(ds.agg(F.avg("dl")).collect()[0][0])
    return t, tc, ds, ts, n_docs, avgdl


def test_topic_features_shape_and_integrality(corpus):
    _, tc, _, ts, n_docs, _ = corpus
    rows = doc_topic_features(tc, ts, n_docs, dim=16).collect()
    assert rows, "no feature rows"
    for r in rows[:50]:
        assert len(r.v) == 16
        # integer-quantized weights: bit-identical cross-engine sums
        assert all(x == int(x) and x >= 0 for x in r.v)


def test_topic_features_deterministic(corpus):
    _, tc, _, ts, n_docs, _ = corpus
    a = {r.doc_id: r.v for r in
         doc_topic_features(tc, ts, n_docs, dim=16).collect()}
    b = {r.doc_id: r.v for r in
         doc_topic_features(tc, ts, n_docs, dim=16).collect()}
    assert a == b


def test_shard_map_total_and_bounded(corpus):
    _, tc, ds, ts, n_docs, _ = corpus
    smap = topical_shard_map(tc, ds, ts, n_docs, n_shards=4)
    rows = smap.collect()
    n_stats = ds.count()  # docs with ≥1 term (empty turns never hit)
    assert len(rows) == n_stats  # every indexed doc assigned once
    assert len({r.doc_id for r in rows}) == n_stats
    assert all(0 <= r.shard_id < 4 for r in rows)


def test_reassign_ranges_reproduce_map(corpus):
    """Production layout: after topical_reassign, the shard derives
    from the new doc-id RANGE with zero joins — must agree with the
    build-time map for every document."""
    _, tc, ds, ts, n_docs, _ = corpus
    smap = topical_shard_map(tc, ds, ts, n_docs, n_shards=4).cache()
    mapping, bounds = topical_reassign(smap, n_shards=4)
    assert bounds[0] == 0 and sorted(bounds) == bounds
    mism = (mapping.join(smap, "doc_id")
            .withColumn("s2", shard_id_from_ranges("new_id", bounds))
            .where(F.col("s2") != F.col("shard_id")).count())
    assert mism == 0
    # new ids are a dense permutation of [0, n_indexed_docs)
    ids = sorted(r.new_id for r in mapping.collect())
    assert ids == list(range(ds.count()))


def test_routed_full_fanout_identity(corpus, spark):
    """Safety property: with top_m = n_shards (no pruning) the routed
    ranking over ANY shard map equals the monolithic BM25 ranking."""
    _, tc, ds, ts, n_docs, avgdl = corpus
    slices = topic_vocab_slices(4, seed=11)
    rng = random.Random(3)
    qrows = [(f"q{j}", " ".join(rng.sample(slices[j % 4][:40], 2)))
             for j in range(6)]
    q = query_terms_df(spark, qrows)
    smap = topical_shard_map(tc, ds, ts, n_docs, n_shards=4)
    routed = routed_topk(tc, ds, ts, q, n_docs, avgdl,
                         n_shards=4, top_m=4, k=10, shard_of=smap)
    full = bm25_topk(tc, ds, ts, q, n_docs, avgdl, k=10)
    a = sorted(map(tuple, routed.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b


def test_scatter_gather_identity_on_topical_layout(corpus, spark):
    """scatter_gather's monolithic-identity safety property holds for
    ANY shard layout — here the topical map (global stats + full local
    top-k make the merge exact regardless of partitioning)."""
    from search_engine_spark.operators.shards import scatter_gather_topk
    _, tc, ds, ts, n_docs, avgdl = corpus
    slices = topic_vocab_slices(4, seed=11)
    rng = random.Random(9)
    q = query_terms_df(spark, [
        (f"q{j}", " ".join(rng.sample(slices[j % 4][:40], 2)))
        for j in range(5)])
    smap = topical_shard_map(tc, ds, ts, n_docs, n_shards=4)
    sg = scatter_gather_topk(tc, ds, ts, q, n_docs, avgdl,
                             n_shards=4, k=10, shard_of=smap)
    full = bm25_topk(tc, ds, ts, q, n_docs, avgdl, k=10)
    assert sorted(map(tuple, sg.collect())) == \
        sorted(map(tuple, full.collect()))


def test_topical_routing_beats_id_sharding(corpus, spark):
    """The point of the operator: CORI routing at top_m=2 over
    conv-level topical shards reaches ≥0.9 mean recall@10 of the full
    ranking, far above the same router over doc_id%n shards (both are
    deterministic — fixed seeds, fixed iteration k-means)."""
    t, tc, ds, ts, n_docs, avgdl = corpus
    slices = topic_vocab_slices(4, seed=11)
    rng = random.Random(5)
    qrows = []
    for j in range(12):
        tpc = rng.randrange(4)
        qrows.append((f"q{j:02d}",
                      " ".join(rng.sample(slices[tpc][2:60], 2))))
    q = query_terms_df(spark, qrows)
    full = bm25_topk(tc, ds, ts, q, n_docs, avgdl, k=10).cache()

    conv = t.select("doc_id", F.col("conv_id").alias("gid"))
    smap = topical_shard_map(tc, ds, ts, n_docs, n_shards=4,
                             dim=32, n_iters=4, group_of=conv).cache()
    routed = routed_topk(tc, ds, ts, q, n_docs, avgdl,
                         n_shards=4, top_m=2, k=10, shard_of=smap)
    rec_t = (routing_recall(routed, full, k=10)
             .agg(F.avg("recall_at_k")).collect()[0][0])

    routed_id = routed_topk(tc, ds, ts, q, n_docs, avgdl,
                            n_shards=4, top_m=2, k=10)
    rec_id = (routing_recall(routed_id, full, k=10)
              .agg(F.avg("recall_at_k")).collect()[0][0])

    assert rec_t >= 0.9, f"topical routing recall {rec_t}"
    assert rec_t > rec_id, (rec_t, rec_id)
