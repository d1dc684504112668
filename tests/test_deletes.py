"""Document deletion: compaction must be row-identical (including all
block metadata) to a fresh build over the surviving corpus at the same
geometry; tombstoned serving keeps full-corpus idf but never returns a
deleted doc, and ranks are occupied by live docs only."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import term_counts
from search_engine_spark.operators.deletes import (compact_deletes,
                                                   tombstoned_bm25_topk)
from search_engine_spark.operators.index_build import (doc_stats,
                                                       postings_blocked,
                                                       term_stats)
from search_engine_spark.operators.query import bm25_topk, query_terms_df


def _norm(idx):
    out = set()
    for r in idx.collect():
        postings = tuple(tuple(p) for p in r.postings)
        out.add((r.term, r.block_no, r.df, r.cf, postings,
                 r.first_doc_id, r.last_doc_id, r.block_max_tf, r.salt))
    return out


def test_compact_equals_fresh_build_over_survivors(spark, tiny_corpus):
    tw, _ = tiny_corpus
    n = tw.count()
    tombs = tw.where("doc_id % 3 = 1").select("doc_id")
    idx = postings_blocked(term_counts(tw), n, salt_buckets=4, block=16)
    compacted = compact_deletes(idx, tombs, n, salt_buckets=4, block=16)
    survivors = tw.join(tombs, "doc_id", "left_anti")
    fresh = postings_blocked(term_counts(survivors), n,
                             salt_buckets=4, block=16)
    assert _norm(compacted) == _norm(fresh)


def test_compact_inline_dl_preserves_block_min_dl(spark, tiny_corpus):
    tw, _ = tiny_corpus
    n = tw.count()
    tombs = tw.where("doc_id % 4 = 2").select("doc_id")
    tc = term_counts(tw)
    idx = postings_blocked(tc, n, salt_buckets=4, block=16,
                           ds=doc_stats(tc))
    compacted = compact_deletes(idx, tombs, n, salt_buckets=4, block=16)
    survivors = tw.join(tombs, "doc_id", "left_anti")
    tcs = term_counts(survivors)
    fresh = postings_blocked(tcs, n, salt_buckets=4, block=16,
                             ds=doc_stats(tcs))
    got = {(r.term, r.block_no, tuple(tuple(p) for p in r.postings),
            r.block_min_dl) for r in compacted.collect()}
    want = {(r.term, r.block_no, tuple(tuple(p) for p in r.postings),
             r.block_min_dl) for r in fresh.collect()}
    assert got == want


def test_tombstoned_serving_suppresses_deleted_docs(spark, tiny_corpus):
    tw, _ = tiny_corpus
    n = tw.count()
    tc = term_counts(tw)
    ds = doc_stats(tc)
    ts_ = term_stats(tc)
    avgdl = float(ds.agg(F.avg("dl")).collect()[0][0])
    q = query_terms_df(spark, [("q1", "a se moc"), ("q2", "jsem ten")])
    k = 5
    full = bm25_topk(tc, ds, ts_, q, n, avgdl, k=20).collect()
    # tombstone the current top doc of each qid — the strongest case
    top_docs = {r.doc_id for r in full if r.rank == 1}
    tombs = spark.createDataFrame([(d,) for d in sorted(top_docs)],
                                  "doc_id long")
    got = tombstoned_bm25_topk(tc, ds, ts_, q, tombs, n, avgdl, k=k).collect()
    assert all(r.doc_id not in top_docs for r in got)
    # scores keep full-corpus idf: every returned (qid, doc, score) is
    # in the unfiltered run, shifted up in rank by the deleted docs
    full_scores = {(r.qid, r.doc_id): r.score for r in full}
    for r in got:
        assert abs(full_scores[(r.qid, r.doc_id)] - r.score) < 1e-9
    # ranks are dense 1..k per qid
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())
