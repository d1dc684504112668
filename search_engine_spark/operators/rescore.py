"""Two-phase retrieval: cheap BM25 recall, expensive proximity rescore.

Production engines rescore only the top of the ranked list ("rescore
window"): phase 1 ranks the full candidate set with the term-at-a-time
scorer, phase 2 re-ranks the top-N with a signal too expensive to
compute corpus-wide — here term proximity from the positional index
(the reference stores positions for exactly this, /root/reference/src/
invertedIndex.py:174-186, but never consumes them for ranking).

Boost: min pairwise distance between occurrences of two DISTINCT query
terms in the doc, folded in as

    final = round(bm25 + weight / (1 + min_dist), 6)

Docs containing fewer than two distinct query terms keep their BM25
score (no proximity evidence ≠ penalty).

Scale shape: the expensive part — the per-(query, doc) position
self-join — runs ONLY on phase-1 survivors (N docs per query, a
constant), after a semi-join prunes the positional index to those
(qid, doc) pairs and to query terms. The phase-2 state is
queries × N × positions-of-query-terms-in-doc, independent of corpus
size; phase 1 is the ordinary WindowGroupLimit top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conf import TOP_K_DEFAULT

RESCORE_WINDOW = 50
RESCORE_WEIGHT = 2.0


def rescore_topk(scored: DataFrame, positions: DataFrame,
                 qterms: DataFrame, k: int = TOP_K_DEFAULT,
                 window: int = RESCORE_WINDOW,
                 weight: float = RESCORE_WEIGHT) -> DataFrame:
    """(qid, doc_id, rank, score, base_score) — proximity-rescored
    top-k. `scored`: (qid, doc_id, score) the phase-1 candidate
    relation (unrounded or 6dp; rounded here before ranking);
    `positions`: (term, doc_id, positions array<int>) the positional
    index; `qterms`: (qid, term, ...)."""
    base = (scored.withColumn("score", F.round("score", 6))
            .withColumn("_r", F.row_number().over(
                Window.partitionBy("qid")
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())))
            .where(F.col("_r") <= window)
            .select("qid", "doc_id", F.col("score").alias("base_score")))
    # every phase-2 relation is bounded by queries × window (× the
    # positions of query terms in one doc) — broadcast-sized at ANY
    # corpus size, so hint it: the static planner can't know that and
    # would otherwise stage sort-merge joins
    qp = (positions.join(
              F.broadcast(qterms.select("qid", "term").distinct()),
              "term", "inner")
          .join(F.broadcast(base.select("qid", "doc_id")),
                ["qid", "doc_id"], "leftsemi")
          .select("qid", "doc_id", "term",
                  F.explode("positions").alias("pos")))
    a = qp.alias("a")
    b = F.broadcast(qp.alias("b"))
    prox = (a.join(b, [F.col("a.qid") == F.col("b.qid"),
                       F.col("a.doc_id") == F.col("b.doc_id"),
                       F.col("a.term") < F.col("b.term")])
            .groupBy(F.col("a.qid").alias("qid"),
                     F.col("a.doc_id").alias("doc_id"))
            .agg(F.min(F.abs(F.col("a.pos") - F.col("b.pos")))
                 .cast("double").alias("min_dist")))
    final = (base.join(F.broadcast(prox), ["qid", "doc_id"], "left")
             .withColumn("score", F.round(
                 F.col("base_score")
                 + F.coalesce(F.lit(float(weight))
                              / (F.lit(1.0) + F.col("min_dist")),
                              F.lit(0.0)), 6)))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(),
                                          F.col("doc_id").asc())
    return (final.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "rank", "score", "base_score"))
