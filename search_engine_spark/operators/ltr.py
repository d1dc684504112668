"""Learning-to-rank feature extraction: one feature vector per
(query, candidate-document) pair.

The standard LTR data pipeline (LETOR / MSLR style) retrieves a
first-pass candidate set with a cheap ranker, then emits per-pair
features for model training. Here the candidate set is the BM25 top-k
run and the features are the engine's own scoring signals, so the
extractor is a pure composition of already-gated relations:

    qid, doc_id, rank   — the first-pass run (pinned tie order)
    bm25                — first-pass score (6 dp)
    lm                  — Dirichlet query-likelihood score (6 dp)
    n_matched           — distinct query terms present in the doc
    sum_tf / max_tf     — matched-term frequency mass in the doc
    dl                  — document length
    sum_idf             — Σ BM25-idf over matched terms (6 dp)
    coverage            — n_matched / |query terms| (6 dp)

Reference analogue: the reference stops at a single ranking function
(/root/reference/src/invertedIndex.py:389-492); feature extraction is
the training-data counterpart a production engine adds so the ranker
can be LEARNED from the same index statistics.

Scale shape: the candidate set is k×|Q| rows — tiny — so it broadcasts
into every join; the only large relation touched is tc, pruned FIRST
by the broadcast query dictionary exactly like every scorer here. The
LM relation aggregates before its dl join (lm_dirichlet_scores), the
feature hits aggregate per (qid, doc) with map-side combine, and the
final assembly is broadcast-joins only. No new shuffle classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import BM25_B, BM25_K1, LM_MU, TOP_K_DEFAULT
from .lm import lm_dirichlet_scores
from .query import _bm25_idf, _topk, bm25_scores


def ltr_features(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
                 qterms: DataFrame, n_docs: int, avgdl: float,
                 total_tokens: int, mu: float = LM_MU,
                 k: int = TOP_K_DEFAULT,
                 k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Feature vectors for the BM25 top-k candidates of each query."""
    cand = _topk(bm25_scores(tc, ds, tstats, qterms, n_docs, avgdl,
                             k1=k1, b=b), k)
    cand = cand.select("qid", "doc_id", "rank", F.col("score").alias("bm25"))
    lm = lm_dirichlet_scores(tc, ds, tstats, qterms, total_tokens, mu=mu)
    lm = lm.select("qid", "doc_id", F.round("score", 6).alias("lm"))

    qdict = F.broadcast(qterms.join(tstats.select("term", "df"), "term", "inner"))
    fh = (tc.join(qdict, "term", "inner")
          .join(F.broadcast(cand.select("qid", "doc_id")),
                ["qid", "doc_id"], "leftsemi")
          .select("qid", "doc_id", "tf",
                  _bm25_idf(F.col("df").cast("double"), n_docs).alias("idf")))
    feats = fh.groupBy("qid", "doc_id").agg(
        F.count("*").cast("long").alias("n_matched"),
        F.sum("tf").cast("long").alias("sum_tf"),
        F.max("tf").cast("int").alias("max_tf"),
        F.round(F.sum("idf"), 6).alias("sum_idf"))

    nq = F.broadcast(qterms.groupBy("qid")
                     .agg(F.count("*").cast("long").alias("n_qterms")))
    return (cand
            .join(lm, ["qid", "doc_id"], "inner")
            .join(feats, ["qid", "doc_id"], "inner")
            .join(ds.select("doc_id", "dl"), "doc_id", "inner")
            .join(nq, "qid", "inner")
            .select("qid", "doc_id", "rank", "bm25", "lm",
                    "n_matched", "sum_tf", "max_tf", "dl", "sum_idf",
                    F.round(F.col("n_matched")
                            / F.col("n_qterms").cast("double"), 6)
                     .alias("coverage")))


def hard_negatives(run: DataFrame, qrels: DataFrame,
                   n_neg: int = 10) -> DataFrame:
    """(qid, doc_id, neg_rank, score): the top n_neg NON-relevant docs
    per query from a deep first-pass run — the standard hard-negative
    miner for training dense retrievers / cross-encoders (BM25-ranked
    negatives are "hard" precisely because the cheap ranker liked
    them). Positives are anti-joined out, the first-pass retrieval
    order is kept, and survivors are re-ranked 1..n_neg.

    Scale shape: qrels is the small judged set (broadcast anti-join,
    never a shuffle of the run); the re-rank window partitions by qid
    over <= run-depth rows (WindowGroupLimit-pushed top-n), so cost is
    |Q| x depth regardless of corpus size.
    """
    from pyspark.sql import Window
    neg = run.join(F.broadcast(qrels.select("qid", "doc_id")),
                   ["qid", "doc_id"], "left_anti")
    w = Window.partitionBy("qid").orderBy("rank")
    return (neg.withColumn("neg_rank", F.row_number().over(w).cast("int"))
            .where(F.col("neg_rank") <= n_neg)
            .select("qid", "doc_id", "neg_rank", "score"))
