"""Static document priors (function-score boosting) and query
performance prediction (QPP).

Production engines combine the text score with query-INDEPENDENT
document evidence — recency, popularity, length, pagerank — as
``score' = score + α·ln(prior)`` (the additive-log form keeps the
boost rank-stable under BM25's additive decomposition and is what
log-linear static-rank combination reduces to). The reference ranks
by text evidence alone (src/invertedIndex.py:494-575); this layer
composes with ANY scorer that exposes a pre-top-k (qid, doc_id,
score) relation, e.g. query.bm25_scores.

QPP (pre-retrieval query difficulty) summarizes the dictionary
statistics of the query's terms — avg/max idf, avg ICTF, SCQ (Zhao,
Scholer & Tsegay 2008) — the signals an engine uses to route hard
queries to deeper candidate pools or heavier rankers. Pure broadcast
dictionary math: cost is |query terms|, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import TOP_K_DEFAULT
from .query import _bm25_idf, _topk


def prior_boosted_topk(scored: DataFrame, priors: DataFrame,
                       k: int = TOP_K_DEFAULT,
                       alpha: float = 1.0) -> DataFrame:
    """Top-k by ``score + α·ln(1 + prior)``.

    `scored`: (qid, doc_id, score) pre-top-k (unrounded);
    `priors`: (doc_id, prior ≥ 0) — any static per-doc evidence
    (length, clicks, recency-decayed age). The prior join touches
    only the candidate set (post term-semi-join), never the corpus;
    _topk applies the engine's pinned rounding + tie order."""
    boost = F.lit(float(alpha)) * F.log(F.lit(1.0)
                                        + F.col("prior").cast("double"))
    boosted = (scored.join(priors.select("doc_id", "prior"), "doc_id", "inner")
               .select("qid", "doc_id",
                       (F.col("score") + boost).alias("score")))
    return _topk(boosted, k)


def recency_boosted_topk(scored: DataFrame, doc_ts: DataFrame,
                         ref_ts_s: int, tau_s: float,
                         k: int = TOP_K_DEFAULT) -> DataFrame:
    """Top-k by ``score · exp(−age/τ)`` — the function_score
    exponential time-decay: fresher turns outrank stale ones at equal
    relevance, with τ setting the half-life scale (decay to 1/e at
    age=τ). `scored`: (qid, doc_id, score) pre-top-k (unrounded);
    `doc_ts`: (doc_id, ts_s) epoch-seconds per doc; `ref_ts_s`: the
    deterministic "now" (corpus max ts — never the wall clock, so runs
    are reproducible).

    Plan: the ts join touches only the candidate set; ages are a
    per-row expression; _topk applies the pinned rounding + tie
    order. Expression tree `score * exp(-(age / τ))` is spelled
    identically in the oracle."""
    age = (F.lit(int(ref_ts_s)) - F.col("ts_s")).cast("double")
    boosted = (scored.join(doc_ts.select("doc_id", "ts_s"), "doc_id", "inner")
               .select("qid", "doc_id",
                       (F.col("score")
                        * F.exp(-(age / F.lit(float(tau_s)))))
                       .alias("score")))
    return _topk(boosted, k)


def query_difficulty(qterms: DataFrame, tstats: DataFrame,
                     n_docs: int, collection_len: int) -> DataFrame:
    """(qid, n_terms, n_matched, avg_idf, max_idf, avg_ictf, scq) —
    pre-retrieval QPP over the term dictionary.

    idf   = the engine's BM25 idf;
    ictf  = ln(|C| / cf)                 (inverse collection tf);
    scq   = Σ_t (1 + ln(cf_t)) · idf_t   (collection-query similarity).
    Out-of-vocabulary terms count in n_terms but contribute no
    statistics (left join; null-skipping aggregates both engines)."""
    j = qterms.join(F.broadcast(tstats.select("term", "df", "cf")),
                    "term", "left")
    df_d = F.col("df").cast("double")
    cf_d = F.col("cf").cast("double")
    idf = _bm25_idf(df_d, n_docs)
    ictf = F.log(F.lit(float(collection_len)) / cf_d)
    scq_t = (F.lit(1.0) + F.log(cf_d)) * idf
    x = j.select("qid", "term", df_d.alias("_df"), idf.alias("_idf"),
                 ictf.alias("_ictf"), scq_t.alias("_scq"))
    return x.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.count("_df").cast("long").alias("n_matched"),
        F.round(F.avg("_idf"), 6).alias("avg_idf"),
        F.round(F.max("_idf"), 6).alias("max_idf"),
        F.round(F.avg("_ictf"), 6).alias("avg_ictf"),
        F.round(F.sum("_scq"), 6).alias("scq"))
