"""CORI resource selection: rank index shards per query, route the
query to the top-m shards instead of broadcasting it to all of them.

At 10^12 documents the index lives in O(1000) shards; answering every
query against every shard costs 1000 posting-fetch fan-outs. CORI
(Callan, Lu & Croft, "Searching distributed collections with
inference networks", SIGIR 1995) scores each shard from per-shard
term statistics only — a relation of size O(shards × vocab) that is
tiny next to the index and broadcastable — so the router prunes the
fan-out to the shards that can actually contribute top-k hits.

    T(t, s) = df_s / (df_s + DF_BASE + DF_FACTOR * cw_s / avg_cw)
    I(t)    = ln((NS + 0.5) / sf_t) / ln(NS + 1.0)
    belief(t, s) = B_DEFAULT + (1 - B_DEFAULT) * T * I
    score(q, s)  = SUM_t qtf(t) * belief(t, s)

where df_s = shard document frequency, cw_s = shard token count,
avg_cw = mean shard token count, sf_t = number of shards containing
t, NS = shard count. A term absent from a shard contributes the
B_DEFAULT floor (T = 0), exactly as in the paper.

Reference analogue: /root/reference/src/invertedIndex.py keeps one
monolithic df table; this is the per-shard factoring of the same
statistics that a sharded deployment of it would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CORI_DF_BASE = 50.0
CORI_DF_FACTOR = 150.0
CORI_B_DEFAULT = 0.4


def shard_stats(tc: DataFrame, ds: DataFrame,
                n_shards: int = 8) -> tuple[DataFrame, DataFrame]:
    """Per-shard term stats for shard_id = doc_id % n_shards.

    Returns (term_shard, shard_size):
      term_shard: (shard_id, term, df_s)
      shard_size: (shard_id, cw_s)   — total tokens per shard

    One groupBy each over the posting relation; output is
    O(shards × vocab) and O(shards) — the broadcastable routing table.
    """
    sid = (F.col("doc_id") % n_shards).cast("int").alias("shard_id")
    term_shard = (tc.select(sid, "term")
                  .groupBy("shard_id", "term")
                  .agg(F.count("*").cast("long").alias("df_s")))
    shard_size = (ds.select(sid, "dl")
                  .groupBy("shard_id")
                  .agg(F.sum("dl").cast("long").alias("cw_s")))
    return term_shard, shard_size


def cori_select(term_shard: DataFrame, shard_size: DataFrame,
                qterms: DataFrame, n_shards: int,
                top_m: int = 4) -> DataFrame:
    """(qid, shard_id, rank, score) — top-m shards per query.

    The full qterm × shard grid is built first (both sides bounded:
    query set × shard count) so absent terms hit the B_DEFAULT floor;
    shard stats join in broadcast. Score rounded 6dp before ranking,
    shard_id tiebreak — the repo's cross-engine ranking contract."""
    avg_cw = shard_size.agg(F.avg("cw_s")).collect()[0][0]
    sf = term_shard.groupBy("term").agg(
        F.count("*").cast("long").alias("sf_t"))
    shards = shard_size.select("shard_id", "cw_s")
    grid = (qterms.crossJoin(F.broadcast(shards))
            .join(F.broadcast(term_shard), ["shard_id", "term"], "left")
            .join(F.broadcast(sf), "term", "left"))
    t_part = (F.coalesce(F.col("df_s"), F.lit(0)).cast("double")
              / (F.coalesce(F.col("df_s"), F.lit(0))
                 + CORI_DF_BASE
                 + CORI_DF_FACTOR * F.col("cw_s") / F.lit(float(avg_cw))))
    i_part = (F.log((float(n_shards) + 0.5)
                    / F.coalesce(F.col("sf_t"), F.lit(1)).cast("double"))
              / F.log(F.lit(float(n_shards) + 1.0)))
    belief = CORI_B_DEFAULT + (1.0 - CORI_B_DEFAULT) * t_part * i_part
    scored = (grid.groupBy("qid", "shard_id")
              .agg(F.round(F.sum(F.col("qtf") * belief), 6).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("shard_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= top_m)
            .select("qid", "shard_id", "rank", "score"))


def scatter_gather_topk(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
                        qterms: DataFrame, n_docs: int, avgdl: float,
                        n_shards: int = 8, k: int = 10) -> DataFrame:
    """Scatter-gather serving: per-shard BM25 top-k with GLOBAL
    statistics, merged and re-cut to k — and by the standard safety
    property (every shard returns its full local top-k, scores use
    corpus-global df/avgdl) the result is IDENTICAL to the monolithic
    ranking, which is exactly what the oracle gate pins.

    This is the gather half of distributed serving (cori_select is the
    scatter half that prunes which shards to ask). The per-shard top-k
    is one window partitioned by (qid, shard) — parallelism grows with
    shard count; the merge re-ranks only shards × k rows per query.

    The global-stats subtlety is the point: shard-LOCAL df would skew
    idf per shard and break the identity; the broadcast term dict
    carries the global df to every shard, the same way a real
    deployment ships the global dictionary with each index shard.
    """
    from .query import _bm25_idf, _topk

    qdict = F.broadcast(qterms.join(tstats, "term", "inner"))
    hits = (tc.join(qdict, "term", "inner")
            .join(ds.select("doc_id", "dl"), "doc_id"))
    from ..conf import BM25_B, BM25_K1
    tf = F.col("tf").cast("double")
    dl_norm = 1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl)
    sat = tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * dl_norm)
    partial = (F.col("qtf")
               * _bm25_idf(F.col("df").cast("double"), n_docs) * sat)
    scored = (hits.select(
                  "qid", "doc_id",
                  (F.col("doc_id") % n_shards).cast("int").alias("shard_id"),
                  partial.alias("partial"))
              .groupBy("qid", "shard_id", "doc_id")
              .agg(F.round(F.sum("partial"), 6).alias("score")))
    w_local = Window.partitionBy("qid", "shard_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    local_topk = (scored.withColumn("lrk", F.row_number().over(w_local))
                  .where(F.col("lrk") <= k)
                  .select("qid", "doc_id", "score"))
    return _topk(local_topk, k)


def routed_topk(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
                qterms: DataFrame, n_docs: int, avgdl: float,
                n_shards: int = 8, top_m: int = 4,
                k: int = 10) -> DataFrame:
    """Route-then-score: CORI-select top_m shards per query, score
    ONLY those shards' documents (global df/avgdl), top-k. The
    end-to-end selective-search serving path (route → scatter →
    gather): query fan-out drops from n_shards to top_m, trading tail
    recall — measured, not assumed, by routing_recall.

    The (qid, shard_id) routing table is queries × top_m rows —
    broadcast; the shard filter runs map-side on the hit stream before
    the score shuffle, exactly like taat_bounded_topk's admission.
    """
    from .query import _bm25_idf, _topk
    from ..conf import BM25_B, BM25_K1

    tsh, ssz = shard_stats(tc, ds, n_shards=n_shards)
    routes = (cori_select(tsh, ssz, qterms, n_shards=n_shards, top_m=top_m)
              .select("qid", "shard_id"))
    qdict = F.broadcast(qterms.join(tstats, "term", "inner"))
    hits = (tc.withColumn("shard_id",
                          (F.col("doc_id") % n_shards).cast("int"))
            .join(qdict, "term", "inner")
            .join(F.broadcast(routes), ["qid", "shard_id"], "leftsemi")
            .join(ds.select("doc_id", "dl"), "doc_id"))
    tf = F.col("tf").cast("double")
    dl_norm = 1.0 - BM25_B + BM25_B * F.col("dl") / F.lit(avgdl)
    sat = tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * dl_norm)
    partial = (F.col("qtf")
               * _bm25_idf(F.col("df").cast("double"), n_docs) * sat)
    scored = (hits.select("qid", "doc_id", partial.alias("partial"))
              .groupBy("qid", "doc_id")
              .agg(F.sum("partial").alias("score")))
    return _topk(scored, k)


def routing_recall(routed: DataFrame, full: DataFrame,
                   k: int = 10) -> DataFrame:
    """(qid, n_routed, n_overlap, recall_at_k) — overlap@k of the
    routed ranking against the full (all-shards) ranking: the measured
    fan-out-vs-quality dial of selective search, the sharded twin of
    pruned_recall / ann_recall."""
    r = routed.where(F.col("rank") <= k).select("qid", "doc_id")
    f = full.where(F.col("rank") <= k).select("qid", "doc_id")
    ov = (r.join(f, ["qid", "doc_id"], "inner")
          .groupBy("qid").agg(F.count("*").cast("long").alias("n_overlap")))
    nr = r.groupBy("qid").agg(F.count("*").cast("long").alias("n_routed"))
    nf = f.groupBy("qid").agg(F.count("*").cast("long").alias("n_full"))
    return (nf.join(nr, "qid", "left").join(ov, "qid", "left")
            .select("qid",
                    F.coalesce("n_routed", F.lit(0)).cast("long")
                    .alias("n_routed"),
                    F.coalesce("n_overlap", F.lit(0)).cast("long")
                    .alias("n_overlap"),
                    F.round(F.coalesce("n_overlap", F.lit(0))
                            / F.col("n_full"), 6).alias("recall_at_k")))
