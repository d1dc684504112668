"""Faceted search: per-query metadata histograms, and field-collapsed
(diversified) top-k.

Production fulltext engines return facet counts next to the ranked
hits (how many matching docs per source / language / …) and can
"collapse" results so at most one hit per group value reaches the
page. The reference engine has neither (its output is the bare TREC
run, /root/reference/src/invertedIndex.py:858-878); both are pure
relational post-passes over relations this engine already builds, so
they compose with every scorer.

Scale shape:
- facet_counts: the candidate set is (query terms) ⨝ postings — the
  same broadcast-semi-join as retrieval — then ONE distinct (docs
  matching several terms count once) and ONE map-side-partial count
  per (qid, facet). Facet cardinality is metadata-sized, so the final
  agg output is tiny regardless of corpus size.
- collapse_topk: a per-(qid, group) row_number keeps the best hit per
  group, then the usual per-qid top-k. Both windows are
  WindowGroupLimit-able (rank ≤ const) so Spark pushes the limit into
  the shuffle — no full sort of the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conf import TOP_K_DEFAULT


def facet_counts(tc: DataFrame, qterms: DataFrame, doc_meta: DataFrame,
                 facet_col: str, k: int | None = None) -> DataFrame:
    """(qid, facet, n_docs, rank) — matching-doc count per facet value
    for each query, facets ranked by count desc (ties: facet asc).

    `tc`: (doc_id, term, ...) postings; `qterms`: (qid, term, ...);
    `doc_meta`: (doc_id, <facet_col>, ...). A doc matches a query iff
    it contains ≥1 query term (disjunctive candidate set — the same
    universe BM25 scores). `k` keeps only the top-k facets per query.
    """
    matches = (tc.join(F.broadcast(qterms.select("qid", "term").distinct()),
                       "term", "inner")
               .select("qid", "doc_id").distinct())
    fac = (matches.join(doc_meta.select("doc_id",
                                        F.col(facet_col).alias("facet")),
                        "doc_id", "inner")
           .groupBy("qid", "facet")
           .agg(F.count("*").cast("long").alias("n_docs")))
    w = Window.partitionBy("qid").orderBy(F.col("n_docs").desc(),
                                          F.col("facet").asc())
    out = fac.withColumn("rank", F.row_number().over(w).cast("int"))
    if k is not None:
        out = out.where(F.col("rank") <= k)
    return out.select("qid", "facet", "n_docs", "rank")


def collapse_topk(scored: DataFrame, doc_meta: DataFrame, group_col: str,
                  k: int = TOP_K_DEFAULT) -> DataFrame:
    """(qid, doc_id, group, rank, score) — top-k with at most ONE doc
    per `group_col` value per query (field collapsing / diversity).

    `scored`: (qid, doc_id, score) from any scorer, pre-top-k;
    `doc_meta`: (doc_id, <group_col>, ...). Within a group the best
    (score desc, doc_id asc) hit survives; survivors re-rank by the
    same order. Scores round to SCORE_DECIMALS BEFORE ordering — the
    same pin operators/query.py _topk applies — so ties resolve
    identically to the un-collapsed ranking. Both windows carry a
    rank ≤ const predicate so the WindowGroupLimit pushdown bounds
    per-partition state."""
    from .query import SCORE_DECIMALS
    g = (scored.withColumn("score", F.round("score", SCORE_DECIMALS))
         .join(doc_meta.select("doc_id", F.col(group_col).alias("group")),
               "doc_id", "inner"))
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    w_in = Window.partitionBy("qid", "group").orderBy(*order)
    best = (g.withColumn("_gr", F.row_number().over(w_in))
            .where(F.col("_gr") == 1).drop("_gr"))
    w_out = Window.partitionBy("qid").orderBy(*order)
    return (best.withColumn("rank", F.row_number().over(w_out).cast("int"))
            .where(F.col("rank") <= k)
            .select("qid", "doc_id", "group", "rank", "score"))


def filtered_topk(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
                  qterms: DataFrame, doc_meta: DataFrame, facet_col: str,
                  facet_value: str, n_docs: int, avgdl: float,
                  k: int = TOP_K_DEFAULT) -> DataFrame:
    """Facet drilldown: BM25 top-k restricted to docs whose
    `facet_col` equals `facet_value` ("search within source=X").

    Collection statistics (df, avgdl, N) stay GLOBAL — the filter
    narrows the candidate set, not the scoring model (the standard
    engine semantics: a filter must not change scores). The facet
    predicate lands on the metadata table's scan (pushed to parquet;
    with a facet-partitioned layout it prunes to one partition) and
    the semi-join runs on the SCORED candidate relation — already
    term-pruned to |candidates| rows — never on the full postings
    table, so no corpus-sized doc_id join exists at any facet
    selectivity. (An engine with facet-clustered postings would
    instead push the filter under the posting scan; the relational
    form here keeps the index layout facet-agnostic.)"""
    from .query import _topk, bm25_scores
    keep = doc_meta.where(F.col(facet_col) == F.lit(facet_value)) \
                   .select("doc_id")
    scored = bm25_scores(tc, ds, tstats, qterms, n_docs, avgdl)
    return _topk(scored.join(keep, "doc_id", "leftsemi"), k)


def significant_terms(tc: DataFrame, tstats: DataFrame, qterms: DataFrame,
                      n_docs: int, k: int = TOP_K_DEFAULT) -> DataFrame:
    """(qid, term, fg_df, bg_df, score, rank) — significant-terms
    aggregation: terms overrepresented in a query's matching docs
    (foreground) vs the whole corpus (background), scored with the
    JLH heuristic production engines ship:

        score = (fg_rate - bg_rate) * (fg_rate / bg_rate)

    with fg_rate = fg_df / |fg docs| and bg_rate = df / N; only terms
    with fg_rate > bg_rate qualify. Top-k per query (score desc, term
    asc) on the 6dp-rounded score so ranks are cross-engine stable.

    Scale shape: the foreground set is the usual broadcast semi-join
    candidate universe; fanning it back through `tc` is one equi-join
    keyed by doc_id followed by a map-side-combined (qid, term) count —
    output bounded by queries × vocabulary, never corpus-sized. The
    per-query foreground size is a broadcastable aggregate."""
    matches = (tc.join(F.broadcast(qterms.select("qid", "term").distinct()),
                       "term", "inner")
               .select("qid", "doc_id").distinct())
    fg_n = matches.groupBy("qid").agg(
        F.count("*").cast("double").alias("fg_n"))
    fg = (matches.join(tc.select("doc_id", "term"), "doc_id", "inner")
          .groupBy("qid", "term")
          .agg(F.count("*").cast("long").alias("fg_df")))
    joined = (fg.join(tstats.select("term", F.col("df").alias("bg_df")),
                      "term", "inner")
              .join(F.broadcast(fg_n), "qid", "inner"))
    fgr = F.col("fg_df").cast("double") / F.col("fg_n")
    bgr = F.col("bg_df").cast("double") / F.lit(float(n_docs))
    scored = (joined.where(fgr > bgr)
              .select("qid", "term", "fg_df",
                      F.col("bg_df").cast("long").alias("bg_df"),
                      F.round((fgr - bgr) * (fgr / bgr), 6).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(),
                                          F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("qid", "term", "fg_df", "bg_df", "score", "rank"))


def date_histogram(events: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type", value_col: str = "value",
                   interval: str = "hour") -> DataFrame:
    """(bucket, key, n_events, sum_value) — time-bucketed counts and
    sums per key: the date_histogram aggregation dashboards issue
    against an event/search-log table. One map-side-combined groupBy
    on (truncated ts, key); output is buckets × key-cardinality, tiny
    at any corpus size. Sums rounded to 6dp for float parity."""
    return (events.groupBy(
                F.date_trunc(interval, F.col(ts_col)).alias("bucket"),
                F.col(key_col).alias("key"))
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value")))


def burst_scores(events: DataFrame, ts_col: str = "ts",
                 key_col: str = "event_type", interval: str = "hour",
                 trailing: int = 3) -> DataFrame:
    """(key, bucket, n_events, trail_avg, score) — burst detection over
    the date_histogram series: each bucket's count against the mean of
    its ``trailing`` predecessor buckets (per key, bucket order),

        score = n_events / trail_avg        (round-6)

    Buckets without a full trailing window are omitted (no partial-
    window guesses). The spike-alerting pass dashboards run over query
    or event logs.

    Scale shape: the input is the already-tiny histogram (buckets ×
    keys), so the per-key ordered window costs nothing; no corpus-sized
    relation is ever windowed."""
    hist = date_histogram(events, ts_col=ts_col, key_col=key_col,
                          interval=interval).select("key", "bucket",
                                                    "n_events")
    w = (Window.partitionBy("key").orderBy("bucket")
         .rowsBetween(-int(trailing), -1))
    out = (hist.withColumn("trail_avg",
                           F.avg(F.col("n_events").cast("double")).over(w))
           .withColumn("_nprev", F.count("n_events").over(w)))
    return (out.where(F.col("_nprev") == int(trailing))
            .select("key", "bucket", "n_events",
                    F.round("trail_avg", 6).alias("trail_avg"),
                    F.round(F.col("n_events").cast("double")
                            / F.col("trail_avg"), 6).alias("score")))


def grouped_topk(scored: DataFrame, doc_meta: DataFrame, group_col: str,
                 k: int = TOP_K_DEFAULT) -> DataFrame:
    """(qid, group, doc_id, grank, score) — the top-k hits WITHIN each
    (query, facet-group) cell: ES's `top_hits` sub-aggregation (one
    result block per facet bucket), the per-group twin of
    collapse_topk's one-per-group diversity rule.

    Scores round to SCORE_DECIMALS before ordering (the _topk pin) so
    ties resolve identically across engines. The single window
    partitions on (qid, group) with a rank ≤ k predicate, so Spark's
    WindowGroupLimit pushdown keeps per-partition state at k rows —
    adding the group key only SHRINKS partitions vs the per-qid top-k
    window already in every scorer. One broadcast-size join against
    doc metadata; the scan stays pruned to (doc_id, group_col)."""
    from .query import SCORE_DECIMALS
    g = (scored.withColumn("score", F.round("score", SCORE_DECIMALS))
         .join(doc_meta.select("doc_id", F.col(group_col).alias("group")),
               "doc_id", "inner"))
    w = Window.partitionBy("qid", "group").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    return (g.withColumn("grank", F.row_number().over(w).cast("int"))
            .where(F.col("grank") <= k)
            .select("qid", "group", "doc_id", "grank", "score"))
