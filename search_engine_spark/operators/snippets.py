"""Snippet (KWIC) generation: best query-term window per result doc.

The reference prints ranked doc ids only (src/invertedIndex.py:293-296);
the canonical presentation layer over a positional index is keyword-
in-context extraction: for each top-k document, the W-token window
covering the most query-term occurrences, rendered from the document's
own token stream.

Semantics (frozen for oracle parity)
------------------------------------
Candidate windows are anchored at occurrence positions: window
[p, p+W-1] for each query-term occurrence p in the doc. Best window =
most occurrences covered, tie → smallest start. The snippet is the
token slice [start, start+W-1] joined with single spaces.

Plan shape
----------
Work is bounded by the result set BEFORE any position math: occurrence
rows are semi-joined against the broadcast top-k (queries x k docs), so
the window scoring only ever sees the occurrences of result docs. The
occurrence-vs-window count uses the same banded ``pos div W`` trick as
operators/proximity.py — an occurrence o can only support a window
start p in [o-W+1, o], whose bucket is o's or the one before, so an
adjacent-band equi-join on (qid, doc_id, bkt) finds every (window,
occurrence) pair without a quadratic positions self-join. The final
token slice is a JVM ``slice`` over the (broadcast-semi-joined) docs
scan — document text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conf import BM25_B, BM25_K1, SNIPPET_WINDOW, TOP_K_DEFAULT
from ..functions.tokenize import tokens_col
from .query import bm25_topk


def best_windows(pos_idx: DataFrame, qterms: DataFrame, topdocs: DataFrame,
                 window: int = SNIPPET_WINDOW) -> DataFrame:
    """(qid, doc_id, start, n_hits) — the best W-token window per
    (query, result doc). ``topdocs`` is the tiny (qid, doc_id) result
    set; ``qterms`` any (qid, term, ...) query relation."""
    qdistinct = qterms.select("qid", "term").distinct()
    occ = (
        pos_idx.join(F.broadcast(qdistinct), "term", "inner")
        .join(F.broadcast(topdocs.select("qid", "doc_id")),
              ["qid", "doc_id"], "inner")
        .select("qid", "doc_id", F.explode("positions").alias("pos"))
    )
    w = F.lit(int(window))
    a = occ.select(
        "qid", "doc_id", F.col("pos").alias("start"),
        (F.col("pos").cast("long") / w).cast("long").alias("bkt"),
    )
    b = occ.select(
        "qid", "doc_id", F.col("pos").alias("opos"),
        F.explode(F.array(
            (F.col("pos").cast("long") / w).cast("long"),
            (F.col("pos").cast("long") / w).cast("long") - 1,
        )).alias("bkt"),
    )
    wins = (
        a.join(b, ["qid", "doc_id", "bkt"])
        .where((F.col("opos") >= F.col("start"))
               & (F.col("opos") <= F.col("start") + w - 1))
        .groupBy("qid", "doc_id", "start")
        .agg(F.count("*").cast("int").alias("n_hits"))
    )
    pick = Window.partitionBy("qid", "doc_id").orderBy(
        F.desc("n_hits"), F.asc("start"))
    return (
        wins.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select("qid", "doc_id", "start", "n_hits")
    )


def snippet_topk(docs: DataFrame, tc: DataFrame, ds: DataFrame,
                 tstats: DataFrame, pos_idx: DataFrame, qterms: DataFrame,
                 n_docs: int, avgdl: float, window: int = SNIPPET_WINDOW,
                 k: int = TOP_K_DEFAULT, k1: float = BM25_K1,
                 b: float = BM25_B) -> DataFrame:
    """(qid, doc_id, rank, start, n_hits, snippet) for the BM25 top-k:
    each result doc rendered as its best W-token keyword-in-context
    window."""
    top = bm25_topk(tc, ds, tstats, qterms, n_docs, avgdl,
                    k=k, k1=k1, b=b)
    best = best_windows(pos_idx, qterms, top, window=window)
    picked = best.join(top.select("qid", "doc_id", "rank"),
                       ["qid", "doc_id"], "inner")
    toks = docs.select("doc_id", tokens_col("text").alias("_toks"))
    return (
        toks.join(F.broadcast(picked), "doc_id", "inner")
        .select(
            "qid", "doc_id", "rank", "start", "n_hits",
            F.array_join(F.slice(F.col("_toks"), F.col("start"),
                                 F.lit(int(window))), " ").alias("snippet"),
        )
    )
