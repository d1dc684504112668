"""Document-centric static index pruning (Büttcher & Clarke, CIKM
2006, recast relationally).

Term-centric pruning (keep the global top-N postings per term, Carmel
et al. 2001) needs a per-TERM top-N — a window whose partitions grow
with the corpus for stopword terms, the exact unbounded-reducer shape
this engine avoids everywhere. The document-centric variant keeps the
top-K most informative terms of each DOCUMENT instead: the window
partitions on doc_id and is bounded by document length at ANY corpus
size, so pruning is one corpus-partitioned window pass — trivially
scale-safe, and the published quality numbers are comparable.

Contract (frozen for oracle parity):
- informativeness score = round(tf · idf, 6) with the engine's
  standard always-positive idf over the FULL corpus stats; ties break
  term ASC;
- the pruned index recomputes df/cf from the surviving postings (it
  must be self-consistent — a term's df in the pruned index is the
  number of docs that KEPT it), while dl/avgdl stay the full-corpus
  values (document length is a property of the document, not of the
  index subset — the Büttcher-Clarke convention).

The size/quality knob this buys at 100 TB: serving cost scales with
postings touched, and `pruned_recall` (overlap@k vs the unpruned
ranking) is the measured dial — prune harder until recall drops below
the bar, exactly like `ann_recall` justifies the approximate vector
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .query import _bm25_idf


def prune_doc_centric(tc: DataFrame, tstats: DataFrame, n_docs: int,
                      keep_k: int) -> DataFrame:
    """(doc_id, term, tf) — each doc keeps its keep_k highest
    round(tf·idf, 6) terms (tie: term ASC). The window partitions on
    doc_id, bounded by dl; the df dictionary joins in by term (the
    same shuffle layout the index build already uses — no broadcast
    of the full dictionary needed, though Catalyst may choose one
    when the dictionary is small)."""
    scored = (tc.join(tstats.select("term", "df"), "term")
              .select("doc_id", "term", "tf",
                      F.round(F.col("tf").cast("double")
                              * _bm25_idf(F.col("df").cast("double"), n_docs),
                              6).alias("_s")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("_s"), F.asc("term"))
    return (scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= keep_k)
            .select("doc_id", "term", "tf"))


def pruned_term_stats(pruned_tc: DataFrame) -> DataFrame:
    """(term, df, cf) recomputed over the pruned postings — the
    self-consistent dictionary of the pruned index."""
    return (pruned_tc.groupBy("term")
            .agg(F.count("*").cast("long").alias("df"),
                 F.sum("tf").cast("long").alias("cf")))


def overlap_at_k(run_a: DataFrame, run_b: DataFrame, k: int) -> DataFrame:
    """(qid, n_hit, recall) — |top-k(A) ∩ top-k(B)| / k per query;
    run B is the ground truth (the unpruned ranking). Depth-bounded
    join, corpus-size-invariant."""
    a = run_a.where(F.col("rank") <= k).select("qid", "doc_id")
    b = run_b.where(F.col("rank") <= k).select("qid", "doc_id")
    hits = (a.join(b, ["qid", "doc_id"])
            .groupBy("qid").agg(F.count("*").cast("long").alias("n_hit")))
    qids = b.select("qid").distinct()
    return (qids.join(hits, "qid", "left")
            .select("qid",
                    F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
                    F.round(F.coalesce("n_hit", F.lit(0))
                            / F.lit(float(k)), 6).alias("recall")))
