"""Divergence-from-randomness ranking: the PL2 model (Amati & van
Rijsbergen 2002 — Poisson randomness, Laplace first normalization,
"normalization 2" length normalization).

    tfn     = tf * log2(1 + c * avgdl / dl)
    lambda  = cf / N
    partial = qtf * (1 / (tfn + 1)) *
              ( tfn * log2(tfn / lambda)
              + (lambda - tfn) * log2(e)
              + 0.5 * log2(2 * pi * tfn) )

Fourth ranking family next to BM25(F), SMART tf-idf, and LM-Dirichlet
(reference computes only SMART/BM25 — /root/reference/src/
invertedIndex.py:389-492; PL2 is the standard Terrier-school
alternative a production engine exposes).

Float parity: every log2 is expressed as ln(x)/LN2 with the frozen
double literals LN2 = 0.6931471805599453 and TWO_PI =
6.283185307179586, multiply order left-associative, all inputs cast to
double first, per-doc sum rounded to 6dp before ranking — Spark and
DuckDB then agree bit-for-bit the same way the BM25/SMART gates do.

Plan shape: identical to BM25 — postings ⨝ broadcast(query terms)
⨝ broadcast(term dict for cf) ⨝ doc_stats for dl, one map-side-
combined per-(qid, doc) sum, WindowGroupLimit top-k. No new shuffle
classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import TOP_K_DEFAULT

LN2 = 0.6931471805599453
TWO_PI = 6.283185307179586
PL2_C = 1.0


def pl2_topk(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
             qterms: DataFrame, n_docs: int, avgdl: float,
             c: float = PL2_C, k: int = TOP_K_DEFAULT) -> DataFrame:
    """(qid, doc_id, rank, score) — PL2 top-k."""
    from .query import _topk
    hits = (tc.join(F.broadcast(qterms.select("qid", "term", "qtf")),
                    "term", "inner")
            .join(F.broadcast(tstats.select("term", "cf")), "term", "inner")
            .join(ds.select("doc_id", "dl"), "doc_id", "inner"))
    tfn = (F.col("tf").cast("double")
           * (F.log(F.lit(1.0) + F.lit(float(c)) * F.lit(float(avgdl))
                    / F.col("dl").cast("double")) / F.lit(LN2)))
    lam = F.col("cf").cast("double") / F.lit(float(n_docs))
    partial = (F.col("qtf").cast("double")
               * (F.lit(1.0) / (tfn + F.lit(1.0)))
               * (tfn * (F.log(tfn / lam) / F.lit(LN2))
                  + (lam - tfn) * (F.lit(1.0) / F.lit(LN2))
                  + F.lit(0.5) * (F.log(F.lit(TWO_PI) * tfn) / F.lit(LN2))))
    scored = (hits.select("qid", "doc_id", partial.alias("partial"))
              .groupBy("qid", "doc_id")
              .agg(F.round(F.sum("partial"), 6).alias("score")))
    return _topk(scored, k)
