"""Language-model (query-likelihood) ranking with Dirichlet smoothing.

score(q, d) = Σ_{t∈q} qtf · ln p(t|d),   p(t|d) = (tf + μ·p(t|C)) / (dl + μ)

computed in the standard rank-equivalent sparse form (Zhai & Lafferty,
SIGIR 2001): only matched (term, doc) pairs contribute

    qtf · ln(1 + tf·C / (μ·cf))

and the doc-only constant  qlen · ln(μ / (dl + μ))  is added once per
candidate doc. The result is RANK-EQUIVALENT to the full Dirichlet
query log-likelihood — the doc-independent term Σ qtf·ln p(t|C) is
dropped, so scores are not comparable across formulations (they are
not true log-probabilities) — without materializing tf = 0 pairs. Candidate set =
docs matching ≥1 query term, the same convention as the BM25/SMART
scorers here; query terms absent from the collection drop out exactly
like the reference's dictionary-miss path
(/root/reference/src/invertedIndex.py:260-261).

Scale shape: the per-(qid, doc) aggregation happens BEFORE the
doc-length join, so the big per-doc table joins against the already
collapsed candidate set rather than the raw hit stream; both the query
dictionary (term → cf) and the per-qid length are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import LM_MU, TOP_K_DEFAULT
from .query import _topk


def lm_dirichlet_topk(tc: DataFrame, ds: DataFrame, tstats: DataFrame,
                      qterms: DataFrame, total_tokens: int,
                      mu: float = LM_MU, k: int = TOP_K_DEFAULT) -> DataFrame:
    """Top-k query-likelihood ranking from the (doc_id, term, tf)
    relation. ``total_tokens`` is the collection length C = Σ dl (a
    driver-known long, exact in double for any realistic corpus).

    The arithmetic is spelled in one fixed operation order —
    ``tf · C / (μ · cf)`` and ``μ / (dl + μ)`` — so the DuckDB oracle
    and a pure-Python check run the bit-identical double sequence
    before the 6-dp rounding that pins the rank order.
    """
    c = F.lit(float(total_tokens))
    m = F.lit(float(mu))
    qdict = F.broadcast(qterms.join(tstats.select("term", "cf"), "term", "inner"))
    qlen = F.broadcast(
        qdict.groupBy("qid").agg(F.sum("qtf").cast("double").alias("qlen")))
    partial = F.col("qtf") * F.log(
        F.lit(1.0)
        + F.col("tf").cast("double") * c / (m * F.col("cf").cast("double")))
    matched = (
        tc.join(qdict, "term", "inner")
        .select("qid", "doc_id", partial.alias("partial"))
        .groupBy("qid", "doc_id")
        .agg(F.sum("partial").alias("_s"))
    )
    scored = (
        matched.join(ds.select("doc_id", "dl"), "doc_id")
        .join(qlen, "qid")
        .select(
            "qid", "doc_id",
            (F.col("_s")
             + F.col("qlen") * F.log(m / (F.col("dl").cast("double") + m)))
            .alias("score"))
    )
    return _topk(scored, k)
