"""Collocation mining: adjacent-bigram PMI over the corpus.

The reference's index build computes global term statistics (df/cf —
src/invertedIndex.py:150-170); the classic corpus-analytics operator
one step up from unigram stats is collocation extraction: which
adjacent token pairs co-occur far more often than their unigram
frequencies predict. Standard PMI over adjacent bigrams:

    pmi(a, b) = ln( (c_ab * U * U) / (T * c_a * c_b) )

with c_ab the bigram count, c_a/c_b unigram counts, U total tokens,
T total bigrams. The multiply order is frozen (left-assoc, all inputs
cast to double first) and the result rounded to 6 decimals so Spark,
DuckDB and Python produce identical values.

Plan shape
----------
Bigrams are generated JVM-side per document with a ``transform`` over
token indexes (0-based array subscripts) — no shuffle, no UDF, fan-out
len-1 per doc. Then exactly two groupBys (bigram counts, unigram
counts) and two dictionary-sized joins to attach c_a/c_b. U and T are
driver scalars from bounded aggregations. Nothing is quadratic and no
key is hotter than the hottest bigram — the same skew profile as the
df/cf aggregation the build already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..conf import COLLOC_MIN_COUNT
from ..functions.tokenize import tokens_col
from .query import SCORE_DECIMALS


def cooccurrence_edges(docs: DataFrame, text_col: str = "text",
                       window: int = 2) -> DataFrame:
    """(ta, tb) — distinct unordered term pairs co-occurring within
    ``window`` token positions in any document (ta < tb
    lexicographically). The TextRank co-occurrence graph (Mihalcea &
    Tarau 2004): vertices = terms, edges = windowed co-occurrence.

    Pairs are generated JVM-side with a nested ``transform`` over token
    indexes (no shuffle, no UDF, fan-out ≤ window per token); the only
    shuffle is the edge ``distinct``, keyed by term pair — bounded by
    vocabulary², realistically by vocabulary × typical-neighborhood,
    independent of corpus row count."""
    w = int(window)
    toks = docs.select(tokens_col(text_col).alias("t"))
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(F.expr(
            "flatten(transform(sequence(0, size(t) - 2), i -> "
            f"transform(sequence(i + 1, least(i + {w}, size(t) - 1)), "
            "j -> struct(t[i] AS x, t[j] AS y))))")).alias("p"))
        .select("p.x", "p.y")
        .where(F.col("x") != F.col("y"))
    )
    return (pairs.select(F.least("x", "y").alias("ta"),
                         F.greatest("x", "y").alias("tb"))
            .distinct())


def textrank_terms(docs: DataFrame, text_col: str = "text",
                   window: int = 2, damping: float = 0.85,
                   n_iter: int = 3) -> DataFrame:
    """(term, pr) — TextRank keyword scores: fixed-iteration PageRank
    (operators/clusters.py::pagerank) over the windowed co-occurrence
    graph. The unsupervised keyword-extraction operator a curation
    pipeline uses to tag corpora; fixed n_iter keeps it deterministic
    and DuckDB-unrollable."""
    from .clusters import pagerank
    edges = cooccurrence_edges(docs, text_col=text_col, window=window)
    pr = pagerank(edges, a="ta", b="tb", damping=damping, n_iter=n_iter)
    return pr.select(F.col("node").alias("term"), "pr")


def collocations(docs: DataFrame, text_col: str = "text",
                 min_count: int = COLLOC_MIN_COUNT) -> DataFrame:
    """(t1, t2, c_ab, pmi) for every adjacent bigram with
    ``c_ab >= min_count``."""
    toks = docs.select(tokens_col(text_col).alias("t"))
    # 0-based array subscripts: pair i with i+1 for i in [0, size-2]
    bi = (
        toks.where(F.size("t") >= 2)
        .select(F.explode(F.expr(
            "transform(sequence(0, size(t) - 2), "
            "i -> struct(t[i] AS t1, t[i + 1] AS t2))")).alias("p"))
        .select("p.t1", "p.t2")
    )
    uc = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    bc = bi.groupBy("t1", "t2").agg(F.count("*").alias("c_ab"))
    u_total = float(uc.agg(F.sum("c")).collect()[0][0] or 0.0)
    t_total = float(bc.agg(F.sum("c_ab")).collect()[0][0] or 0.0)
    ca = uc.select(F.col("term").alias("t1"), F.col("c").alias("_ca"))
    cb = uc.select(F.col("term").alias("t2"), F.col("c").alias("_cb"))
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.lit(u_total) * F.lit(u_total))
        / (F.lit(t_total) * F.col("_ca").cast("double")
           * F.col("_cb").cast("double")))
    return (
        bc.where(F.col("c_ab") >= min_count)
        .join(ca, "t1").join(cb, "t2")
        .select("t1", "t2", "c_ab",
                F.round(pmi, SCORE_DECIMALS).alias("pmi"))
    )


def segment_queries(qterms: DataFrame, colloc: DataFrame,
                    tau: float) -> DataFrame:
    """(qid, seg_idx, segment, n_terms) — PMI-driven query
    segmentation: a multi-term query splits into contiguous segments,
    breaking between adjacent terms whose corpus adjacency PMI is
    below ``tau`` (or whose pair never clears the collocation floor).
    High-PMI runs stay together — the implicit-phrase detector that
    decides which query words deserve phrase/proximity treatment
    without the user quoting them.

    ``qterms``: (qid, off, term), 0-based contiguous offsets (the
    phrase_terms_df shape). ``colloc``: (t1, t2, pmi) — the
    `collocations` relation.

    Scale shape: the query side is driver-tiny; the corpus-sized
    collocation relation is FIRST pruned to the query's adjacent pairs
    by a broadcast semi-join (≤ Σ(len−1) rows survive), so the left
    join and both per-qid windows (lag, running break-sum) run over
    query-sized data only — corpus cost is exactly one pass of the
    collocations build it reuses.
    """
    w = Window.partitionBy("qid").orderBy("off")
    lagged = qterms.withColumn("t1", F.lag("term").over(w))
    pairs = (lagged.where(F.col("t1").isNotNull())
             .select(F.col("t1"), F.col("term").alias("t2")).distinct())
    cf = colloc.join(F.broadcast(pairs), ["t1", "t2"], "leftsemi")
    j = lagged.join(
        F.broadcast(cf.select("t1", F.col("t2").alias("term"), "pmi")),
        ["t1", "term"], "left")
    brk = F.when(F.col("t1").isNull() | F.col("pmi").isNull()
                 | (F.col("pmi") < F.lit(float(tau))), 1).otherwise(0)
    seg = (F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
           - 1).cast("int")
    return (j.withColumn("seg_idx", seg)
            .groupBy("qid", "seg_idx")
            .agg(F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct("off", "term"))),
                     lambda s: s["term"])).alias("segment"),
                 F.count("*").cast("long").alias("n_terms")))


def term_associations(tc: DataFrame, tstats: DataFrame,
                      min_codf: int = 2,
                      max_df_frac: float | None = None,
                      n_docs: int | None = None) -> DataFrame:
    """(ta, tb, codf, score) — document-level term association
    ("related terms"): for every unordered term pair co-occurring in
    ≥ min_codf documents, the cosine of their doc-incidence vectors

        score = codf / sqrt(df_a * df_b)

    (round-6). Distinct from `collocations` (adjacency PMI) and
    `textrank_terms` (window graph): association here is whole-document
    co-membership, the signal behind "related searches" panels.

    Scale shape: the doc-keyed self-join of the (doc, term) incidence
    relation fans out uniq² per doc — the classic item-similarity job.
    `max_df_frac` (with `n_docs`) drops stopword-grade terms BEFORE the
    self-join, the standard hot-item guard at corpus scale; None keeps
    exact semantics for the oracle gate. min_codf prunes the long tail
    after one map-side-combined count."""
    inc = tc.select("doc_id", "term")
    if max_df_frac is not None:
        if n_docs is None:
            raise ValueError("max_df_frac needs n_docs")
        hot = (tstats.where(
            F.col("df").cast("double") > float(max_df_frac) * float(n_docs))
            .select("term"))
        inc = inc.join(F.broadcast(hot), "term", "left_anti")
    a = inc.alias("a")
    b = inc.alias("b")
    pairs = (a.join(b, [F.col("a.doc_id") == F.col("b.doc_id"),
                        F.col("a.term") < F.col("b.term")])
             .groupBy(F.col("a.term").alias("ta"),
                      F.col("b.term").alias("tb"))
             .agg(F.count("*").cast("long").alias("codf"))
             .where(F.col("codf") >= int(min_codf)))
    da = tstats.select(F.col("term").alias("ta"),
                       F.col("df").alias("_dfa"))
    db = tstats.select(F.col("term").alias("tb"),
                       F.col("df").alias("_dfb"))
    return (pairs.join(da, "ta").join(db, "tb")
            .select("ta", "tb", "codf",
                    F.round(F.col("codf").cast("double")
                            / F.sqrt(F.col("_dfa").cast("double")
                                     * F.col("_dfb").cast("double")),
                            6).alias("score")))
