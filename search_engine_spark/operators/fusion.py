"""Rank fusion + deterministic corpus sampling.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
given R ranked runs over the same queries,

    rrf(q, d) = Σ_r 1 / (K + rank_r(q, d))     (K = 60 classically)

is the standard score-free way to combine lexically and semantically
different retrievers (here: BM25 and Dirichlet query-likelihood, whose
score scales are incomparable). The fusion input is the runs' (qid,
doc_id, rank) triples only — tiny relative to the corpus — so the
whole operator is one union + one aggregation; no posting list is
touched again.

Stratified sampling: the per-stratum rate is enforced by an
ENGINE-PORTABLE deterministic coin — the first 15 hex digits of
md5(doc_id) as a 60-bit integer, mod 1000 — so the same rows are
picked by Spark, DuckDB, and Python (the repo-wide md5 convention).
At 100 TB this is a scan + filter with no shuffle at all: the coin is
computed per row, the stratum column is already on the row, and the
output is written partition-local. A count-exact quota sampler would
need a per-stratum sort or reservoir; the hash coin trades ±binomial
jitter on the sample size for a shuffle-free plan, the right trade for
training-data curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import TOP_K_DEFAULT
from .query import _topk

RRF_K = 60  # the SIGIR'09 constant; exactly representable


def rrf_fuse(runs: list[DataFrame], k: int = TOP_K_DEFAULT,
             rrf_k: int = RRF_K) -> DataFrame:
    """(qid, doc_id, rank, score) — top-k of Σ 1/(rrf_k + rank) over
    the given runs (each with columns qid, doc_id, rank). A doc absent
    from a run simply contributes nothing for it — the standard RRF
    convention."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    parts = [r.select("qid", "doc_id",
                      (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank")))
                      .alias("partial"))
             for r in runs]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    scored = (allp.groupBy("qid", "doc_id")
              .agg(F.sum("partial").alias("score")))
    return _topk(scored, k)


def hybrid_fuse(sparse: DataFrame, dense: DataFrame, alpha: float = 0.5,
                k: int = TOP_K_DEFAULT) -> DataFrame:
    """(qid, doc_id, rank, score) — convex min-max score fusion of a
    sparse (BM25) and a dense (embedding-cosine) run, the standard
    hybrid-retrieval combiner when calibrated scores (not just ranks)
    should matter: each run is min-max normalized per qid over its own
    candidates, then score = α·sparse_norm + (1−α)·dense_norm over the
    UNION of both candidate sets (a doc absent from one run contributes
    0 for that channel — the run-fusion convention; its true channel
    score is unknown below the run's cutoff).

    Inputs are (qid, doc_id, score) runs already cut to top-N per qid,
    so everything here is qids × 2N rows — the corpus is never touched.
    α = 0.5 default is exactly representable, keeping the arithmetic
    bit-identical across engines."""
    from pyspark.sql.window import Window

    def _minmax(run: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("qid")
        mn = F.min("score").over(w)
        mx = F.max("score").over(w)
        return run.select(
            "qid", "doc_id",
            F.when(mx > mn, (F.col("score") - mn) / (mx - mn))
             .otherwise(F.lit(0.0)).alias(out))

    s = _minmax(sparse, "s_norm")
    d = _minmax(dense, "d_norm")
    j = s.join(d, ["qid", "doc_id"], "full_outer")
    combined = j.select(
        "qid", "doc_id",
        (F.lit(float(alpha)) * F.coalesce("s_norm", F.lit(0.0))
         + F.lit(1.0 - float(alpha)) * F.coalesce("d_norm", F.lit(0.0)))
        .alias("score"))
    return _topk(combined, k)


def stratified_sample(df: DataFrame, stratum_col: str, id_col: str,
                      rates: dict[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum subsample: a row survives iff
    md5-coin(id) mod 1000 < rate·1000 for its stratum's rate.

    `rates` maps stratum value → sampling fraction (3-decimal
    granularity); strata not listed get `default_rate`. The coin is
    md5 over the STRING of the id column, so any engine reproduces the
    exact row set."""
    coin = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                  16, 10).cast("long") % 1000
    thr = F.lit(int(round(default_rate * 1000)))
    for val, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == val,
                     F.lit(int(round(rate * 1000)))).otherwise(thr)
    return df.where(coin < thr)


def comb_fuse(run_a: DataFrame, run_b: DataFrame, mnz: bool = False,
              k: int = TOP_K_DEFAULT) -> DataFrame:
    """CombSUM / CombMNZ score fusion (Fox & Shaw, TREC-2 1994):
    each run's scores are min-max normalized per qid over its own
    candidates, then

        CombSUM(d) = Σ_r norm_r(d)          (absent run → 0)
        CombMNZ(d) = CombSUM(d) · |{r : d ∈ r}|

    MNZ's match-count multiplier rewards consensus docs — the classic
    lexical/semantic run combiner when calibrated scores exist (vs
    RRF's rank-only view). Inputs are (qid, doc_id, score) runs
    already cut to top-N per qid, so this is qids × 2N rows joined
    full-outer — the corpus is never touched; at 100 TB the fusion
    cost is invariant in corpus size."""
    from pyspark.sql.window import Window

    def _minmax(run: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy("qid")
        mn = F.min("score").over(w)
        mx = F.max("score").over(w)
        return run.select(
            "qid", "doc_id",
            F.when(mx > mn, (F.col("score") - mn) / (mx - mn))
             .otherwise(F.lit(0.0)).alias(out))

    j = (_minmax(run_a, "a_norm")
         .join(_minmax(run_b, "b_norm"), ["qid", "doc_id"], "full_outer"))
    total = (F.coalesce("a_norm", F.lit(0.0))
             + F.coalesce("b_norm", F.lit(0.0)))
    if mnz:
        n_match = (F.col("a_norm").isNotNull().cast("int")
                   + F.col("b_norm").isNotNull().cast("int"))
        total = total * n_match.cast("double")
    return _topk(j.select("qid", "doc_id", total.alias("score")), k)


def mixture_sample(df: DataFrame, stratum_col: str, id_col: str,
                   alpha: float = 0.5) -> DataFrame:
    """Temperature-based source mixing (the multilingual-LM sampling
    rule, Lample & Conneau 2019): a source with n_s rows is kept at
    rate (n_s/n_min)^(α−1) — for α=0.5, sqrt(n_min/n_s) — so source
    mass after sampling is ∝ n_s^α. Downsample-only: the smallest
    source keeps rate 1.0.

    The keep decision is the repo's portable md5 coin at ppm
    granularity: keep iff md5_60bit(id) % 1_000_000 <
    floor(rate·1e6). Rates derive from exact integer counts through
    the same IEEE sqrt/division sequence in every engine, so the row
    set is engine-identical. Plan shape: one tiny per-source count
    aggregate broadcast back onto a scan+filter — no corpus shuffle
    at any scale."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    n_min = counts.agg(F.min("_n")).collect()[0][0]
    if n_min is None:
        return df.select(F.col(id_col), F.col(stratum_col)).limit(0)
    rate = F.pow(F.lit(float(n_min)) / F.col("_n").cast("double"),
                 F.lit(1.0 - float(alpha)))
    thr = counts.select(stratum_col,
                        F.floor(rate * 1e6).cast("long").alias("_thr"))
    coin = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                  16, 10).cast("long") % 1_000_000
    return (df.join(F.broadcast(thr), stratum_col)
            .where(coin < F.col("_thr"))
            .select(F.col(id_col), F.col(stratum_col)))
