"""MMR result diversification (Carbonell & Goldstein, SIGIR 1998).

Maximal Marginal Relevance re-ranks a bounded candidate pool so each
pick balances relevance against redundancy with what is already
selected:

    mmr(d) = λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)

Greedy selection is inherently sequential PER QUERY, but queries are
independent — so the Spark shape is: candidate pool (top-`pool` by
relevance, a distributed top-k), pairwise pool similarities (a
pool×pool self-join per qid, JVM fold cosine — `pool²` rows per qid,
bounded by config, never corpus-dependent), then ONE
`applyInPandas` over qid groups running the greedy loop on ≤ pool²
pre-rounded rows. The corpus is touched only by the initial top-k;
the sequential part is O(pool²·k) per query on already-shuffled
kilobytes. At 100 TB nothing here grows with the corpus.

Determinism contract: rel and sim are the engine-wide round(cos, 4)
doubles; every selection compares round(λ·rel − (1−λ)·maxsim, 6)
(round_half_up in the pandas loop — Python round() is banker's and
would diverge) with vec_id ASC tiebreak, matching the DuckDB
recursive-CTE oracle byte for byte.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import COS_DECIMALS, brute_topk, cosine

MMR_OUT_SCHEMA = "qid bigint, vec_id bigint, rank int, mmr double"


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def mmr_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             pool: int = 20, lam: float = 0.5,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, vec_id, rank, mmr) — greedy MMR selection of k results
    from the cosine top-`pool` candidates of each query."""
    cand = (brute_topk(emb, n_queries=n_queries, k=pool,
                       id_col=id_col, vec_col=vec_col)
            .select("qid", "vec_id", F.col("cos").alias("rel")))
    vecs = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("v"))
    a = (cand.join(vecs, "vec_id")
         .select("qid", F.col("vec_id").alias("v1"),
                 F.col("rel").alias("rel1"), F.col("v").alias("va")))
    b = (cand.join(vecs, "vec_id")
         .select(F.col("qid").alias("qid_b"), F.col("vec_id").alias("v2"),
                 F.col("v").alias("vb")))
    pairs = (a.join(b, (F.col("qid") == F.col("qid_b"))
                    & (F.col("v1") != F.col("v2")))
             .select("qid", "v1", "rel1", "v2",
                     F.round(cosine(F.col("va"), F.col("vb")),
                             COS_DECIMALS).alias("sim")))

    lam = float(lam)

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["qid"].iloc[0]
        rel = {}
        sim = {}
        for r in pdf.itertuples(index=False):
            rel[int(r.v1)] = float(r.rel1)
            sim[(int(r.v1), int(r.v2))] = float(r.sim)
        remaining = sorted(rel)
        picked: list[tuple[int, float]] = []
        while remaining and len(picked) < k:
            best = None
            for v in remaining:  # ascending vec_id = tiebreak order
                if picked:
                    pen = max(sim[(v, s)] for s, _ in picked)
                    score = _round6(lam * rel[v] - (1.0 - lam) * pen)
                else:
                    score = _round6(lam * rel[v])
                if best is None or score > best[1]:
                    best = (v, score)
            picked.append(best)
            remaining.remove(best[0])
        return pd.DataFrame({
            "qid": [qid] * len(picked),
            "vec_id": [v for v, _ in picked],
            "rank": list(range(1, len(picked) + 1)),
            "mmr": [s for _, s in picked],
        })

    return (pairs.groupBy("qid")
            .applyInPandas(_greedy, schema=MMR_OUT_SCHEMA)
            .select("qid", "vec_id", "rank", "mmr"))
