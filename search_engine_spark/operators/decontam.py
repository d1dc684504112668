"""Benchmark decontamination: flag training documents that share a
token n-gram with an evaluation/benchmark string.

The standard LLM-training hygiene pass (GPT-3 appendix C, PaLM §7,
The Pile): before training, every document overlapping an eval-suite
item on a long-enough n-gram (8–13 tokens) is dropped or masked so
benchmark numbers stay honest. Relationally it is exactly the
shingle machinery the dedup tier already has (operators/dedup.py
shingles), joined against a SMALL eval side.

Scale shape: eval suites are a few thousand strings — their shingle
table is dictionary-sized and BROADCAST, so the corpus-side cost is
one shingle projection (pipeline-local explode, map-side-distinct)
and a broadcast hash join; no corpus self-join, no shuffle keyed by
shingle. A hot boilerplate shingle in an eval item matching many
docs is the signal itself, not a skew bug — the output is bounded by
(contaminated docs × eval items they hit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col
from .dedup import _shingles_from, shingles

DECONTAM_NGRAM = 8


def contaminated_docs(docs: DataFrame, eval_df: DataFrame,
                      n: int = DECONTAM_NGRAM) -> DataFrame:
    """(doc_id, eval_id, n_hits) — one row per (document, eval item)
    pair sharing ≥1 token n-gram; n_hits = number of DISTINCT shared
    n-grams (shingles are deduped per side, standard contamination
    counting). `docs`: (doc_id, text); `eval_df`: (eval_id, text).
    Anti-joining the training set against this output's doc_ids is
    the decontamination filter."""
    doc_sh = shingles(docs, n)
    # eval ids are opaque strings (dedup.shingles mints long doc_ids),
    # so shingle the eval side directly with the same '_'-join builder
    ev_sh = (eval_df.select("eval_id", tokens_col("text").alias("_toks"))
             .select("eval_id",
                     F.explode(F.array_distinct(
                         _shingles_from(F.col("_toks"), n))).alias("shingle")))
    return (doc_sh.join(F.broadcast(ev_sh), "shingle", "inner")
            .groupBy("doc_id", "eval_id")
            .agg(F.count("*").cast("long").alias("n_hits")))
