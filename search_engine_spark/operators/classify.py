"""Multinomial Naive Bayes text classification — the model-based
filtering step of a training-data pipeline (the role CCNet's fastText
language/quality classifier plays in the GPT-3/LLaMA data recipes),
in a fully deterministic, oracle-reproducible form.

Train: add-one-smoothed multinomial NB from a labeled corpus —
    log P(c)   = ln(docs_c / docs)
    log P(t|c) = ln((cf_{t,c} + 1) / (tokens_c + V))
Predict: score(d, c) = log P(c) + Σ_t tf_{d,t} · log P(t|c), with
unseen (t, c) pairs falling to the smoothed floor ln(1/(tokens_c+V));
argmax with class-name tiebreak.

Scale shape: training is two groupBys over the token relation (per
(term, class) and per class — both map-side combinable); prediction
expands each doc's terms by the CLASS COUNT (a constant, 3 here), left
joins the per-(term, class) weights (dictionary-sized — an equi-join,
deliberately not a broadcast at 10^12-doc vocabularies), and reduces
with one integer-weighted sum per (doc, class). No per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def nb_train(tc: DataFrame, labels: DataFrame
             ) -> tuple[DataFrame, DataFrame, int]:
    """(term_class_cf, class_stats, vocab_size).

    tc: (doc_id, term, tf); labels: (doc_id, label).
    term_class_cf: (term, label, cf_tc); class_stats:
    (label, n_docs_c, tokens_c, log_prior) with log_prior rounded 6dp.
    """
    j = tc.join(labels, "doc_id")
    term_class = (j.groupBy("term", "label")
                  .agg(F.sum("tf").cast("long").alias("cf_tc")))
    per_class = (j.groupBy("label")
                 .agg(F.countDistinct("doc_id").cast("long")
                      .alias("n_docs_c"),
                      F.sum("tf").cast("long").alias("tokens_c")))
    n_docs = labels.count()
    vocab = tc.select("term").distinct().count()
    class_stats = per_class.withColumn(
        "log_prior",
        F.round(F.log(F.col("n_docs_c") / F.lit(float(n_docs))), 6))
    return term_class, class_stats, int(vocab)


def nb_predict(tc: DataFrame, term_class: DataFrame,
               class_stats: DataFrame, vocab: int) -> DataFrame:
    """(doc_id, pred, score) — argmax class per doc, score rounded 6dp,
    class-name ascending tiebreak (the engine's pinned order)."""
    classes = class_stats.select("label", "tokens_c", "log_prior")
    grid = (tc.crossJoin(F.broadcast(classes))
            .join(term_class, ["term", "label"], "left"))
    log_lik = F.log((F.coalesce(F.col("cf_tc"), F.lit(0)) + 1.0)
                    / (F.col("tokens_c") + float(vocab)))
    scored = (grid.select("doc_id", "label", "log_prior",
                          (F.col("tf") * log_lik).alias("_part"))
              .groupBy("doc_id", "label", "log_prior")
              .agg(F.sum("_part").alias("_s"))
              .select("doc_id", "label",
                      F.round(F.col("log_prior") + F.col("_s"), 6)
                      .alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (scored.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("doc_id", F.col("label").alias("pred"), "score"))
