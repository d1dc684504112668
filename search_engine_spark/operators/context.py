"""Conversation-context retrieval: attach the previous / next turn's
text to each search hit over a multi-turn transcripts corpus.

The reference engine ranks isolated documents; for agent-transcript
corpora (BASELINE.json input_hint: one row = one turn keyed by
(conv_id, turn_idx)) a hit is far more useful WITH its surrounding
turns — the classic "show context" feature of a conversation search UI.

Scale shape: the hit set is tiny (qids × k) while the turns table is
the 10^12-row corpus, so the corpus is touched exactly once via a
broadcast LEFT-SEMI join on the needed (conv_id, turn_idx) neighbor
keys — no shuffle of the big side, no self-join of turns with turns.
The surviving neighbor rows (≤ 2·|hits|) then broadcast-join back onto
the hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def turn_context(hits: DataFrame, turns: DataFrame,
                 text_col: str = "text") -> DataFrame:
    """hits: any columns + (conv_id, turn_idx); turns: (conv_id,
    turn_idx, text). Returns hits + prev_text/next_text (NULL at
    conversation boundaries or where the neighbor turn is absent)."""
    wanted = (hits.select(
        "conv_id",
        F.explode(F.array(F.col("turn_idx") - 1,
                          F.col("turn_idx") + 1)).alias("turn_idx"))
        .where(F.col("turn_idx") >= 0)
        .distinct())
    nbr = (turns.join(F.broadcast(wanted), ["conv_id", "turn_idx"],
                      "left_semi")
           .select("conv_id", "turn_idx", F.col(text_col).alias("_ctx")))
    prev = nbr.select("conv_id",
                      (F.col("turn_idx") + 1).alias("turn_idx"),
                      F.col("_ctx").alias("prev_text"))
    nxt = nbr.select("conv_id",
                     (F.col("turn_idx") - 1).alias("turn_idx"),
                     F.col("_ctx").alias("next_text"))
    return (hits.join(F.broadcast(prev), ["conv_id", "turn_idx"], "left")
                .join(F.broadcast(nxt), ["conv_id", "turn_idx"], "left"))
