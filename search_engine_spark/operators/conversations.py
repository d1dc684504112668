"""Conversation-level analytics and retrieval over the transcripts
shape (conv_id, turn_idx, role, text, tool, ts).

The reference indexes each turn as an independent document
(/root/reference/src/invertedIndex.py:71-98 parses one <DOC> per
unit); these operators add the layer a transcripts corpus needs ON TOP
of turn-level retrieval: per-conversation aggregates, role-transition
structure, tool-usage accounting, reply latency, and
conversation-level top-k (rank conversations, not turns).

Scale shapes (10^12 turns):
- conv_stats / tool_stats: one hash aggregation each, map-side partial
  combine; no window, no explode.
- role_transitions / reply_latency: one lag window partitioned by
  conv_id — per-partition state is the conversation length (FIXTURES
  caps it at 16; real transcripts are similarly bounded), so no
  reducer ever sees more than one conversation's turns...
  followed by a hash agg (transitions) or per-conv agg (latency).
- conv_topk: turn scores aggregate per (qid, conv) with a bounded
  per-conv top-m (window partitioned by (qid, conv_id) — partition
  size = turns-per-conv, bounded), then one per-qid rank window over
  per-conv rows, the same WindowGroupLimit shape as bm25_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.tokenize import tokens_col


def conv_stats(turns: DataFrame) -> DataFrame:
    """Per-conversation aggregates: turn counts (total and per role),
    token totals, distinct tools invoked, and wall-clock duration.

    One groupBy(conv_id) — map-side combine makes this a single
    shuffle of one row per conversation regardless of corpus size.
    """
    n_tok = F.size(tokens_col("text"))
    ts_s = F.unix_seconds(F.col("ts").cast("timestamp"))
    return (turns
            .select("conv_id", "role", "tool", ts_s.alias("_ts_s"),
                    n_tok.alias("_n_tok"))
            .groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
                  .cast("long").alias("n_user"),
                 F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
                  .cast("long").alias("n_assistant"),
                 F.sum(F.when(F.col("role") == "tool", 1).otherwise(0))
                  .cast("long").alias("n_tool"),
                 F.sum("_n_tok").cast("long").alias("n_tokens"),
                 F.count_distinct("tool").cast("long").alias("n_tools"),
                 (F.max("_ts_s") - F.min("_ts_s")).cast("long")
                  .alias("duration_s"),
                 F.round(F.avg(F.col("_n_tok").cast("double")), 6)
                  .alias("avg_turn_tokens")))


def role_transitions(turns: DataFrame) -> DataFrame:
    """Turn-taking structure: counts of (from_role → to_role) over
    consecutive turns within each conversation, plus '∅' (START) for
    each conversation-opening turn.

    lag window partitioned by conv_id (bounded partitions), then one
    hash agg over ≤ |roles|²+|roles| rows.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (turns
            .select("conv_id", "turn_idx", "role")
            .withColumn("from_role",
                        F.coalesce(F.lag("role").over(w), F.lit("START")))
            .groupBy(F.col("from_role"), F.col("role").alias("to_role"))
            .agg(F.count("*").cast("long").alias("n")))


def tool_stats(turns: DataFrame) -> DataFrame:
    """Per-tool usage accounting over tool-role turns: call count,
    distinct conversations reached, token volume of tool output.

    Filter + one groupBy(tool); the filter prunes non-tool turns at
    the scan when `tool IS NOT NULL` is pushed down.
    """
    n_tok = F.size(tokens_col("text"))
    return (turns
            .where(F.col("tool").isNotNull())
            .select("tool", "conv_id", n_tok.alias("_n_tok"))
            .groupBy("tool")
            .agg(F.count("*").cast("long").alias("n_calls"),
                 F.count_distinct("conv_id").cast("long").alias("n_convs"),
                 F.sum("_n_tok").cast("long").alias("n_tokens"),
                 F.round(F.avg(F.col("_n_tok").cast("double")), 6)
                  .alias("avg_tokens")))


def reply_latency(turns: DataFrame) -> DataFrame:
    """Per-conversation assistant reply latency: for every
    user→assistant adjacent turn pair, the ts gap in seconds;
    aggregated to (n_replies, avg_gap_s, max_gap_s) per conversation.

    One lag window partitioned by conv_id (bounded partitions) + one
    per-conv agg. Conversations with no user→assistant adjacency are
    absent (inner semantics), matching the SQL oracle.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ts_s = F.unix_seconds(F.col("ts").cast("timestamp"))
    gaps = (turns
            .select("conv_id", "turn_idx", "role", ts_s.alias("_ts_s"))
            .withColumn("prev_role", F.lag("role").over(w))
            .withColumn("gap_s", (F.col("_ts_s")
                                  - F.lag("_ts_s").over(w)).cast("long"))
            .where((F.col("prev_role") == "user")
                   & (F.col("role") == "assistant")))
    return (gaps.groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_replies"),
                 F.round(F.avg(F.col("gap_s").cast("double")), 6)
                  .alias("avg_gap_s"),
                 F.max("gap_s").cast("long").alias("max_gap_s")))


def conv_dedup(turns: DataFrame) -> DataFrame:
    """Exact CONVERSATION-level dedup: two conversations are duplicates
    when their full turn-text sequences are byte-identical in turn
    order. Output per conv: the md5 signature, the group keeper
    (min conv_id), group size, and the keep/drop verdict — the unit a
    transcripts corpus actually dedups at (turn-level exact dedup
    keeps one copy of EVERY common utterance; conversation identity is
    the sequence).

    Signature: md5 of the \\x01-joined turn texts in turn_idx order
    (the separator pins turn boundaries, so ["ab","c"] ≠ ["a","bc"];
    NULL turns are skipped by both engines' join semantics —
    documented, deterministic). Scale shape: one groupBy(conv_id) with
    a sorted-collect signature (per-group state = one conversation,
    bounded), then ONE window partitioned by sig whose partitions are
    duplicate-group-sized — no self-join, no global ordering.
    """
    sig = F.md5(F.concat_ws("\x01", F.transform(
        F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
        lambda s: s["text"])))
    per_conv = (turns.groupBy("conv_id")
                .agg(sig.alias("sig"),
                     F.count("*").cast("long").alias("n_turns")))
    w = Window.partitionBy("sig")
    return (per_conv
            .withColumn("keeper_conv_id", F.min("conv_id").over(w))
            .withColumn("n_convs", F.count("*").over(w).cast("long"))
            .select("conv_id", "sig", "n_turns", "keeper_conv_id",
                    "n_convs",
                    (F.col("conv_id") == F.col("keeper_conv_id"))
                    .alias("is_keeper")))


def split_assign(turns: DataFrame, val_permille: int = 10,
                 test_permille: int = 10) -> DataFrame:
    """(doc_id, conv_id, split) — leakage-safe train/val/test
    assignment at CONVERSATION granularity: the portable md5 coin
    (md5(conv_id)[:15] as a 60-bit int, mod 1000) buckets each
    conversation, so every turn of a conversation lands in the same
    split BY CONSTRUCTION — the split-leakage guard a transcripts
    corpus needs (turn-level splitting leaks near-verbatim context
    across the boundary).

    Scale shape: pure projection — the coin is a per-row expression on
    conv_id, ZERO shuffles at any corpus size (same coin as
    stratified_sample / pack_bins, so split ∘ sample compose without
    correlation only if their salts differ — conv_id vs doc_id keys
    here).
    """
    train_lo = 1000 - int(val_permille) - int(test_permille)
    coin = (F.conv(F.substring(F.md5(F.col("conv_id").cast("string")),
                               1, 15), 16, 10).cast("long") % 1000)
    split = (F.when(coin < train_lo, "train")
             .when(coin < train_lo + int(val_permille), "val")
             .otherwise("test"))
    return turns.select("doc_id", "conv_id", split.alias("split"))


def conv_topk(scored_turns: DataFrame, k: int = 10, m: int = 3) -> DataFrame:
    """Conversation-level retrieval: rank CONVERSATIONS per query by
    the sum of their top-m turn BM25 scores (rounded turn scores in,
    deterministic doc_id tiebreak), returning per (qid, conv) the
    aggregate score, contributing-turn count, and the best turn.

    Input: (qid, conv_id, doc_id, score) turn-level candidates with
    score already rounded (6dp).

    Plan: per-(qid, conv) top-m via a window whose partitions are
    bounded by turns-per-conversation; per-conv agg; then the one
    per-qid rank window over per-conv rows — the standard
    WindowGroupLimit top-k shape, input already reduced to one row
    per candidate conversation.
    """
    w_turn = (Window.partitionBy("qid", "conv_id")
              .orderBy(F.col("score").desc(), F.col("doc_id")))
    top_m = (scored_turns
             .withColumn("_r", F.row_number().over(w_turn))
             .where(F.col("_r") <= m))
    per_conv = (top_m.groupBy("qid", "conv_id")
                .agg(F.round(F.sum("score"), 6).alias("conv_score"),
                     F.count("*").cast("long").alias("n_turns_scored"),
                     F.min_by("doc_id", "_r").alias("best_doc_id"),
                     F.max("score").alias("best_score")))
    w_conv = (Window.partitionBy("qid")
              .orderBy(F.col("conv_score").desc(), F.col("conv_id")))
    return (per_conv
            .withColumn("rank", F.row_number().over(w_conv).cast("int"))
            .where(F.col("rank") <= k)
            .select("qid", "conv_id", "rank", "conv_score",
                    "n_turns_scored", "best_doc_id", "best_score"))
