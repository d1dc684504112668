from __future__ import annotations

import datetime as dt
import sys
import os

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from pyspark.sql import functions as F

from search_engine_spark.operators.conversations import (
    conv_stats, conv_topk, reply_latency, role_transitions, tool_stats)
from search_engine_spark.sources.transcripts import generate_transcripts


def _ts(s: int):
    return dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_conv_stats_invariants(spark):
    t = generate_transcripts(spark, n_convs=50, seed=42, partitions=4)
    cs = conv_stats(t).collect()
    assert len(cs) == t.select("conv_id").distinct().count()
    total = t.count()
    assert sum(r.n_turns for r in cs) == total
    for r in cs:
        assert r.n_turns == r.n_user + r.n_assistant + r.n_tool
        assert r.duration_s >= 0
        assert r.n_tools <= r.n_tool
        assert abs(r.avg_turn_tokens * r.n_turns - r.n_tokens) < 1e-6 * max(r.n_tokens, 1)


def test_role_transitions_partition(spark):
    t = generate_transcripts(spark, n_convs=50, seed=42, partitions=4)
    tr = role_transitions(t).collect()
    # every turn contributes exactly one (from, to) edge, openers from START
    assert sum(r.n for r in tr) == t.count()
    starts = sum(r.n for r in tr if r.from_role == "START")
    assert starts == t.select("conv_id").distinct().count()


def test_tool_stats_totals(spark):
    t = generate_transcripts(spark, n_convs=50, seed=42, partitions=4)
    st = tool_stats(t).collect()
    n_tool_turns = t.where(F.col("tool").isNotNull()).count()
    assert sum(r.n_calls for r in st) == n_tool_turns
    for r in st:
        assert r.n_convs <= r.n_calls


def test_reply_latency_exact(spark):
    rows = [
        # conv a: user@0 -> assistant@7 (gap 7), tool@9, assistant@15 (no user prev)
        ("a", 0, "user", "x", None, _ts(0)),
        ("a", 1, "assistant", "y", None, _ts(7)),
        ("a", 2, "tool", "z", "tool-1", _ts(9)),
        ("a", 3, "assistant", "w", None, _ts(15)),
        # conv b: user@0 -> assistant@3 (gap 3), user@4 -> assistant@10 (gap 6)
        ("b", 0, "user", "x", None, _ts(0)),
        ("b", 1, "assistant", "y", None, _ts(3)),
        ("b", 2, "user", "z", None, _ts(4)),
        ("b", 3, "assistant", "w", None, _ts(10)),
        # conv c: assistant only — absent from output
        ("c", 0, "assistant", "x", None, _ts(0)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    out = {r.conv_id: r for r in reply_latency(t).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_replies == 1 and out["a"].avg_gap_s == 7.0 and out["a"].max_gap_s == 7
    assert out["b"].n_replies == 2 and out["b"].avg_gap_s == 4.5 and out["b"].max_gap_s == 6


def test_conv_dedup_groups_and_boundaries(spark):
    from search_engine_spark.operators.conversations import conv_dedup
    rows = [
        ("a", 0, "hello there"), ("a", 1, "hi"),
        ("b", 0, "hello there"), ("b", 1, "hi"),      # exact dup of a
        ("c", 0, "hello"), ("c", 1, "there hi"),      # same concat words, different boundaries
        ("d", 1, "hi"), ("d", 0, "hello there"),      # a's turns out of input order -> still dup of a
        ("e", 0, "solo"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r.conv_id: r for r in conv_dedup(t).collect()}
    assert out["a"].sig == out["b"].sig == out["d"].sig
    assert out["c"].sig != out["a"].sig               # separator pins boundaries
    grp = {out[k].keeper_conv_id for k in ("a", "b", "d")}
    assert grp == {"a"} and out["a"].n_convs == 3
    assert out["a"].is_keeper and not out["b"].is_keeper
    assert out["e"].is_keeper and out["e"].n_convs == 1


def test_conv_topk_top_m_and_ties(spark):
    rows = [
        # conv 1: turns 10,11,12,13 with scores 5,4,3,2 -> top-3 sum 12
        ("q1", 1, 10, 5.0), ("q1", 1, 11, 4.0), ("q1", 1, 12, 3.0), ("q1", 1, 13, 2.0),
        # conv 2: one strong turn 9 -> sum 9
        ("q1", 2, 20, 9.0),
        # conv 3: ties with conv 1 on 12.0 -> conv_id tiebreak puts 1 first
        ("q1", 3, 30, 6.0), ("q1", 3, 31, 6.0),
    ]
    scored = spark.createDataFrame(
        rows, "qid string, conv_id long, doc_id long, score double")
    out = conv_topk(scored, k=10, m=3).orderBy("rank").collect()
    assert [r.conv_id for r in out] == [1, 3, 2]
    assert [r.conv_score for r in out] == [12.0, 12.0, 9.0]
    assert out[0].n_turns_scored == 3 and out[0].best_doc_id == 10
    assert out[1].best_doc_id == 30  # score tie inside conv: doc_id asc wins
    assert out[2].best_score == 9.0


def test_split_assign_conv_consistent(spark):
    from search_engine_spark.operators.conversations import split_assign
    t = generate_transcripts(spark, n_convs=200, seed=42, partitions=4)
    t = t.withColumn("doc_id", F.monotonically_increasing_id())
    out = split_assign(t, val_permille=100, test_permille=100)
    # every turn of a conversation shares its split
    per_conv = (out.groupBy("conv_id")
                .agg(F.count_distinct("split").alias("k")).collect())
    assert all(r.k == 1 for r in per_conv)
    # all three splits materialize at 80/10/10 on 200 convs
    sizes = {r.split: r.n for r in
             out.select("conv_id", "split").distinct()
                .groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] and sizes["train"] > sizes["test"]
