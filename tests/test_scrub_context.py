"""Unit tests: repetition_stats fold, PII scrubbing, turn context."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators.context import turn_context
from search_engine_spark.operators.scrub import scrub_pii
from search_engine_spark.operators.textstats import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_checked(spark):
    out = {r.doc_id: r for r in repetition_stats(_docs(spark, [
        # 6 tokens, 'spam' x4 -> top1 4/6; bigram 'spam_spam' x3 -> 3/5;
        # trigrams: 4 total, 'spam_spam_spam' duplicated once -> 1/4 dup
        (1, "spam spam spam spam eggs ham"),
        (2, "all distinct words here now"),      # no repetition at all
        (3, "ab"),                                # 1 token: no bigrams
        (4, ""),                                  # empty
        (5, None),                                # null
    ])).collect()}
    r1 = out[1]
    assert r1.n_tokens == 6 and r1.top_unigram == 4 and r1.top_bigram == 3
    assert abs(r1.top_unigram_frac - round(4 / 6, 6)) < 1e-9
    assert abs(r1.top_bigram_frac - 3 / 5) < 1e-9
    assert abs(r1.dup_trigram_frac - 0.25) < 1e-9
    r2 = out[2]
    assert r2.top_unigram == 1 and r2.top_bigram == 1
    assert r2.dup_trigram_frac == 0.0
    r3 = out[3]
    assert r3.n_tokens == 1 and r3.top_bigram == 0
    assert r3.top_unigram_frac == 1.0 and r3.top_bigram_frac == 0.0
    for d in (4, 5):
        r = out[d]
        assert r.n_tokens == 0 and r.top_unigram_frac == 0.0
        assert r.top_bigram_frac == 0.0 and r.dup_trigram_frac == 0.0


def test_scrub_pii_redacts_and_counts(spark):
    out = {r.doc_id: r for r in scrub_pii(_docs(spark, [
        (1, "mail a.b-c@test.org and x@y.io ip 192.168.0.1 tel 555-123-4567"),
        (2, "clean text with no pii at all"),
        (3, None),
    ])).collect()}
    r1 = out[1]
    assert r1.n_email == 2 and r1.n_ipv4 == 1 and r1.n_phone == 1
    assert r1.text == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"
    r2 = out[2]
    assert (r2.n_email, r2.n_ipv4, r2.n_phone) == (0, 0, 0)
    assert r2.text == "clean text with no pii at all"
    assert out[3].text == ""  # null text -> scrubbed empty, not null


def test_scrub_pii_sequential_attribution(spark):
    # digits inside an email must not double-count as ip/phone once
    # the email is redacted first
    out = scrub_pii(_docs(spark, [
        (1, "v 1.2.3.4@host.com only"),
    ])).collect()[0]
    assert out.n_email == 1 and out.n_ipv4 == 0
    assert out.text == "v <EMAIL> only"


def test_turn_context_boundaries(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "t0"), ("c1", 1, "t1"), ("c1", 2, "t2"),
         ("c2", 0, "s0")],
        "conv_id string, turn_idx int, text string")
    hits = spark.createDataFrame(
        [("q1", "c1", 0), ("q1", "c1", 1), ("q1", "c1", 2),
         ("q2", "c2", 0)],
        "qid string, conv_id string, turn_idx int")
    out = {(r.qid, r.conv_id, r.turn_idx): r
           for r in turn_context(hits, turns).collect()}
    assert out[("q1", "c1", 0)].prev_text is None
    assert out[("q1", "c1", 0)].next_text == "t1"
    assert out[("q1", "c1", 1)].prev_text == "t0"
    assert out[("q1", "c1", 1)].next_text == "t2"
    assert out[("q1", "c1", 2)].next_text is None
    # single-turn conversation: both sides null
    r = out[("q2", "c2", 0)]
    assert r.prev_text is None and r.next_text is None
    # hit columns survive the joins
    assert r.qid == "q2"
