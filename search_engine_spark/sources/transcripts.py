"""Transcripts corpus sources (S1/S2 of SURVEY.md §2.1).

The engine's input is an Iceberg table of multi-turn conversation /
agent transcripts (BASELINE.json input_hint):

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

One row = one turn = one retrieval document (reference analogue: one
SGML <DOC> file read via the documents.list manifest,
src/invertedIndex.py:592,71-98 — the table IS the manifest, and the
columnar scan replaces per-file gzip opens).

Locally there is no Iceberg runtime jar, so ``read_transcripts`` falls
back to parquet; the format is a parameter so cluster deployments pass
"iceberg" unchanged.

Two corpus builders:
- ``generate_transcripts`` — deterministic seeded synthetic corpus per
  FIXTURES.md §1 (pure function of seed; used by pytest + bench).
- ``documents_as_transcripts`` — maps the driver-provided
  documents.parquet (doc_id, text, lang, source, n_chars) into the
  transcripts shape (doc_id→conv_id, turn_idx=0) so oracle-gated
  queries run on shared data.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..conf import load_stopwords

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _vocabulary(n: int = 5000, seed: int = 42) -> list[str]:
    """Synthetic vocabulary: 37 reference stopwords as the hottest
    terms (skew drivers) + generated alphabetic words."""
    rng = random.Random(seed)
    words = sorted(load_stopwords())
    seen = set(words)
    while len(words) < n:
        w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(3, 9)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def topic_vocab_slices(n_topics: int, vocab_size: int = 5000,
                       seed: int = 42) -> list[list[str]]:
    """The per-topic content-vocabulary slices used by topical
    generation (n_topics > 0): the non-stopword vocabulary split into
    n_topics disjoint contiguous slices. Exposed so bench/test query
    sampling draws from the same slices the generator used."""
    vocab = _vocabulary(vocab_size, seed)
    n_stop = len(load_stopwords())
    content = vocab[n_stop:]
    per = len(content) // n_topics
    return [content[t * per:(t + 1) * per] for t in range(n_topics)]


def generate_transcripts_rows(n_convs: int = 50, seed: int = 42,
                              vocab_size: int = 5000,
                              n_topics: int = 0) -> list[tuple]:
    """Deterministic transcript rows per FIXTURES.md §1 (no wall clock,
    no unseeded randomness). Zipf-ish vocabulary with stopwords hot.

    n_topics > 0 switches on TOPICAL structure (the selective-search
    fixture): each conversation draws a topic; 65% of its tokens come
    from that topic's disjoint content-vocabulary slice (Zipf within
    the slice), the rest from the global Zipf mix (stopwords hot) —
    the standard topical-corpus model selective search assumes
    (Kulkarni & Callan CIKM 2010). n_topics=0 is the legacy
    byte-identical behavior every existing fixture/golden pins."""
    rng = random.Random(seed)
    vocab = _vocabulary(vocab_size, seed)
    # Zipf(s≈1.1) weights over rank
    weights = [1.0 / (r + 1) ** 1.1 for r in range(len(vocab))]
    slices = topic_vocab_slices(n_topics, vocab_size, seed) if n_topics else []
    sweights = ([1.0 / (r + 1) ** 1.1 for r in range(len(slices[0]))]
                if n_topics else [])
    rows: list[tuple] = []
    row_no = 0
    for i in range(n_convs):
        conv = f"conv-{i:06d}"
        topic = rng.randrange(n_topics) if n_topics else -1
        n_turns = min(1 + int(rng.paretovariate(1.5)), 16)
        for t in range(n_turns):
            role = "tool" if rng.random() < 0.08 else ("user" if t % 2 == 0 else "assistant")
            if rng.random() < 0.01:
                text: str | None = rng.choice(["", "   ", None])
            else:
                n_tok = rng.randint(5, 120)
                if n_topics:
                    n_topical = sum(1 for _ in range(n_tok)
                                    if rng.random() < 0.65)
                    toks = rng.choices(slices[topic], weights=sweights,
                                       k=n_topical)
                    toks += rng.choices(vocab, weights=weights,
                                        k=n_tok - n_topical)
                    rng.shuffle(toks)
                else:
                    toks = rng.choices(vocab, weights=weights, k=n_tok)
                if rng.random() < 0.3:  # tf>1 runs: repeat a token burst
                    burst = rng.choice(toks)
                    toks.extend([burst] * rng.randint(1, 4))
                if rng.random() < 0.05:  # digit/punct junk the tokenizer strips
                    toks.append(rng.choice(["42", "x1__y", "a-b,c.", "__", "9lives"]))
                text = " ".join(toks)
            tool = f"tool-{rng.randint(0, 9)}" if role == "tool" else None
            ts = _EPOCH + dt.timedelta(seconds=row_no)
            rows.append((conv, t, role, text, tool, ts))
            row_no += 1
    return rows


def generate_transcripts(spark: SparkSession, n_convs: int = 50, seed: int = 42,
                         vocab_size: int = 5000, partitions: int | None = None,
                         n_topics: int = 0) -> DataFrame:
    rows = generate_transcripts_rows(n_convs, seed, vocab_size, n_topics)
    df = spark.createDataFrame(rows, schema=TRANSCRIPTS_SCHEMA)
    if partitions:
        df = df.repartition(partitions)
    return df


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map driver testdata documents.parquet into the transcripts shape.

    doc_id → conv_id (zero-padded for stable string ordering),
    turn_idx=0, role='user'. Lets the DuckDB oracle reproduce doc_id
    trivially (doc_id column is carried through the engine unchanged).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("conv-%010d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("doc_id"),  # pre-minted surrogate, kept for oracle parity
    )


def read_transcripts(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1/S2: scan the corpus table. fmt='iceberg' on clusters."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.format(fmt).load(path)
