"""Streaming gates: incremental (micro-batched) ingest + compaction
must yield the IDENTICAL index to a one-shot batch build; windowed
aggregation with watermark runs end-to-end on the transcripts stream."""

from __future__ import annotations

import os

import pytest

from search_engine_spark.functions.tokenize import term_counts
from search_engine_spark.operators.index_build import postings_blocked, term_stats
from search_engine_spark.sources.transcripts import generate_transcripts
from search_engine_spark.operators.docids import mint_doc_ids
from search_engine_spark.streaming.index_stream import (IncrementalIndexer,
                                                        stream_transcripts,
                                                        windowed_turn_counts)


@pytest.fixture(scope="module")
def staged_corpus(spark, tmp_path_factory):
    """Transcripts written as 3 separate parquet files (arrival order)
    → the streaming source treats each as (part of) a micro-batch."""
    root = str(tmp_path_factory.mktemp("stream_src"))
    tw = mint_doc_ids(generate_transcripts(spark, n_convs=30, partitions=1)).cache()
    n = tw.count()
    cut1, cut2 = n // 3, 2 * n // 3
    from pyspark.sql import functions as F
    for i, (lo, hi) in enumerate([(0, cut1), (cut1, cut2), (cut2, n)]):
        (tw.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
         .coalesce(1).write.mode("overwrite").parquet(os.path.join(root, f"chunk{i}")))
    return root, tw, n


def test_incremental_equals_batch(spark, staged_corpus, tmp_path):
    root, tw, n = staged_corpus
    out = str(tmp_path / "inc_idx")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_transcripts(spark, f"{root}/chunk*", max_files_per_trigger=1)
    ix = IncrementalIndexer(out, salt_buckets=4, block=16)
    q = ix.attach(stream, ckpt, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive

    tables = ix.compact(spark, n)
    # identical (doc,term,tf) relation
    inc_tc = sorted(map(tuple, tables["term_counts"].collect()))
    bat_tc = sorted(map(tuple, term_counts(tw).select("doc_id", "term", "tf").collect()))
    assert inc_tc == bat_tc
    # identical df/cf dictionary
    inc_ts = sorted(map(tuple, tables["term_stats"].collect()))
    bat_ts = sorted(map(tuple, term_stats(term_counts(tw)).collect()))
    assert inc_ts == bat_ts
    # identical blocked index (incl. postings order and block metadata)
    def key(idx):
        return sorted((r.term, r.block_no, r.df, r.cf,
                       tuple((p.doc_id, p.tf) for p in r.postings))
                      for r in idx.collect())
    bat_idx = postings_blocked(term_counts(tw), n, salt_buckets=4, block=16)
    assert key(tables["index"]) == key(bat_idx)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState gap-sessionizer: events arrive in 3
    time-ordered micro-batches whose cuts fall mid-session; every
    CLOSED session must match the batch sessionizer exactly (the
    trailing open session per user stays in state and is withheld)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from search_engine_spark.streaming.sessionize_stream import sessionize_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.orderBy("ts", "event_id")
    evr = ev.withColumn("_rn", F.row_number().over(w)).cache()
    n = evr.count()
    root = tmp_path / "ev_src"
    cut1, cut2 = n // 3, 2 * n // 3
    for i, (lo, hi) in enumerate([(0, cut1), (cut1, cut2), (cut2, n)]):
        (evr.where((F.col("_rn") > lo) & (F.col("_rn") <= hi)).drop("_rn")
         .coalesce(1).write.mode("overwrite").parquet(str(root / f"chunk{i}")))

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{root}/chunk*"))
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sess_closed")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck_sess")).start())
    q.awaitTermination(120)
    assert not q.isActive
    got = {(r.user_id, r.start_us, r.end_us, r.n_events, round(r.sum_value, 4))
           for r in spark.sql("select * from sess_closed").collect()}

    evb = ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    wb = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(wb)
    new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    s = evb.withColumn("sno", F.sum(new).over(
        wb.rowsBetween(Window.unboundedPreceding, 0)))
    agg = s.groupBy("user_id", "sno").agg(
        F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sv"))
    wl = Window.partitionBy("user_id").orderBy(F.desc("sno"))
    closed = agg.withColumn("_r", F.row_number().over(wl)).where(F.col("_r") > 1)
    exp = {(str(r.user_id), r.start_us, r.end_us, r.n_events, r.sv)
           for r in closed.collect()}
    assert len(got) > 0 and got == exp


def test_windowed_turn_counts_with_watermark(spark, staged_corpus, tmp_path):
    # fixture ts spans ~80 seconds (1 turn/sec), so windows are seconds-
    # sized and chunks arrive as separate micro-batches to advance the
    # watermark (append mode only emits windows the watermark closed)
    root, tw, n = staged_corpus
    stream = stream_transcripts(spark, f"{root}/chunk*", max_files_per_trigger=1)
    agg = windowed_turn_counts(stream, window="20 seconds", watermark="5 seconds")
    q = (agg.writeStream.format("memory").queryName("turn_windows")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt_w")).start())
    q.awaitTermination(120)
    got = spark.sql("select * from turn_windows").collect()
    # append mode emits only windows closed by the watermark; the final
    # (still-open) windows are withheld — so compare against the batch
    # aggregate restricted to emitted windows, which must match exactly.
    from pyspark.sql import functions as F
    batch = (tw.groupBy(F.window("ts", "20 seconds").alias("w"), "role")
             .agg(F.count("*").alias("n_turns"))
             .select(F.col("w.start").alias("ws"), "role", "n_turns").collect())
    batch_map = {(r.ws, r.role): r.n_turns for r in batch}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r.window_start, r.role)] == r.n_turns


def test_stateful_sessionize_out_of_order_late_event(spark, tmp_path):
    """A late event that PREDATES the carried session's start but sits
    within gap of its end must merge with start_us = min(carried,
    late) — the ADVICE-r2 edge where the old merge kept the carried
    start and silently mis-stamped the session."""
    import datetime as dt

    from pyspark.sql import types as T
    from search_engine_spark.streaming.sessionize_stream import sessionize_stream

    schema = T.StructType([
        T.StructField("user_id", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731
    batches = [
        [("u1", 1, t(1000), 1.0), ("u1", 2, t(1100), 2.0)],
        # late event at 900 (before the carried start) + a far event
        # that closes the merged session
        [("u1", 3, t(900), 4.0), ("u1", 4, t(100000), 8.0)],
    ]
    root = tmp_path / "late_src"
    for i, rows in enumerate(batches):
        (spark.createDataFrame(rows, schema).coalesce(1)
         .write.mode("overwrite").parquet(str(root / f"chunk{i}")))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{root}/chunk*"))
    q = (sessionize_stream(stream, gap_minutes=30)
         .writeStream.format("memory").queryName("sess_late")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck_late")).start())
    q.awaitTermination(120)
    got = [(r.user_id, r.start_us, r.end_us, r.n_events, r.sum_value)
           for r in spark.sql("select * from sess_late").collect()]
    base = int(t(0).replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert got == [("u1", base + 900 * 1_000_000, base + 1100 * 1_000_000,
                    3, 7.0)]


def test_windowed_event_counts_exact_with_sentinel(spark, tmp_path):
    """windowed_event_counts in append mode emits exactly the batch
    tumbling-window aggregate once a sentinel advances the watermark
    past every real window (the window_counts_stream gate mechanism),
    and the sentinel's own open window is withheld."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from search_engine_spark.streaming.index_stream import windowed_event_counts

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(minute, typ, val):
        return (t0 + dt.timedelta(minutes=minute), typ, val)

    batches = [
        [ev(0, "a", 1.0), ev(5, "b", 2.0), ev(12, "a", 3.0)],
        [ev(21, "a", 4.0), ev(25, "b", 5.0)],
        # sentinel: 1 day later, watermark (10 min) passes all windows
        [ev(24 * 60, "flush", 0.0)],
    ]
    root = tmp_path / "src"
    root.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        d = str(root / f"chunk{i}")
        df.write.mode("overwrite").parquet(d)
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (1_000_000_000 + 10 * i,) * 2)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(root / "chunk*")))
    q = (windowed_event_counts(stream, window="10 minutes",
                               watermark="10 minutes")
         .writeStream.format("memory").queryName("win_exact")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    q.awaitTermination(120)
    got = {(r.window_start, r.event_type): (r.n, r.sum_value)
           for r in spark.table("win_exact").collect()}
    base = int(t0.timestamp())
    assert got == {
        (base, "a"): (1, 1.0), (base, "b"): (1, 2.0),
        (base + 600, "a"): (1, 3.0),
        (base + 1200, "a"): (1, 4.0), (base + 1200, "b"): (1, 5.0),
    }  # the sentinel's own window is NOT emitted


def test_stateful_dedup_stream_drops_cross_batch(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch must be dropped by
    the carried state; in-batch duplicates keep the min doc_id."""
    from search_engine_spark.streaming.dedup_stream import dedup_stream
    root = tmp_path / "dd_src"
    root.mkdir()
    b0 = [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")]  # in-batch dup
    b1 = [(4, "alpha beta"), (5, "delta")]                     # cross-batch dup
    b2 = [(6, "gamma"), (7, "delta"), (8, "epsilon")]
    for i, rows in enumerate([b0, b1, b2]):
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.mode("overwrite").parquet(str(root / f"chunk{i}")))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(f"{root}/chunk*"))
    out = str(tmp_path / "dd_out")
    q = (dedup_stream(stream).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "dd_ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(240)
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    # one keeper per distinct text: alpha beta→1, gamma→2, delta→5,
    # epsilon→8; docs 3 (in-batch), 4, 6, 7 (cross-batch) are dropped
    assert kept == {1, 2, 5, 8}


def test_local_bands_equal_batch_lsh_bands(spark, staged_corpus):
    """The streaming-safe row-local band computation must be
    byte-identical to the batch groupBy path on a real corpus."""
    from search_engine_spark.operators.dedup import lsh_bands
    from search_engine_spark.streaming.lsh_dedup_stream import local_bands
    _root, tw, _n = staged_corpus
    docs = tw.select("doc_id", "text")
    a = {(r.doc_id, r.band_no, r.band_hash) for r in lsh_bands(docs).collect()}
    b = {(r.doc_id, r.band_no, r.band_hash) for r in local_bands(docs).collect()}
    assert a == b and len(a) > 0


def test_stateful_lsh_dedup_stream_flags_cross_batch(spark, tmp_path):
    """Near-dups arriving in later micro-batches (or later in the same
    batch) are flagged; keepers are the min doc_id of every bucket they
    occupy. Texts 1/3/4 are identical (same buckets); 2/6 identical;
    5 and 8 unique."""
    from search_engine_spark.streaming.lsh_dedup_stream import lsh_dedup_stream
    import pyspark.sql.functions as F
    long_a = "the quick brown fox jumps over the lazy dog again and again"
    long_b = "pack my box with five dozen liquor jugs every single day ok"
    b0 = [(1, long_a), (2, long_b), (3, long_a)]
    b1 = [(4, long_a), (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do")]
    b2 = [(6, long_b), (8, "sphinx of black quartz judge my vow now and here today")]
    root = tmp_path / "lsh_src"
    root.mkdir()
    for i, rows in enumerate([b0, b1, b2]):
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.mode("overwrite").parquet(str(root / f"chunk{i}")))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(f"{root}/chunk*"))
    out = str(tmp_path / "lsh_out")
    q = (lsh_dedup_stream(stream).writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "lsh_ck"))
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(240)
    res = spark.read.parquet(out)
    flagged = {r.doc_id for r in
               res.where(~F.col("is_first")).select("doc_id").distinct().collect()}
    assert flagged == {3, 4, 6}
