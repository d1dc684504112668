"""Structured-Streaming surfaces: incremental index maintenance and
windowed transcript analytics.

The reference is strictly batch (build once, query after —
/root/reference/src/run), but a 10^12-turn transcripts table is
append-only in practice, so the rebuild adds the streaming ingest path
Spark gives for free:

- `stream_transcripts`    readStream over the transcripts directory
                          (file source; Iceberg streaming source on
                          clusters — same dataflow).
- `incremental_term_counts`  the SAME Arrow tokenize-and-count
                          transformation applied to the stream
                          (stateless ⇒ identical semantics per batch).
- `IncrementalIndexer`    foreachBatch sink: appends each micro-batch's
                          (doc_id, term, tf) delta as a committed
                          parquet delta + batch manifest, then
                          `compact()` folds accumulated deltas through
                          the SAME postings_blocked builder the batch
                          path uses. (Delta-append + periodic compaction
                          is the log-structured-merge shape; on Iceberg
                          the append is a table commit and compaction a
                          rewrite — identical topology.)
- `windowed_turn_counts`  event-time tumbling-window per-role turn
                          counts with a watermark for late turns — the
                          monitoring-side aggregate.

Invariant (tested): stream-ingesting a corpus in any number of
micro-batches then compacting yields the identical index tables to a
one-shot batch build — same rows, same df/cf, same blocks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..conf import POSTING_BLOCK
from ..functions.tokenize import term_counts
from ..operators.index_build import doc_stats, postings_blocked, term_stats
from ..sources.transcripts import TRANSCRIPTS_SCHEMA


def stream_transcripts(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None,
                       with_doc_id: bool = True) -> DataFrame:
    """readStream over a transcripts parquet directory. On a cluster the
    same call with format('iceberg') streams table snapshots.

    with_doc_id expects the stored files to already carry the minted
    surrogate (streamed ingest appends rows, so the offline
    (conv_id, turn_idx) rank is assigned upstream at append time —
    a global re-rank is not an online operation)."""
    schema = TRANSCRIPTS_SCHEMA
    if with_doc_id:
        import pyspark.sql.types as T
        schema = T.StructType(list(TRANSCRIPTS_SCHEMA.fields)
                              + [T.StructField("doc_id", T.LongType(), False)])
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def incremental_term_counts(stream: DataFrame) -> DataFrame:
    """Stateless per-batch tokenize+count — reuses the batch Arrow UDF
    unchanged (doc identity must ride in a `doc_id` column)."""
    return term_counts(stream)


class IncrementalIndexer:
    """foreachBatch sink: delta-append + compaction."""

    def __init__(self, out_dir: str, salt_buckets: int | None = None,
                 block: int = POSTING_BLOCK):
        self.out_dir = out_dir
        self.delta_dir = os.path.join(out_dir, "tc_delta")
        self.salt_buckets = salt_buckets
        self.block = block

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Append this micro-batch's term counts as a delta partition.
        Parquet append is atomic per job commit; batch_id rides along
        for idempotent replay (exactly-once on restart: a re-delivered
        batch overwrites its own partition)."""
        (term_counts(batch_df)
         .withColumn("_batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id")
         .parquet(self.delta_dir))

    def attach(self, stream: DataFrame, checkpoint_dir: str,
               available_now: bool = True):
        """Start the stream into this indexer (availableNow drains the
        current backlog then stops — the testable trigger)."""
        w = (stream.writeStream
             .foreachBatch(self.process_batch)
             .option("checkpointLocation", checkpoint_dir))
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def accumulated_term_counts(self, spark: SparkSession) -> DataFrame:
        return (spark.read.parquet(self.delta_dir)
                .select("doc_id", "term", "tf"))

    def compact(self, spark: SparkSession, n_docs: int,
                with_dl: bool = False) -> dict[str, DataFrame]:
        """Fold all deltas through the batch builders → the exact batch
        index tables (doc_stats / term_stats / blocked index)."""
        tc = self.accumulated_term_counts(spark)
        ds = doc_stats(tc)
        idx = postings_blocked(tc, n_docs, salt_buckets=self.salt_buckets,
                               block=self.block, ds=ds if with_dl else None)
        return {"term_counts": tc, "doc_stats": ds,
                "term_stats": term_stats(tc), "index": idx}


def windowed_event_counts(stream: DataFrame, window: str = "6 hours",
                          watermark: str = "1 hour",
                          key_col: str = "event_type",
                          ts_col: str = "ts",
                          val_col: str | None = "value") -> DataFrame:
    """EXACT event-time tumbling-window counts (+ value sum) per key —
    the oracle-checkable twin of `windowed_turn_counts` (which uses
    approx_count_distinct and so can only be sanity-tested). State for
    windows older than the watermark is dropped: bounded memory no
    matter how long the stream runs; in append mode a window is emitted
    exactly once, when the watermark passes its end."""
    aggs = [F.count("*").cast("long").alias("n")]
    out_cols = ["n"]
    if val_col is not None:
        aggs.append(F.round(F.sum(val_col), 4).alias("sum_value"))
        out_cols.append("sum_value")
    # watermarks require TIMESTAMP (LTZ); parquet event times arrive as
    # TIMESTAMP_NTZ. The session tz is pinned to UTC (session.py), so
    # the cast preserves the epoch instant exactly (oracle parity).
    return (stream
            .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window).alias("w"), key_col)
            .agg(*aggs)
            .select(F.col("w.start").cast("long").alias("window_start"),
                    key_col, *out_cols))


def windowed_turn_counts(stream: DataFrame, window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Event-time tumbling-window per-role turn counts with a watermark
    for late turns (Structured Streaming's stateful agg; state for
    windows older than the watermark is dropped — bounded memory at
    10^12-turn scale)."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "role")
            .agg(F.count("*").alias("n_turns"),
                 F.approx_count_distinct("conv_id").alias("n_convs"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "role", "n_turns", "n_convs"))
