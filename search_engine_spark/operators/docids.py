"""DocID minting (P5 of SURVEY.md §2.2).

Reference analogue: string docids compressed to ints by prefix
substitution (truncateDocid/expandDocid,
src/invertedIndex.py:141-161). The rebuild mints a dense int64
surrogate ``doc_id`` = rank over ORDER BY (conv_id, turn_idx), plus a
``doc_map`` table to expand back.

Scale design: a naive ``row_number() OVER (ORDER BY ...)`` is a
single-partition global sort — a non-starter at 10^12 turns. Instead:

1. a thin seeded sample of conv_ids, CAPPED at ``sample_cap`` rows
   before anything reaches the driver (at 10^12 turns an uncapped
   distinct-sample would itself be billions of rows) → B-1 range
   splitters picked evenly from the sorted capped sample;
2. bucket each row by splitter rank (an O(B) aggregate expression,
   JVM-side — all rows of bucket i order before bucket i+1);
3. local rank within bucket (window partitioned by bucket — bounded
   partitions, sort-based, spills);
4. bucket row-counts → cumulative offsets (≤B rows on the driver) →
   broadcast-joined back; doc_id = offset + local_rank.

Total: one shuffle for the window + one broadcast join. Every driver
collect is bounded: the splitter sample by ``sample_cap``, the offset
table by ``n_buckets``. The final doc_id does NOT depend on where the
splitters land (any order-consistent bucketing yields the same global
rank), so the cap/limit cannot change results — splitter quality only
shapes partition balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_col(splitters: list[str]) -> F.Column:
    """Number of splitters <= conv_id — a branch-free searchsorted."""
    if not splitters:
        return F.lit(0)
    arr = F.array(*[F.lit(s) for s in splitters])
    return F.aggregate(
        arr, F.lit(0),
        lambda acc, s: acc + F.when(F.col("conv_id") >= s, 1).otherwise(0),
    )


def mint_doc_ids(transcripts: DataFrame, n_buckets: int = 64,
                 sample_fraction: float = 0.05, seed: int = 42,
                 sample_cap: int = 100_000) -> DataFrame:
    """Return transcripts + dense int64 ``doc_id`` ordered by
    (conv_id, turn_idx), without a global single-partition sort and
    without any unbounded driver-side collect."""
    spark = transcripts.sparkSession
    sample = (
        transcripts.select("conv_id")
        .sample(fraction=min(1.0, sample_fraction), seed=seed)
        .distinct().limit(sample_cap)
        .collect()
    )
    convs = sorted(r.conv_id for r in sample)
    if len(convs) > n_buckets:
        step = len(convs) / n_buckets
        splitters = sorted({convs[int(i * step)] for i in range(1, n_buckets)})
    else:
        splitters = convs[1:]

    bucketed = transcripts.withColumn("_bkt", _bucket_col(splitters))
    w = Window.partitionBy("_bkt").orderBy("conv_id", "turn_idx")
    ranked = bucketed.withColumn("_lrank", F.row_number().over(w))

    counts = (
        bucketed.groupBy("_bkt").agg(F.count("*").alias("_cnt"))
        .orderBy("_bkt").collect()
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r._bkt] = acc
        acc += r._cnt
    off_df = spark.createDataFrame(
        [(k, v) for k, v in offsets.items()], "_bkt int, _off long")
    return (
        ranked.join(F.broadcast(off_df), "_bkt")
        .withColumn("doc_id", (F.col("_off") + F.col("_lrank") - 1).cast("long"))
        .drop("_bkt", "_lrank", "_off")
    )


def doc_map(with_ids: DataFrame) -> DataFrame:
    """doc_map(doc_id, conv_id, turn_idx) — the expand-back table
    (reference expandDocid, src/invertedIndex.py:152-161)."""
    return with_ids.select("doc_id", "conv_id", "turn_idx")
