"""Corpus-lifecycle operators: snapshot diffing and index content
checksums — the ops tooling a 1000-shard deployment runs between
builds.

corpus_diff feeds incremental indexing: at 10^12 turns a full rebuild
for a 0.1% daily delta is absurd; the diff (one full-outer equi-join
on doc_id comparing md5(text)) is exactly the added/removed/changed
partition that the delta/tombstone serving path
(streaming/index_stream.py, operators/deletes.py) consumes.

index_checksums makes shard-content verification O(buckets): each
term_bucket reduces to one md5 over its canonically-ordered posting
triples, so two replicas (or a pre/post-migration pair, e.g. the
16-bucket reshard of resharded_postings) compare in a broadcast-sized
relation instead of re-scanning postings. The inner string_agg is
per-bucket but bucket contents are bounded by the bucket partitioning
the index already maintains; canonical order (term, doc_id) makes the
checksum layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, change) — 'added' | 'removed' | 'changed' rows between
    two corpus snapshots (unchanged docs are not emitted). One
    full-outer equi-join on doc_id; text never shuffles — both sides
    reduce to (doc_id, md5) projections first."""
    o = old.select(F.col("doc_id").cast("long").alias("doc_id"),
                   F.md5("text").alias("_oh"))
    n = new.select(F.col("doc_id").cast("long").alias("doc_id"),
                   F.md5("text").alias("_nh"))
    j = o.join(n, "doc_id", "full_outer")
    change = (F.when(F.col("_oh").isNull(), "added")
              .when(F.col("_nh").isNull(), "removed")
              .when(F.col("_oh") != F.col("_nh"), "changed"))
    return (j.select("doc_id", change.alias("change"))
            .where(F.col("change").isNotNull()))


def index_checksums(tc: DataFrame, n_buckets: int = 16) -> DataFrame:
    """(bucket, n_postings, checksum) — per term bucket, the XOR of
    the md5-60-bit hashes of its 'term:doc_id:tf' posting triples,
    plus the row count.

    XOR is commutative and associative with CONSTANT aggregate state,
    so the checksum is order/partitioning-independent and map-side
    combinable — unlike a sorted-concat digest, which would
    materialize a whole bucket (vocab/n_buckets posting rows, GBs for
    a stopword-heavy bucket at 10^12 docs) in one aggregation row.
    Posting triples are unique by construction (tc is keyed by
    (doc_id, term)), so XOR's pair-cancellation blindspot cannot
    trigger; the (checksum, n_postings) pair is the replica /
    pre-vs-post-migration content check.

    bucket = md5-hash of term mod n_buckets (the engine-portable
    bucketing the committed index uses), so the checksum relation is
    O(n_buckets) and replica comparison is a broadcast join, not a
    posting re-scan."""
    bucket = (F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
              .cast("long") % n_buckets).cast("int")
    triple = F.concat_ws(":", F.col("term"),
                         F.col("doc_id").cast("string"),
                         F.col("tf").cast("string"))
    h = F.conv(F.substring(F.md5(triple), 1, 15), 16, 10).cast("long")
    return (tc.select(bucket.alias("bucket"), h.alias("_h"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_postings"),
                 F.bit_xor("_h").alias("checksum")))
