"""Benchmark driver: runs the headline engine workloads at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_sec", "value": <total>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "build_turns_per_sec": ..., "bm25_p50_ms": ...}

Workloads:
- index_build: full build (Arrow tokenizer → doc_stats + salted blocked
  postings) over the documents corpus replicated ×REP to a realistic
  turn count; throughput reported as turns/sec.
- bm25_query: top-k BM25 over the built (cached) index for the fixed
  query set; p50 latency over N_REPEAT runs.
- a representative slice of the oracle-gated operator suite.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from search_engine_spark.session import get_spark
from search_engine_spark.conf import QUERY_SET
from search_engine_spark.functions.tokenize import term_counts
from search_engine_spark.operators.index_build import (doc_stats,
                                                       postings_blocked,
                                                       term_stats)
from search_engine_spark.operators.query import bm25_topk_from_index, query_terms_df
from search_engine_spark import entry_queries as EQ

REP = int(os.environ.get("BENCH_REPLICATION", "40"))
N_REPEAT = int(os.environ.get("BENCH_QUERY_REPEATS", "5"))


def replicated_transcripts(spark, sf_dir: str, rep: int, partitions: int = 64):
    """Deterministic corpus scale-up: documents × rep (distinct doc_ids),
    all Spark-side (no driver loop).

    The sf parquet is a single small file → ONE input partition; the
    repartition before the explode is what actually spreads the corpus
    across the executor threads (a real 100 TB table arrives in
    thousands of file splits and doesn't need this)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    return (docs.repartition(partitions)
            .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
            .select((F.col("doc_id") + F.col("r") * n).alias("doc_id"), "text"),
            n * rep)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app="bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- index build -----------------------------------------------------
    t0 = time.time()
    corpus, n_turns = replicated_transcripts(spark, sf_dir, REP, partitions=cpus * 2)
    tc = term_counts(corpus)
    ds = doc_stats(tc)
    idx = postings_blocked(tc, n_turns)
    # materialize both sinks (cache = stand-in for the Iceberg write)
    ds = ds.cache(); n_scored = ds.count()
    idx = idx.cache(); n_blocks = idx.count()
    build_sec = time.time() - t0
    timings["index_build"] = round(build_sec, 3)
    extras["build_turns_per_sec"] = round(n_turns / build_sec, 1)
    extras["n_turns"] = n_turns
    extras["n_index_blocks"] = n_blocks
    avgdl = float(ds.agg(F.avg("dl")).collect()[0][0])

    # --- BM25 query latency ----------------------------------------------
    q = query_terms_df(spark, QUERY_SET)
    lat = []
    for _ in range(N_REPEAT):
        t0 = time.time()
        bm25_topk_from_index(idx, ds, q, n_turns, avgdl, k=10).collect()
        lat.append(time.time() - t0)
    timings["bm25_query"] = round(sum(lat), 3)
    extras["bm25_p50_ms"] = round(statistics.median(lat) * 1000, 1)

    # --- operator suite slice ---------------------------------------------
    suite = ["term_stats", "doc_stats", "bm25_topk", "smart_ltu",
             "dedup_exact", "lsh_candidates", "simhash",
             "embedding_topk", "embedding_lsh_topk",
             "text_quality", "token_counts", "sessionize"]
    for name in suite:
        t0 = time.time()
        EQ.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {"metric": "suite_sec", "value": total, "unit": "sec",
           "queries": timings, "sf": sf, "cpus": cpus, **extras}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
