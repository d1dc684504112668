"""Iceberg integration smoke (VERDICT r4 next-round item 8).

The engine's declared production substrate is an Iceberg transcripts
table (BASELINE.json north_star / input_hint); locally the sandbox has
no Iceberg runtime jar, so every gate runs on the parquet fallback of
``read_transcripts``. This module gives the iceberg path at least one
EXECUTED end-to-end test on hosts that do have the jar:

    SPARK_ICEBERG_JAR=/path/to/iceberg-spark-runtime-<ver>.jar \
        python -m pytest tests/test_iceberg.py -x -q

(skipped by default — see README "Iceberg"). The test builds its own
SparkSession with a local Hadoop catalog, writes the seeded transcripts
fixture as an Iceberg table, reads it back via
``read_transcripts(fmt="iceberg")``, and checks the round-trip is
row-identical to the in-memory fixture — the per-turn text-equality
invariant the input_hint pins — and that the index built from the
Iceberg scan matches the one built from the direct DataFrame.
"""

from __future__ import annotations

import os

import pytest

ICEBERG_JAR = os.environ.get("SPARK_ICEBERG_JAR", "")

pytestmark = pytest.mark.skipif(
    not ICEBERG_JAR or not os.path.exists(ICEBERG_JAR),
    reason="SPARK_ICEBERG_JAR not set (no Iceberg runtime in sandbox); "
           "set it to an iceberg-spark-runtime jar to run this smoke")


@pytest.fixture(scope="module")
def iceberg_spark(tmp_path_factory):
    """Dedicated session: the Iceberg catalog must be configured at
    session build time, so this cannot reuse the shared fixture."""
    from pyspark.sql import SparkSession
    wh = str(tmp_path_factory.mktemp("iceberg_wh"))
    s = (SparkSession.builder.master("local[4]")
         .appName("iceberg-smoke")
         .config("spark.jars", ICEBERG_JAR)
         .config("spark.sql.catalog.local",
                 "org.apache.iceberg.spark.SparkCatalog")
         .config("spark.sql.catalog.local.type", "hadoop")
         .config("spark.sql.catalog.local.warehouse", wh)
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_transcripts_iceberg_roundtrip(iceberg_spark):
    from search_engine_spark.sources.transcripts import (generate_transcripts,
                                                         read_transcripts)
    t = generate_transcripts(iceberg_spark, n_convs=50, seed=42)
    t.writeTo("local.db.transcripts").using("iceberg").createOrReplace()
    back = read_transcripts(iceberg_spark, "local.db.transcripts",
                            fmt="iceberg")
    key = ["conv_id", "turn_idx"]
    a = sorted(map(tuple, t.orderBy(*key).collect()))
    b = sorted(map(tuple, back.orderBy(*key).collect()))
    assert a == b  # per-turn equality under stable (conv_id, turn_idx)


def test_index_build_from_iceberg_scan(iceberg_spark):
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import term_counts
    from search_engine_spark.operators.docids import mint_doc_ids
    from search_engine_spark.operators.index_build import term_stats
    from search_engine_spark.sources.transcripts import (generate_transcripts,
                                                         read_transcripts)
    t = generate_transcripts(iceberg_spark, n_convs=50, seed=42)
    t.writeTo("local.db.transcripts2").using("iceberg").createOrReplace()
    scan = read_transcripts(iceberg_spark, "local.db.transcripts2",
                            fmt="iceberg")
    ts_a = term_stats(term_counts(
        mint_doc_ids(scan).select("doc_id", "text"))).collect()
    ts_b = term_stats(term_counts(
        mint_doc_ids(t).select("doc_id", "text"))).collect()
    assert sorted(map(tuple, ts_a)) == sorted(map(tuple, ts_b))
    # partition-pruning sanity: the Iceberg scan supports pushed filters
    n_user = scan.where(F.col("role") == "user").count()
    assert n_user == t.where(F.col("role") == "user").count()
