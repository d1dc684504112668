"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k on sf0.001.
queries()      — operator registry (SURVEY.md §2 + training-data
                 pipeline tier), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query.

Implementations live in search_engine_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from search_engine_spark.entry_queries import QUERIES, oracle_sql_map, q_bm25_topk


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-k BM25 over the fixed query set on sf0.001."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
