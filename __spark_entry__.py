"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k on sf0.001.
queries()      — operator registry (SURVEY.md §2 + training-data
                 pipeline tier), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query.

Implementations live in search_engine_spark/entry_queries.py.

The registry is CONSOLIDATED (round 5): every gate not already covered
by the round-4 artifact is folded into one of 14 per-family composite
bundles (search_engine_spark/bundles.py) whose oracle is the UNION ALL
of the members' oracles on a fixed slot schema, so the whole registry
(66 entries) fits inside two 50-row artifact prefixes while every one
of the 192 underlying relations stays value-verified.

`queries()` orders gates LEAST-RECENTLY-VERIFIED FIRST: the round-3
correctness run recorded only the first 50 registry entries (a prefix
cap), leaving 19 gates without a round-3 row. The order is derived
deterministically from the committed CORRECTNESS_r*.json artifacts —
a gate missing from every artifact (or whose latest row errored)
sorts before one green in round r, which sorts before one green in
round r+1; ties keep registry order. Under any prefix cap this
rotates coverage so every gate lands in an artifact within a bounded
number of rounds, and with no cap the full set runs in a
stale-first order. Results are order-independent — each gate is a
self-contained (spark, sf_dir) -> DataFrame.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from search_engine_spark.entry_queries import QUERIES, oracle_sql_map, q_bm25_topk


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-k BM25 over the fixed query set on sf0.001."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def _last_verified_round() -> dict[str, int]:
    """gate name -> latest round with a recorded non-error row (0 if
    never recorded). Pure function of the committed artifacts."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            # 'no_oracle' is the recorder's marker for a rows-only gate
            # that WAS reached — it counts as covered; real errors must
            # resort the gate to the front
            if isinstance(rec, dict) and rec.get("err") in (None, "no_oracle"):
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    last = _last_verified_round()
    pos = {name: i for i, name in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (last.get(n, 0), pos[n]))
    return {name: QUERIES[name] for name in ordered}


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
