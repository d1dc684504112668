"""Percolation: reverse search — route documents to stored queries.

A production fulltext engine's percolator indexes the QUERIES and, for
each incoming document, reports which stored queries it satisfies
(alerting, saved searches, ingest routing). The reference engine only
searches forward (docs by query, /root/reference/src/invertedIndex.py:
226-267); percolation is the transpose, and relationally it is the
same semi-join read backwards.

Semantics here: a stored query matches a document iff EVERY distinct
query term occurs in the document (conjunctive match — the percolator
default for term queries). Out-of-vocabulary query terms therefore
make their query unsatisfiable, matching the forward engine's miss
path.

Scale shape: the stored-query table is tiny → broadcast; the only
shuffle is the (doc_id, qid) hit count, map-side combined, bounded by
docs × matching queries. The per-doc query list aggregates at most
|queries| elements — constant-width rows at any corpus size. No
corpus-sized self-join exists; adding a document re-percolates ONE
row (the streaming use), adding a query re-scans the corpus once (the
batch use) — both expressible from this one relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def percolate(tc: DataFrame, qterms: DataFrame) -> DataFrame:
    """(doc_id, qids, n_queries) — for each document that satisfies at
    least one stored query, the sorted comma-joined qid list and its
    count. `tc`: (doc_id, term, ...) one row per distinct doc-term;
    `qterms`: (qid, term, ...) the stored queries."""
    q = qterms.select("qid", "term").distinct()
    need = q.groupBy("qid").agg(F.count("*").alias("_need"))
    hits = (tc.select("doc_id", "term")
            .join(F.broadcast(q), "term", "inner")
            .groupBy("doc_id", "qid")
            .agg(F.count("*").alias("_have")))
    full = (hits.join(F.broadcast(need), "qid", "inner")
            .where(F.col("_have") == F.col("_need")))
    return (full.groupBy("doc_id")
            .agg(F.array_join(F.sort_array(F.collect_list("qid")), ",")
                 .alias("qids"),
                 F.count("*").cast("long").alias("n_queries")))
