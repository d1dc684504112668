"""Stateful streaming exact-dedup — first-seen-wins content filtering
at ingest time (`applyInPandasWithState`).

A training-data pipeline dedups WHILE ingesting: a document whose
content hash was already admitted in ANY earlier micro-batch is
dropped; the first occurrence is emitted as the canonical keeper.
GroupState keyed by content hash carries one long (the kept doc_id),
so state size is one row per DISTINCT document ever seen — the same
cardinality the batch dedup's groupBy reduces to, amortized across the
stream instead of recomputed per run.

Within a batch the keeper is the minimum doc_id of the hash's rows
(deterministic under any intra-batch arrival order). When the replay
feeds doc_id ranges in ascending batches — the natural append order of
a log-structured corpus — first-seen coincides with the global
min-doc_id policy of the batch `dedup_exact` gate, which is exactly
what the driver oracle checks.

At scale: the shuffle key is the content hash (uniformly distributed
by construction), per-group batch work is O(rows of that hash in the
batch), and the emitted stream is append-only — no rewrites, no
growing output state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "text_md5 string, doc_id long"
STATE_SCHEMA = "kept long"
_COLS = ["text_md5", "doc_id"]


def dedup_stream(docs: DataFrame) -> DataFrame:
    """docs: streaming DataFrame with (doc_id long, text string).
    Returns the append-mode stream of canonical keepers
    (text_md5, doc_id) — one row per first-ever-seen content hash."""
    hashed = docs.select(F.md5("text").alias("text_md5"), "doc_id")

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        h = key[0]
        if state.exists:
            # hash already admitted in an earlier batch: drop all rows
            yield pd.DataFrame(columns=_COLS)
            return
        mn = None
        for p in pdfs:
            if len(p):
                m = int(p["doc_id"].min())
                mn = m if mn is None else min(mn, m)
        if mn is None:
            yield pd.DataFrame(columns=_COLS)
            return
        state.update((mn,))
        yield pd.DataFrame({"text_md5": [h], "doc_id": [mn]})

    return (hashed.groupBy("text_md5")
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
