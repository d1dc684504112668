"""Stateful streaming NEAR-dup filtering — MinHash-LSH first-seen
bucket admission at ingest time (`applyInPandasWithState`).

The batch `lsh_candidates` policy (operators/dedup.py) asks "which docs
share a band bucket?"; the ingest-time version asks it INCREMENTALLY: a
document whose ANY band bucket was already occupied by an earlier
document is flagged a near-dup candidate; the bucket's first occupant
is the keeper. Under ascending-doc_id replay (the natural append order
of a log-structured corpus) first-seen coincides with the batch
min-doc_id-per-bucket rule, so keepers == "docs that are the minimum in
ALL their buckets" — exactly what the driver oracle checks.

Two design points make this a single stateful operator (Structured
Streaming allows no aggregation upstream of applyInPandasWithState):

- the MinHash signature is computed ROW-LOCALLY: every shingle of a doc
  lives in its own text, so minhash_i = array_min(transform(shingles,
  s -> md5(i:s))) — a pure column expression, byte-identical to the
  batch groupBy-min in operators/dedup.py::lsh_bands (min over a set ==
  min over the array), no streaming agg needed;
- the state key is the bucket (band_no, band_hash) and the state is a
  one-int marker, so state size is one row per DISTINCT bucket ever
  seen — the same cardinality the batch groupBy reduces to. Flagged
  docs STILL mark their buckets (state registers every arrival), so a
  doc sharing buckets only with earlier near-dups is flagged too, which
  is what keeps streaming ≡ batch ("shares a bucket with ANY lower
  doc_id", not "with a keeper").

Emitted stream: (band_no, band_hash, doc_id, is_first) — append-only.
The per-doc verdict (kept iff is_first in ALL its bands) is a plain
batch aggregation over the sink, outside the streaming query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.tokenize import tokens_col
from ..operators.dedup import N_BANDS, N_MINHASH, _shingles_from

OUT_SCHEMA = "band_no int, band_hash string, doc_id long, is_first boolean"
STATE_SCHEMA = "seen int"
_COLS = ["band_no", "band_hash", "doc_id", "is_first"]


def local_bands(docs: DataFrame, n: int = 3, n_hashes: int = N_MINHASH,
                n_bands: int = N_BANDS, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, band_no, band_hash) computed with row-local expressions
    only (streaming-safe). Byte-identical to the batch
    operators/dedup.py::lsh_bands: min over the doc's distinct shingle
    md5s is the same value whether taken by groupBy or array_min.
    Docs with no shingles emit no bands (same as the batch absence)."""
    rows_per_band = n_hashes // n_bands
    sh = F.array_distinct(_shingles_from(F.col("_toks"), n))

    def minhash(i: int, shc: Column) -> Column:
        return F.array_min(F.transform(
            shc, lambda s: F.md5(F.concat_ws(":", F.lit(str(i)), s))))

    with_sh = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                           tokens_col(text_col).alias("_toks"))
               .select("doc_id", sh.alias("_sh"))
               .where(F.size("_sh") > 0))
    bands = F.array(*[
        F.struct(
            F.lit(k).alias("band_no"),
            F.md5(F.concat_ws("|", *[minhash(k * rows_per_band + j,
                                             F.col("_sh"))
                                     for j in range(rows_per_band)]))
            .alias("band_hash"))
        for k in range(n_bands)])
    return (with_sh.select("doc_id", F.explode(bands).alias("b"))
            .select(F.col("b.band_no").cast("int").alias("band_no"),
                    F.col("b.band_hash").alias("band_hash"), "doc_id"))


def lsh_dedup_stream(docs: DataFrame, n: int = 3,
                     n_hashes: int = N_MINHASH,
                     n_bands: int = N_BANDS) -> DataFrame:
    """docs: streaming DataFrame with (doc_id long, text string).
    Returns the append-mode stream (band_no, band_hash, doc_id,
    is_first): is_first marks the bucket's first-ever occupant (the
    minimum doc_id of the first batch that touches the bucket)."""
    banded = local_bands(docs, n, n_hashes, n_bands)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        band_no, band_hash = key
        occupied = state.exists
        ids: list[int] = []
        for p in pdfs:
            ids.extend(int(x) for x in p["doc_id"])
        if not ids:
            yield pd.DataFrame(columns=_COLS)
            return
        ids.sort()
        if not occupied:  # occupied buckets never transition back
            state.update((1,))
        yield pd.DataFrame({
            "band_no": [band_no] * len(ids),
            "band_hash": [band_hash] * len(ids),
            "doc_id": ids,
            "is_first": [(not occupied) and i == 0
                         for i in range(len(ids))]})

    return (banded.groupBy("band_no", "band_hash")
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
