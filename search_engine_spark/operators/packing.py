"""Token-budget bin packing for training-batch curation.

Groups documents into bins of ≈``budget`` tokens — the shape a
sequence-packing dataloader consumes. The distributed design:

1. Every doc gets a SHARD via the repo's portable md5 coin
   (md5(id)[:15] as a 60-bit int, mod ``shards``) — deterministic,
   engine-portable, and uniform, so shard sizes concentrate tightly
   around n/shards.
2. Within a shard, docs are laid out in id order and binned by
   EXCLUSIVE cumulative token count: bin_id = ⌊cum_before / budget⌋.
   A doc may straddle a boundary, so a bin's total lands in
   [budget − max_doc_tokens, budget + max_doc_tokens) — the standard
   tolerance for contiguous packing; a greedy never-split packer is a
   sequential scan with the same per-shard locality and can swap in
   behind the same shard layout.

Scale shape: the only sequential dependency (the running sum) is
confined to one shard, and ``shards`` is chosen so a shard's rows fit
one reducer comfortably (e.g. 10^12 docs / 10^6 shards = 10^6 rows per
window partition). Everything else is embarrassingly parallel; no
global sort, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_bins(doc_tokens: DataFrame, budget: int, shards: int,
              id_col: str = "doc_id", tok_col: str = "dl") -> DataFrame:
    """(doc_id, shard, bin_id, <tok_col>) — contiguous token-budget
    bins per md5 shard. ``doc_tokens`` is any (id, token-count)
    relation (doc_stats' dl, or token_counts_report's re_tokens)."""
    shard = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                    16, 10).cast("long") % shards).cast("int")
    d = doc_tokens.select(F.col(id_col), F.col(tok_col), shard.alias("shard"))
    w = (Window.partitionBy("shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = F.coalesce(F.sum(tok_col).over(w), F.lit(0).cast("long"))
    # integer floor division (`div`), never double `/`: the oracle
    # floors exactly, and for very large per-shard cumulative sums a
    # correctly-rounded double quotient can round UP across an integer
    # boundary and disagree (ADVICE r3)
    return (d.select(F.col(id_col), F.col("shard"), cum.alias("_cum"),
                     F.col(tok_col))
            .select(
                id_col,
                "shard",
                F.expr(f"_cum div {int(budget)}").cast("long").alias("bin_id"),
                tok_col))
