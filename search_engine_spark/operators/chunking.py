"""Token-window document chunking for RAG / training-example prep.

Splits each document into fixed-size token windows with overlap
(stride = chunk_tokens - overlap) — the standard preprocessing step
before embedding or packing long documents. Emits one row per chunk
with its 0-based index, 1-based start token offset, token count, and
re-joined text.

Scale shape: pure JVM — tokenize once into an array column, build the
per-doc start-offset sequence with `F.sequence`, slice windows with a
two-arg `F.transform`, and explode. No shuffle at all: a chunk never
leaves its document's scan partition, so a 10^12-turn corpus chunks in
one codegen'd pass. The DuckDB oracle reproduces it with
generate_series + list_slice.

Chunk-boundary rule: windows start at 1, 1+stride, 2·stride+1, …
while start ≤ max(n_tokens − overlap, 1), so the final window always
contributes more than `overlap` new tokens (no fully-contained tail
chunks); empty documents produce no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col


def chunk_docs(docs: DataFrame, chunk_tokens: int = 32, overlap: int = 8,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       tokens_col(text_col).alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)
    starts = F.when(n > 0, F.sequence(
        F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(starts, lambda s, i: F.struct(
        i.cast("int").alias("chunk_idx"),
        s.cast("int").alias("start_tok"),
        F.slice(t, s, chunk_tokens).alias("_w")))
    return (base.select("doc_id", F.explode(chunks).alias("c"))
            .select("doc_id",
                    F.col("c.chunk_idx"),
                    F.col("c.start_tok"),
                    F.size("c._w").cast("long").alias("n_chunk_tokens"),
                    F.array_join("c._w", " ").alias("chunk_text")))
