"""PII scrubbing for training-data curation: regex redaction of
emails, IPv4 addresses, and phone numbers, with per-pattern match
counts for audit lineage.

Patterns are deliberately RE2-compatible (no backrefs, no lookaround,
`[0-9]` instead of `\\d`) so the exact same strings drive both Spark's
Java regex engine and the DuckDB oracle's RE2 — redacted text is
byte-identical across engines, which is what the value gate pins.

Scale shape: three chained `regexp_replace`/`regexp_count` column
expressions — one codegen'd scan, no UDF, no shuffle. Counts are
computed SEQUENTIALLY on the progressively-scrubbed text (email first,
then IP on the email-scrubbed text, then phone) so overlapping matches
are attributed deterministically and identically in both engines.

Reference analogue: the reference engine has no scrubbing stage; this
is part of the LLM-training-data tier layered on the same scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              patterns=PII_PATTERNS) -> DataFrame:
    """(doc_id, n_<name>..., text) — redacted text plus per-pattern
    match counts. Counting happens on the text as already scrubbed by
    the preceding patterns, so e.g. digits inside a redacted email are
    never double-counted as a phone number."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    for name, pat, rep in patterns:
        cols.append(F.regexp_count(t, F.lit(pat)).cast("long")
                    .alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, rep)
    cols.append(t.alias("text"))
    return docs.select(*cols)
