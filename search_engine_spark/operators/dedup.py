"""Deduplication operators for the training-data pipeline tier.

Beyond the reference's operator set (it has no dedup), these are the
operations a 100 TB corpus pipeline needs before indexing: exact dup
collapse, shingle-Jaccard near-dup, MinHash+LSH candidate generation,
and SimHash. All pure DataFrame/SQL-function compositions (JVM-side,
codegen'd) — no Python UDFs — and every hash primitive is md5-based so
the DuckDB oracle reproduces values bit-for-bit.

Scale notes (100 TB):
- exact dedup: one shuffle on md5(text) — AQE handles skew (identical
  boilerplate texts are the hot keys).
- shingle self-join: the classic blow-up is hot shingles; `jaccard_pairs`
  prunes shingles with doc-frequency > max_shingle_df before the join
  (a hot shingle contributes O(df²) candidate pairs — boilerplate
  n-grams must be dropped, standard MinHashLSH practice).
- MinHash+LSH replaces the all-pairs join entirely at scale: candidates
  only within LSH band buckets; band join is an equi-join on
  (band_no, band_hash) — shuffle-friendly, broadcast-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import tokens_col

N_MINHASH = 8
N_BANDS = 4  # rows-per-band = N_MINHASH / N_BANDS = 2


def exact_dup_groups(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups by md5(text): (text_md5, n_dups,
    canonical_doc_id = min doc_id). Only groups with >1 member."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").cast("long").alias("n_dups"),
             F.min(id_col).cast("long").alias("canonical_doc_id"))
        .where(F.col("n_dups") > 1)
    )


def _shingle_array(text_col: str, n: int) -> Column:
    """Token n-gram shingles joined by '_' (ASCII tokenizer contract)."""
    toks = tokens_col(text_col)
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(1), F.size(toks) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        "_", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct token n-grams per doc."""
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.explode(_shingle_array(text_col, n)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                  max_shingle_df: int | None = None) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold.

    (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded to 6dp.
    `max_shingle_df` drops boilerplate shingles before the self-join
    (scale guard; None keeps exact semantics for the oracle gate).
    """
    sh = shingles(docs, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count("*").alias("sdf")) \
                .where(F.col("sdf") > max_shingle_df).select("shingle")
        sh = sh.join(hot, "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3,
                       n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, h, minhash) — MinHash via the portable min-md5 trick:
    hash function h applied to shingle s is the STRING md5(h || ':' || s);
    the signature component is the lexicographic min. Deterministic and
    bit-identical in Spark / DuckDB / Python (no engine hash involved)."""
    sh = shingles(docs, n)
    hs = sh.select(
        "doc_id", "shingle",
        F.explode(F.array(*[F.lit(i) for i in range(n_hashes)])).alias("h"))
    return (
        hs.groupBy("doc_id", "h")
        .agg(F.min(F.md5(F.concat_ws(":", F.col("h").cast("string"),
                                     F.col("shingle")))).alias("minhash"))
    )


def lsh_candidates(docs: DataFrame, n: int = 3, n_hashes: int = N_MINHASH,
                   n_bands: int = N_BANDS) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band
    (band = md5 of the concatenated signature rows in that band).
    Output (doc_a, doc_b) distinct, doc_a < doc_b. This is the scale
    path that replaces the quadratic shingle self-join: the only join
    is an equi-join on (band_no, band_hash)."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(docs, n, n_hashes)
    bands = (
        sig.withColumn("band_no", (F.col("h") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band_no")
        # array_sort orders by h implicitly via sort on (h, minhash) struct
        .agg(F.md5(F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.struct("h", "minhash"))),
            lambda s: s["minhash"]))).alias("band_hash"))
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over tf-weighted tokens.

    Portable construction: token hash = first 15 hex chars of md5 →
    60-bit int via base-16 conv (Spark conv / DuckDB '0x'-cast, both
    exact); bit b of the fingerprint = sign of Σ_tokens tf·(±1 by
    hash bit b). 32 bits keeps the bit loop cheap; hamming distance
    via bit_count(xor) downstream."""
    from ..functions.tokenize import term_counts_sql
    tc = term_counts_sql(docs)
    h = F.conv(F.substring(F.md5("term"), 1, 15), 16, 10).cast("long")
    tc = tc.select("doc_id", "tf", h.alias("th"))
    bit_cols = [
        F.sum(F.col("tf") * (F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) * 2 - 1))
        .alias(f"s{b}") for b in range(bits)
    ]
    agg = tc.groupBy("doc_id").agg(*bit_cols)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select(F.col("doc_id").cast("long").alias("doc_id"),
                      fp.alias("simhash"))


def simhash_pairs(docs: DataFrame, bits: int = 32, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.
    All-pairs here (oracle-exact); at scale, block by fingerprint
    bytes (pigeonhole: ≤3 differing bits over 4 blocks ⇒ one block
    equal) to turn this into an equi-join."""
    s = simhash(docs, bits)
    a, b = s.alias("a"), s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ham <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                ham.cast("int").alias("hamming"))
    )
