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


def _shingles_from(toks: Column, n: int) -> Column:
    """Token n-gram shingles joined by '_' over an already-materialized
    token-array COLUMN (must be a plain column reference, not the
    tokenizer expression — Catalyst does no common-subexpression
    elimination inside lambda bodies, so inlining the regex here would
    re-tokenize every row n+2 times)."""
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(1), F.size(toks) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        "_", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(doc_id, shingle) — distinct token n-grams per doc.

    Tokenizes once into a column, dedups per-doc with array_distinct
    BEFORE exploding (map-side; shrinks the shuffle), then a global
    distinct is unnecessary — array_distinct already is per-doc and
    (doc_id, shingle) is unique after it."""
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    tokens_col(text_col).alias("_toks"))
        .select("doc_id",
                F.explode(F.array_distinct(_shingles_from(F.col("_toks"), n)))
                .alias("shingle"))
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
    bit-identical in Spark / DuckDB / Python (no engine hash involved).

    All n_hashes minima are computed in ONE groupBy(doc_id) with
    n_hashes agg columns — no ×n_hashes row explosion through the
    shuffle (partial min aggregation is map-side, so shuffled bytes are
    n_hashes × n_docs tiny rows, not n_hashes × n_shingles)."""
    sh = shingles(docs, n)
    mins = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle"))))
        .alias(f"m{i}") for i in range(n_hashes)])
    sig = F.array(*[F.struct(F.lit(i).alias("h"), F.col(f"m{i}").alias("minhash"))
                    for i in range(n_hashes)])
    return (mins.select("doc_id", F.explode(sig).alias("s"))
            .select("doc_id", F.col("s.h").cast("int").alias("h"), "s.minhash"))


def lsh_bands(docs: DataFrame, n: int = 3, n_hashes: int = N_MINHASH,
              n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band_no, band_hash) — band hash = md5 of the '|'-joined
    minhash components of that band, computed straight off the wide
    one-row-per-doc signature (no per-(doc,band) second aggregation)."""
    rows_per_band = n_hashes // n_bands
    sh = shingles(docs, n)
    mins = sh.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle"))))
        .alias(f"m{i}") for i in range(n_hashes)])
    bands = F.array(*[
        F.struct(
            F.lit(k).alias("band_no"),
            F.md5(F.concat_ws("|", *[F.col(f"m{k * rows_per_band + j}")
                                     for j in range(rows_per_band)])).alias("band_hash"))
        for k in range(n_bands)])
    return (mins.select("doc_id", F.explode(bands).alias("b"))
            .select("doc_id", F.col("b.band_no").cast("int").alias("band_no"),
                    "b.band_hash"))


def lsh_candidates(docs: DataFrame, n: int = 3, n_hashes: int = N_MINHASH,
                   n_bands: int = N_BANDS,
                   max_bucket_size: int | None = None) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band.
    Output (doc_a, doc_b) distinct, doc_a < doc_b.

    Scale shape: ONE groupBy on (band_no, band_hash) collecting the
    bucket's doc_ids, then in-bucket pair expansion with array
    combinatorics — no self-join, so the signature pipeline is computed
    once (a self-join would recompute the whole upstream for each
    side). A bucket of size s yields s·(s−1)/2 pairs; at 100 TB a hot
    bucket (boilerplate docs) is quadratic, so `max_bucket_size` drops
    buckets above the cap (standard LSH practice; None = exact, used by
    the oracle gate)."""
    bands = lsh_bands(docs, n, n_hashes, n_bands)
    buckets = (bands.groupBy("band_no", "band_hash")
               .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
               .where(F.size("ids") > 1))
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ids") <= max_bucket_size)
    ids = F.col("ids")
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.slice(ids, i + 2, F.size(ids)),
            lambda b: F.struct(F.element_at(ids, (i + 1).cast("int")).alias("doc_a"),
                               b.alias("doc_b")))))
    return (buckets.select(F.explode(pairs).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct())


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
    All-pairs cross join (oracle-exact gate path); use
    `simhash_pairs_banded` at scale."""
    s = simhash(docs, bits)
    a, b = s.alias("a"), s.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(ham <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                ham.cast("int").alias("hamming"))
    )


def simhash_pairs_banded(docs: DataFrame, bits: int = 32,
                         max_hamming: int = 3) -> DataFrame:
    """Scale path for simhash_pairs — identical output, no cross join.

    Pigeonhole: split the fingerprint into max_hamming+1 bit blocks;
    any pair within hamming ≤ max_hamming agrees on at least one whole
    block. Candidates = docs sharing (block_no, block_bits) — generated
    with the same bucket-groupBy shape as lsh_candidates (no self-join)
    — then exact hamming verify via an equi-join back to the (tiny,
    one-row-per-doc) fingerprint table."""
    n_blocks = max_hamming + 1
    widths = [bits // n_blocks + (1 if i < bits % n_blocks else 0)
              for i in range(n_blocks)]
    offs = [sum(widths[:i]) for i in range(n_blocks)]
    s = simhash(docs, bits)
    blocks = F.array(*[
        F.struct(F.lit(i).alias("block_no"),
                 F.shiftright(F.col("simhash"), offs[i])
                 .bitwiseAND(F.lit((1 << widths[i]) - 1)).alias("block_bits"))
        for i in range(n_blocks)])
    bdf = s.select("doc_id", F.explode(blocks).alias("b")) \
           .select("doc_id", "b.block_no", "b.block_bits")
    buckets = (bdf.groupBy("block_no", "block_bits")
               .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
               .where(F.size("ids") > 1))
    ids = F.col("ids")
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(0), F.size(ids) - 2),
        lambda i: F.transform(
            F.slice(ids, i + 2, F.size(ids)),
            lambda b: F.struct(F.element_at(ids, (i + 1).cast("int")).alias("doc_a"),
                               b.alias("doc_b")))))
    cand = (buckets.select(F.explode(pairs).alias("p"))
            .select("p.doc_a", "p.doc_b").distinct())
    fa = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("fa"))
    fb = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("fb"))
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (cand.join(fa, "doc_a").join(fb, "doc_b")
            .where(ham <= max_hamming)
            .select("doc_a", "doc_b", ham.cast("int").alias("hamming")))


def containment_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                      max_shingle_df: int | None = None) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT ≥ threshold.

    (doc_a, doc_b, containment) with doc_a < doc_b and
    containment = |A∩B| / min(|A|, |B|), rounded 6dp — the Broder
    containment measure. Jaccard misses quote/subset relations (a doc
    embedded verbatim in a 10× longer one has Jaccard ≈ 0.1 but
    containment = 1.0); training-data curation needs exactly this to
    catch quoted boilerplate and partial copies.

    Same scale shape as jaccard_pairs: shingle equi-join (never a doc
    cross-join), `max_shingle_df` drops boilerplate shingles before
    the self-join (None keeps exact semantics for the oracle gate).
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
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("containment", F.round(
            F.col("inter") / F.least(F.col("na"), F.col("nb")), 6))
        .where(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )
