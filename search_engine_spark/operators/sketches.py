"""Mergeable sketches for 100 TB-scale corpus statistics: HyperLogLog
distinct counting, Count-Min frequency estimation, and Bloom-filter
join pruning.

Why sketches at all: at 10^12 turns the exact versions of these
questions (vocabulary cardinality, per-term frequency, "is this term in
the query dictionary?") either need a full shuffle (exact distinct) or
a broadcast that no longer fits (exact dictionary). Each sketch here is
a CONSTANT-size summary that is

- built with one map-side-combinable aggregation (no extra shuffle
  beyond the groupBy that produces it),
- MERGEABLE across partitions / corpus shards / days (HLL: max per
  register; CMS: counter addition; Bloom: bit OR), so incremental and
  distributed builds compose exactly, and
- deterministic and engine-portable: every hash is the repo-wide md5
  convention (60-bit int via base-16 conv of the first 15 hex chars),
  so DuckDB reproduces the sketch bit-for-bit and the oracle gates
  check VALUES, not just shapes.

The reference engine keeps exact dictionaries in memory
(/root/reference/src/invertedIndex.py:54-101 builds `self.index` as an
in-core dict); these sketches are the scale substitute for the
questions that don't need exactness.

No floating-point trap: the HLL harmonic sum is carried as an exact
BIGINT numerator (sum of powers of two, <= 2^61 at p=8), so the only
double op is one final division by a shared literal constant —
bit-identical across engines regardless of aggregation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- util

#: HLL precision: m = 2**HLL_P registers; std error ~ 1.04/sqrt(m) = 6.5%.
HLL_P = 8
HLL_M = 1 << HLL_P
#: bits left for the rho pattern after the register index is consumed.
HLL_W_BITS = 60 - HLL_P  # md5 60-bit hash minus register bits
#: alpha_m * m^2 * 2^HLL_W_BITS+1 precomputed so the estimate is ONE
#: double division of a literal by an exact integer (engine-portable).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

CMS_DEPTH = 4
CMS_WIDTH = 1024

BLOOM_BITS = 1 << 16
BLOOM_K = 7


def h60(col: Column) -> Column:
    """The repo-wide portable hash: md5 hex -> 60-bit non-negative int.
    DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# ---------------------------------------------------------- HyperLogLog

def hll_registers(values: DataFrame, value_col: str = "term") -> DataFrame:
    """(reg, max_rho) register table of the HLL sketch over the distinct
    values of ``value_col`` — the MERGEABLE representation (merge = max
    per register; see :func:`hll_merge`).

    reg = h % m; the remaining w = h div m (52 bits at p=8) yields
    rho = (leading zeros of w within 52 bits) + 1 = 53 - length(bin(w)),
    with the all-zero pattern pinned to 53. length(bin(x)) is the exact
    MSB position in both engines — no float log2 anywhere.

    One groupBy with map-side partial max: at any corpus size the
    shuffle carries <= m rows per map partition.
    """
    h = h60(F.col(value_col).cast("string"))
    w = F.shiftright(h, HLL_P)  # exact: h >= 0, top 52 bits
    rho = F.when(w == 0, HLL_W_BITS + 1).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w)))
    return (values
            .select((h % HLL_M).cast("int").alias("reg"),
                    rho.cast("int").alias("rho"))
            .groupBy("reg").agg(F.max("rho").alias("max_rho")))


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables: union + per-register max. Exactly the
    sketch of the union of the two input value sets — this is what makes
    per-shard / per-day HLLs compose on a cluster."""
    return (a.unionByName(b).groupBy("reg")
            .agg(F.max("max_rho").alias("max_rho")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row summary from a register table:

    - n_regs_present / n_zero_regs: register occupancy,
    - harmonic_num: EXACT integer numerator sum_j 2^(B+1 - rho_j)
      (absent registers contribute rho=0 -> 2^(B+1) each, B = 52),
    - est_raw: alpha * m^2 / sum_j 2^-rho_j = C / harmonic_num with
      C = alpha * m^2 * 2^(B+1) a literal — one double division, so the
      value is bit-identical in any engine and any aggregation order.

    The small-range (linear counting) correction is a driver-side
    scalar decision (est <= 2.5m and zeros present -> m*ln(m/V)); it is
    deliberately NOT folded in here because ln() is libm-dependent —
    the gate pins the raw estimate, the caller applies the correction.
    """
    c = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1))
    agg = registers.agg(
        F.count("*").cast("int").alias("n_regs_present"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_W_BITS + 1} - max_rho)")
              ).cast("long").alias("present_num"))
    zeros = (F.lit(HLL_M) - F.col("n_regs_present")).cast("long")
    num = (F.col("present_num")
           + zeros * F.lit(1 << (HLL_W_BITS + 1)).cast("long"))
    return agg.select(
        "n_regs_present",
        zeros.cast("int").alias("n_zero_regs"),
        num.alias("harmonic_num"),
        (F.lit(c) / num.cast("double")).alias("est_raw"))


# ------------------------------------------------------------ Count-Min

def cms_counters(tc: DataFrame, term_col: str = "term",
                 weight_col: str = "tf",
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(h, bucket, c) counter table of a depth x width Count-Min sketch
    over term frequencies. hash_i(t) = h60(i || ':' || t) % width.

    The explode multiplies rows by `depth` BEFORE the groupBy, but the
    groupBy is map-side combinable into <= depth*width cells per
    partition, so the shuffle transfers a constant-size sketch per map
    task regardless of corpus size. Merging day-shards = cell-wise sum.
    """
    hs = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("h")
    bucket = (h60(F.concat_ws(":", F.col("h").cast("string"),
                              F.col(term_col))) % width)
    return (tc.select(F.col(term_col), F.col(weight_col), hs)
            .select(F.col("h").cast("int"),
                    bucket.cast("int").alias("bucket"),
                    F.col(weight_col))
            .groupBy("h", "bucket")
            .agg(F.sum(weight_col).cast("long").alias("c")))


def cms_lookup(counters: DataFrame, candidates: DataFrame,
               term_col: str = "term",
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch for each candidate term: est = min over
    the depth rows of the counter cell the term hashes to. Candidates
    (a small relation) are exploded x depth and hash-joined against the
    counter table — broadcast-size build side, never a full scan."""
    hs = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("h")
    probes = (candidates.select(term_col, hs)
              .select(term_col, F.col("h").cast("int"),
                      (h60(F.concat_ws(":", F.col("h").cast("string"),
                                       F.col(term_col))) % width)
                      .cast("int").alias("bucket")))
    return (probes.join(F.broadcast(counters), ["h", "bucket"])
            .groupBy(term_col).agg(F.min("c").cast("long").alias("cms_est")))


# ---------------------------------------------------------------- Bloom

def bloom_positions(keys: DataFrame, key_col: str = "term",
                    bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """The set bit positions of a Bloom filter over ``keys``:
    pos_j(t) = h60('b' || j || ':' || t) % bits for j in 0..k-1.
    Returned as a DISTINCT (pos) relation — the merge of two filters is
    the union of their position sets (bit OR)."""
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    pos = (h60(F.concat_ws(":", F.concat(F.lit("b"),
                                         F.col("j").cast("string")),
                           F.col(key_col))) % bits)
    return (keys.select(key_col, js)
            .select(pos.cast("int").alias("pos")).distinct())


def bloom_filter_keys(big: DataFrame, positions: DataFrame,
                      key_col: str = "term",
                      bits: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """Prune ``big`` to the keys whose k Bloom positions are ALL set.
    No false negatives (every true member passes); false positives pass
    at ~(1-e^{-kn/m})^k and are eliminated by the exact join that
    follows in a real plan — the sketch's job is to cut the shuffle
    going INTO that join. The position set (<= bits rows) broadcasts.
    """
    js = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j")
    probe = (big.select(key_col).distinct().select(F.col(key_col), js)
             .select(key_col,
                     (h60(F.concat_ws(":", F.concat(F.lit("b"),
                                                    F.col("j").cast("string")),
                                      F.col(key_col))) % bits)
                     .cast("int").alias("pos")))
    hits = (probe.join(F.broadcast(positions), "pos")
            .groupBy(key_col).agg(F.count("*").alias("_nset")))
    return hits.where(F.col("_nset") == k).select(key_col)


def bottomk_sample(values: DataFrame, value_col: str = "dl",
                   key_col: str = "doc_id", k: int = 64) -> DataFrame:
    """(h, v) — the k rows with the SMALLEST md5-60-bit hash of the
    key: a deterministic uniform corpus sample with constant-size,
    MERGEABLE state (the bottom-k sketch, Cohen & Kaplan 2007):

        bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))

    so per-shard samples union and re-truncate without re-scanning —
    the property reservoir sampling lacks (its state depends on a
    sequential pass). orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k merged on the driver — distributed at any
    corpus size, never a global sort)."""
    return (values.select(
                h60(F.col(key_col).cast("string")).alias("h"),
                F.col(value_col).cast("long").alias("v"))
            .orderBy("h").limit(k))


def sketch_quantiles(sample: DataFrame,
                     qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """One row (n_sample, q50, q90, q99, ...) — type-1 (lower-value)
    quantiles read off the sorted bottom-k sample. Type-1 returns an
    ACTUAL data value (no interpolation), so the estimate is exact
    integer arithmetic — bit-identical across engines with no rounding
    convention needed. Error vs the exact corpus quantile is the
    standard sampling error of a k-uniform sample (tested, not
    claimed)."""
    arr = F.array_sort(F.collect_list("v"))  # bounded: ≤ k values
    agg = sample.agg(F.count("*").cast("long").alias("n_sample"),
                     arr.alias("_l"))
    cols = [F.col("n_sample")]
    for q in qs:
        idx = F.floor(F.lit(q) * (F.col("n_sample") - 1)).cast("int") + 1
        cols.append(F.element_at("_l", idx).alias(f"q{int(q * 100)}"))
    return agg.select(*cols)
