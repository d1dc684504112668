"""Mergeable sketches vs pure-Python oracles: HLL register/estimate
exactness + mergeability, CMS one-sided error + merge-by-sum, Bloom
no-false-negatives + pruning."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.sketches import (
    BLOOM_BITS, BLOOM_K, CMS_DEPTH, CMS_WIDTH, HLL_ALPHA, HLL_M, HLL_P,
    HLL_W_BITS, bloom_filter_keys, bloom_positions, cms_counters,
    cms_lookup, hll_estimate, hll_merge, hll_registers)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_registers(values) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in set(values):
        h = _h60(str(v))
        reg, w = h % HLL_M, h >> HLL_P
        rho = (HLL_W_BITS + 1) if w == 0 else (HLL_W_BITS + 1 - w.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _terms(i: int, n: int) -> list[str]:
    return [f"term{j:05d}" for j in range(i, n)]


def test_hll_registers_match_python_oracle(spark):
    vals = _terms(0, 3000)
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    got = {r.reg: r.max_rho for r in hll_registers(df).collect()}
    assert got == _py_registers(vals)


def test_hll_estimate_exact_arithmetic_and_accuracy(spark):
    vals = _terms(0, 5000)
    df = spark.createDataFrame([(v,) for v in vals], "term string")
    row = hll_estimate(hll_registers(df)).collect()[0]
    regs = _py_registers(vals)
    num = (sum(1 << (HLL_W_BITS + 1 - r) for r in regs.values())
           + (HLL_M - len(regs)) * (1 << (HLL_W_BITS + 1)))
    assert row.n_regs_present == len(regs)
    assert row.n_zero_regs == HLL_M - len(regs)
    assert row.harmonic_num == num
    c = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1))
    assert row.est_raw == c / num  # bit-exact: one double division
    # accuracy: within 3 std errors of the true cardinality
    assert abs(row.est_raw - 5000) / 5000 < 3 * 1.04 / math.sqrt(HLL_M)


def test_hll_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(v,) for v in _terms(0, 1200)], "term string")
    b = spark.createDataFrame([(v,) for v in _terms(800, 2400)], "term string")
    u = spark.createDataFrame([(v,) for v in _terms(0, 2400)], "term string")
    merged = {(r.reg, r.max_rho) for r in
              hll_merge(hll_registers(a), hll_registers(b)).collect()}
    direct = {(r.reg, r.max_rho) for r in hll_registers(u).collect()}
    assert merged == direct


def test_cms_overestimates_and_hits_exact_without_collisions(spark):
    rows = [(f"t{i}", i + 1) for i in range(200)]
    tc = spark.createDataFrame(rows, "term string, tf int")
    cand = spark.createDataFrame([(t,) for t, _ in rows], "term string")
    est = {r.term: r.cms_est for r in
           cms_lookup(cms_counters(tc), cand).collect()}
    true = dict(rows)
    assert set(est) == set(true)
    assert all(est[t] >= true[t] for t in true)
    # pure-Python twin: identical cell sums -> identical estimates
    cells: dict[tuple[int, int], int] = {}
    for t, tf in rows:
        for h in range(CMS_DEPTH):
            b = _h60(f"{h}:{t}") % CMS_WIDTH
            cells[(h, b)] = cells.get((h, b), 0) + tf
    for t in true:
        exp = min(cells[(h, _h60(f"{h}:{t}") % CMS_WIDTH)]
                  for h in range(CMS_DEPTH))
        assert est[t] == exp


def test_cms_merge_by_sum(spark):
    """Sketch(shard1) + sketch(shard2) cell-wise == sketch(union) —
    the property that makes per-day sketches compose on a cluster."""
    r1 = [(f"t{i}", 5) for i in range(50)]
    r2 = [(f"t{i}", 7) for i in range(25, 75)]
    c1 = cms_counters(spark.createDataFrame(r1, "term string, tf int"))
    c2 = cms_counters(spark.createDataFrame(r2, "term string, tf int"))
    summed = {(r.h, r.bucket): r.c for r in
              (c1.unionByName(c2).groupBy("h", "bucket")
               .agg(F.sum("c").cast("long").alias("c")).collect())}
    direct = {(r.h, r.bucket): r.c for r in cms_counters(
        spark.createDataFrame(r1 + r2, "term string, tf int")).collect()}
    assert summed == direct


def test_bloom_no_false_negatives_and_prunes(spark):
    members = [f"key{i}" for i in range(40)]
    other = [f"zzz{i}" for i in range(4000)]
    keys = spark.createDataFrame([(m,) for m in members], "term string")
    big = spark.createDataFrame([(t,) for t in members + other],
                                "term string")
    passed = {r.term for r in
              bloom_filter_keys(big, bloom_positions(keys)).collect()}
    assert set(members) <= passed  # no false negatives, ever
    # at n=40, m=2^16, k=7 the fp rate is ~(1-e^{-kn/m})^k ~ 4e-17:
    # pruning should kill essentially all non-members
    fp = passed - set(members)
    assert len(fp) <= 2
    # python twin of the fp set, exact
    bits = {_h60(f"b{j}:{m}") % BLOOM_BITS
            for m in members for j in range(BLOOM_K)}
    exp = {t for t in members + other
           if all(_h60(f"b{j}:{t}") % BLOOM_BITS in bits
                  for j in range(BLOOM_K))}
    assert passed == exp


# ---------------------------------------------------------- bottom-k sketch

def test_bottomk_merge_property(spark):
    from search_engine_spark.operators.sketches import bottomk_sample
    rows = [(i, 10 + i % 50) for i in range(500)]
    d = spark.createDataFrame(rows, "doc_id long, dl long")
    a = d.where("doc_id < 250")
    b = d.where("doc_id >= 250")
    whole = {(r.h, r.v) for r in bottomk_sample(d, k=32).collect()}
    merged_in = bottomk_sample(a, k=32).unionByName(bottomk_sample(b, k=32))
    merged = {(r.h, r.v)
              for r in merged_in.orderBy("h").limit(32).collect()}
    assert merged == whole  # bottom-k(A∪B) == bottom-k of unioned sketches


def test_bottomk_quantiles_track_exact(spark):
    import numpy as np
    from search_engine_spark.operators.sketches import (bottomk_sample,
                                                        sketch_quantiles)
    # skewed lengths; the k=256 sample's type-1 quantiles must land
    # within a few percentiles of the exact ones
    vals = [(i, int(10 + (i * 37 % 997))) for i in range(5000)]
    d = spark.createDataFrame(vals, "doc_id long, dl long")
    row = sketch_quantiles(bottomk_sample(d, k=256)).collect()[0]
    exact = np.quantile([v for _, v in vals], [0.5, 0.9], method="lower")
    assert row.n_sample == 256
    assert abs(row.q50 - exact[0]) <= 0.1 * (exact[0] + 1)
    assert abs(row.q90 - exact[1]) <= 0.1 * (exact[1] + 1)


def test_bottomk_smaller_corpus_than_k(spark):
    from search_engine_spark.operators.sketches import (bottomk_sample,
                                                        sketch_quantiles)
    d = spark.createDataFrame([(1, 5), (2, 7), (3, 9)], "doc_id long, dl long")
    row = sketch_quantiles(bottomk_sample(d, k=64)).collect()[0]
    assert row.n_sample == 3
    assert row.q50 in (5, 7, 9)
