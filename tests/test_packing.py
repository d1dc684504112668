"""Token-budget bin packing vs a pure-Python md5+cumsum oracle."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from search_engine_spark.operators.packing import pack_bins

BUDGET, SHARDS = 100, 4


def _py_pack(rows):
    """rows: [(doc_id, dl)] → {(doc_id, shard, bin_id, dl)}."""
    by_shard = defaultdict(list)
    for i, dl in rows:
        sh = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % SHARDS
        by_shard[sh].append((i, dl))
    out = set()
    for sh, docs in by_shard.items():
        cum = 0
        for i, dl in sorted(docs):
            out.add((i, sh, cum // BUDGET, dl))
            cum += dl
    return out


def test_pack_bins_matches_oracle(spark):
    rows = [(i, 7 + (i * 13) % 40) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, dl long")
    got = {(r.doc_id, r.shard, r.bin_id, r.dl) for r in
           pack_bins(df, BUDGET, SHARDS).collect()}
    assert got == _py_pack(rows)


def test_pack_bins_bin_size_envelope(spark):
    """Every non-final bin of a shard holds ≥ budget − max_dl and
    < budget + max_dl tokens (contiguous-packing tolerance)."""
    rows = [(i, 7 + (i * 13) % 40) for i in range(1000)]
    max_dl = max(dl for _, dl in rows)
    df = spark.createDataFrame(rows, "doc_id long, dl long")
    per_bin = defaultdict(int)
    for r in pack_bins(df, BUDGET, SHARDS).collect():
        per_bin[(r.shard, r.bin_id)] += r.dl
    last = {sh: max(b for s, b in per_bin if s == sh)
            for sh, _ in per_bin}
    for (sh, b), tot in per_bin.items():
        if b < last[sh]:
            assert BUDGET - max_dl <= tot < BUDGET + max_dl, (sh, b, tot)
