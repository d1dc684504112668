"""Connected-components dedup clustering (operators/clusters.py)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.clusters import (connected_components,
                                                    dup_clusters)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_cc_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    # island {8, 9}, self-loop and reversed duplicates tolerated
    cc = connected_components(_edges(spark, [
        (1, 2), (2, 3), (3, 4), (9, 8), (8, 9), (5, 5)]))
    got = {r.node: r.comp for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}  # 5: no real edge


def test_cc_long_chain_converges(spark):
    n = 12
    cc = connected_components(_edges(spark, [(i, i + 1) for i in range(n)]))
    got = {r.node: r.comp for r in cc.collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_cc_max_iter_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(8)]),
                             max_iter=1)


def test_dup_clusters_summary(spark):
    rows = {r.comp: r for r in dup_clusters(_edges(spark, [
        (10, 11), (11, 12), (20, 21)])).collect()}
    assert rows[10].n_members == 3 and rows[10].keep_doc == 10
    assert rows[10].drop_docs == [11, 12]
    assert rows[20].drop_docs == [21]
