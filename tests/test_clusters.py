"""Connected-components dedup clustering (operators/clusters.py)."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.clusters import (connected_components,
                                                    dup_clusters, pagerank)


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


def _pagerank_numpy(sym, damping, n_iter):
    nodes = sorted({a for a, _ in sym} | {b for _, b in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    pr = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in nodes:
            s = sum(pr[a] / deg[a] for a, b in sym if b == v)
            nxt[v] = (1.0 - damping) / len(nodes) + damping * s
        pr = nxt
    return pr


def test_pagerank_matches_reference_iteration(spark):
    # star 1-{2,3,4} plus edge 2-3: hub 1 must outrank leaves, and the
    # values must equal an independent per-node reference iteration
    edges = [(1, 2), (1, 3), (1, 4), (2, 3)]
    sym = edges + [(b, a) for a, b in edges]
    want = _pagerank_numpy(sym, 0.85, 3)
    got = {r.node: r.pr for r in pagerank(_edges(spark, edges)).collect()}
    assert set(got) == set(want)
    for v in want:
        assert got[v] == round(want[v], 6)
    assert got[1] > got[2] > got[4]
    assert abs(sum(got.values()) - 1.0) < 1e-4  # stochastic to rounding


def test_pagerank_empty_graph(spark):
    out = pagerank(_edges(spark, [(5, 5)]))  # self-loops drop → no graph
    assert out.collect() == []
    assert out.columns == ["node", "pr"]


def test_dup_clusters_summary(spark):
    rows = {r.comp: r for r in dup_clusters(_edges(spark, [
        (10, 11), (11, 12), (20, 21)])).collect()}
    assert rows[10].n_members == 3 and rows[10].keep_doc == 10
    assert rows[10].drop_docs == [11, 12]
    assert rows[20].drop_docs == [21]
