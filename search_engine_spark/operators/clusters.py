"""Connected components: duplicate-pair edges → dedup clusters.

Pairwise dedup (operators/dedup.py jaccard/LSH/simhash,
operators/similarity.py embedding pairs) emits EDGES; the
keep-one-per-cluster policy needs the transitive closure — connected
components, each labeled by its minimum member id (the canonical
"keep" doc under the engine's pinned min-doc_id policy).

Algorithm: iterative min-label propagation to a FIXPOINT —
L(v) ← min(L(v), min over neighbors L(u)) — the textbook Spark/
Pregel formulation (Kiveris et al.'s large-star/small-star is the
asymptotic upgrade; dedup graphs are near-cliques with tiny
diameter, so plain propagation converges in 2–4 rounds). Each round
is one join + one map-side-combined min aggregation; convergence is
an exact changed-label count (a driver scalar), and `localCheckpoint`
truncates the lineage each round so plans stay constant-size.

Scale shape: state is one (node, comp) row per node appearing in any
edge — proportional to the DUPLICATED subset of the corpus, not the
corpus. Hot components (a boilerplate doc duplicated 10^6×) are
near-cliques: their label converges in round one, and the per-round
join is keyed by node so no single reducer sees more than a node's
degree. max_iter bounds pathological chains; hitting it raises
rather than silently returning an unconverged labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, a: str = "doc_a",
                         b: str = "doc_b",
                         max_iter: int = 25) -> DataFrame:
    """(node, comp) — comp = min node id in the node's component.
    `edges`: undirected pairs in columns `a`/`b` (self-loops and
    duplicate/reversed edges tolerated)."""
    e = (edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
         .where(F.col("a") != F.col("b")))
    sym = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint())
    for _ in range(int(max_iter)):
        nbr_min = (sym.join(labels.select(F.col("node").alias("b"),
                                          F.col("comp").alias("_nc")), "b")
                   .groupBy("a").agg(F.min("_nc").alias("_nbr")))
        new = (labels.join(nbr_min.select(F.col("a").alias("node"), "_nbr"),
                           "node", "left")
               .select("node",
                       F.least("comp", F.coalesce("_nbr", "comp"))
                       .alias("comp"))
               .localCheckpoint())
        changed = (new.join(labels.select("node",
                                          F.col("comp").alias("_old")),
                            "node")
                   .where(F.col("comp") != F.col("_old")).count())
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the bound; raise max_iter)")


def pagerank(edges: DataFrame, a: str = "doc_a", b: str = "doc_b",
             damping: float = 0.85, n_iter: int = 3) -> DataFrame:
    """(node, pr) — fixed-iteration PageRank over the undirected dup
    graph: pr ← (1-d)/N + d·Σ_{u∈nbr(v)} pr(u)/deg(u).

    Centrality over the duplicate-candidate graph ranks the HUB copies
    (the boilerplate a million near-dups point at) — the doc a curation
    pipeline wants to inspect first, complementing the min-label
    keep-policy of `connected_components` (same edges, second
    algorithm). Fixed n_iter (not convergence-tested) keeps the result
    deterministic and lets the DuckDB oracle unroll the same number of
    rounds exactly.

    Scale shape: state is one (node, deg, pr) row per node in the dup
    graph — the duplicated subset, not the corpus. Each round is one
    equi-join keyed by source node (max reducer load = max degree) and
    one map-side-combined sum keyed by destination; `localCheckpoint`
    truncates lineage so the plan stays constant-size across rounds.
    N is a single driver scalar (one count job)."""
    e = (edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
         .where(F.col("a") != F.col("b")))
    sym = (e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
           .distinct().localCheckpoint())
    deg = sym.groupBy("a").agg(F.count("*").cast("double").alias("deg"))
    n = deg.count()
    if n == 0:
        return deg.select(F.col("a").alias("node"),
                          F.lit(0.0).alias("pr")).limit(0)
    base = F.lit((1.0 - damping) / n)
    pr = (deg.select(F.col("a").alias("node"), "deg",
                     F.lit(1.0 / n).alias("pr"))
          .localCheckpoint())
    for _ in range(int(n_iter)):
        shares = pr.select(F.col("node").alias("a"),
                           (F.col("pr") / F.col("deg")).alias("share"))
        contrib = (sym.join(shares, "a")
                   .groupBy("b").agg(F.sum("share").alias("s")))
        pr = (pr.select("node", "deg")
              .join(contrib.select(F.col("b").alias("node"), "s"),
                    "node", "left")
              .select("node", "deg",
                      (base + F.lit(damping)
                       * F.coalesce("s", F.lit(0.0))).alias("pr"))
              .localCheckpoint())
    return pr.select("node", F.round("pr", 6).alias("pr"))


def dup_clusters(edges: DataFrame, a: str = "doc_a", b: str = "doc_b",
                 max_iter: int = 25) -> DataFrame:
    """(comp, n_members, keep_doc, drop_docs) — one row per duplicate
    cluster: canonical keeper = min id (= comp), the rest sorted.
    The cluster-level face of the TRANSITIVE kept-set policy (the
    one-pass `dedup_kept` gate documents the non-transitive twin)."""
    cc = connected_components(edges, a=a, b=b, max_iter=max_iter)
    return (cc.groupBy("comp")
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.min("node").alias("keep_doc"),
                 F.sort_array(F.collect_list(
                     F.when(F.col("node") != F.col("comp"), F.col("node"))
                 )).alias("drop_docs")))
