"""Block-max WAND-style top-k pruning (SURVEY.md §2.5 R8).

The reference only *hints* at this ("need to pre-compute the upper/max
threshold", /root/reference/src/invertedIndex.py:308-311 — the DAAT
path :305-492 is unfinished). The north rule requires posting-list
intersection with block-max pruning "expressed as broadcast
term-dictionary lookup plus mapInPandas scoring". This module
implements it as a **block-max score-at-a-time** scorer (the BMM
family): provably the same top-k as exhaustive TAAT, with whole
doc-ranges skipped using per-block score upper bounds.

Distributed shape
-----------------
Doc space is partitioned into the same salt ranges the index build
used (blocks never straddle a salt boundary — postings_blocked cuts
blocks inside per-salt runs), so **every document's complete score for
a query lives in exactly one (qid, range) group**:

    index blocks ⨝ broadcast(query terms)          [semi-join prune]
      → groupBy(qid, range).applyInPandas(scorer)  [numpy block-max walk]
      → union of local top-k → global window top-k [exact merge]

Inside a group the scorer:
1. computes per-block score upper bounds  ub = qtf·idf·sat(block_max_tf,
   block_min_dl)  (sat is monotone ↑ in tf, ↓ in dl, so this bounds
   every posting in the block);
2. cuts the group's doc range into fixed segments; segment bound =
   Σ_terms max{ub of blocks intersecting the segment};
3. visits segments in descending bound, exact-scoring all postings in
   the segment (vectorized numpy; docs are whole within a segment);
4. stops as soon as the next segment's bound < θ − 1e-6, where θ is
   the current k-th best raw score (the 1e-6 margin covers the 6-dp
   score rounding of the rank contract, so rounded ties are never
   pruned).

Correctness: pruning granularity is a doc range, and a pruned range is
one where NO doc can reach θ (its bound ≥ any doc's true score), so
surviving docs are scored exactly — identical ranks and scores to the
exhaustive path (property-tested in tests/test_wand.py).

At 10^12 turns: block metadata is ~1/POSTING_BLOCK of the index and
rides in the same rows; stopword-hot terms have low idf → tiny ubs →
their long tails prune first, which is exactly the skew the north rule
calls out.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..conf import BM25_B, BM25_K1, SALT_BUCKETS, TOP_K_DEFAULT
from .query import _topk

_OUT_SCHEMA = "qid string, doc_id long, score double"
_PRUNE_MARGIN = 2e-6  # > 1e-6 rounding quantum of the rank contract


def _score_group(pdf: pd.DataFrame, n_docs: int, avgdl: float, k: int,
                 k1: float, b: float, n_segments: int) -> pd.DataFrame:
    """Exact local top-k for one (qid, doc-range) group with block-max
    segment pruning. Returns ≤ k rows (qid, doc_id, raw score)."""
    qid = pdf["qid"].iloc[0]

    # per-term flattening: postings arrive block-ordered by first_doc_id
    terms = []
    for term, g in pdf.groupby("term", sort=False):
        g = g.sort_values("first_doc_id", kind="mergesort")
        doc_ids = np.concatenate([np.asarray(x, dtype=np.int64) for x in g["doc_ids"]])
        tfs = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["tfs"]])
        dls = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["dls"]])
        df = float(g["df"].iloc[0])
        qtf = float(g["qtf"].iloc[0])
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        w = qtf * idf
        bmax_tf = g["block_max_tf"].to_numpy(dtype=np.float64)
        bmin_dl = g["block_min_dl"].to_numpy(dtype=np.float64)
        ub = w * (bmax_tf * (k1 + 1.0)
                  / (bmax_tf + k1 * (1.0 - b + b * bmin_dl / avgdl)))
        terms.append({
            "doc_ids": doc_ids, "tfs": tfs, "dls": dls, "w": w,
            "b_first": g["first_doc_id"].to_numpy(dtype=np.int64),
            "b_last": g["last_doc_id"].to_numpy(dtype=np.int64),
            "b_ub": ub,
        })

    lo = min(int(t["b_first"].min()) for t in terms)
    hi = max(int(t["b_last"].max()) for t in terms)
    width = max(1, (hi - lo + 1 + n_segments - 1) // n_segments)
    n_seg = (hi - lo) // width + 1

    # segment bound = Σ_terms max block-ub intersecting the segment
    seg_ub = np.zeros(n_seg, dtype=np.float64)
    for t in terms:
        tm = np.zeros(n_seg, dtype=np.float64)
        s0 = (t["b_first"] - lo) // width
        s1 = (t["b_last"] - lo) // width
        for i in range(len(s0)):          # per-block; blocks ≪ postings
            a, z = int(s0[i]), int(s1[i])
            u = t["b_ub"][i]
            seg = tm[a:z + 1]
            np.maximum(seg, u, out=seg)
        seg_ub += tm

    order = np.argsort(-seg_ub, kind="mergesort")

    # running local top-k under the FINAL total order:
    # (round(score, 6) DESC, doc_id ASC)
    top_scores = np.empty(0, dtype=np.float64)
    top_docs = np.empty(0, dtype=np.int64)
    theta = -np.inf
    n_scored_segments = 0
    for si in order:
        if seg_ub[si] <= 0.0:
            break
        if seg_ub[si] < theta - _PRUNE_MARGIN:
            break  # segments are in descending bound: all the rest prune
        n_scored_segments += 1
        d_lo = lo + si * width
        d_hi = d_lo + width  # exclusive
        seg_docs = []
        seg_partials = []
        for t in terms:
            a = np.searchsorted(t["doc_ids"], d_lo, side="left")
            z = np.searchsorted(t["doc_ids"], d_hi, side="left")
            if a == z:
                continue
            tf = t["tfs"][a:z]
            dl = t["dls"][a:z]
            sat = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            seg_docs.append(t["doc_ids"][a:z])
            seg_partials.append(t["w"] * sat)
        if not seg_docs:
            continue
        docs = np.concatenate(seg_docs)
        partials = np.concatenate(seg_partials)
        u_docs, inv = np.unique(docs, return_inverse=True)
        scores = np.zeros(u_docs.size, dtype=np.float64)
        np.add.at(scores, inv, partials)
        # merge into running top-k
        all_docs = np.concatenate([top_docs, u_docs])
        all_scores = np.concatenate([top_scores, scores])
        r = np.round(all_scores, 6)
        sel = np.lexsort((all_docs, -r))[:k]
        top_docs, top_scores = all_docs[sel], all_scores[sel]
        if top_docs.size >= k:
            theta = top_scores.min()

    return pd.DataFrame({
        "qid": np.repeat(qid, top_docs.size),
        "doc_id": top_docs,
        "score": top_scores,
    })


def wand_topk(index_dl: DataFrame, qterms: DataFrame, n_docs: int,
              avgdl: float, k: int = TOP_K_DEFAULT, k1: float = BM25_K1,
              b: float = BM25_B, salt_buckets: int = SALT_BUCKETS,
              n_segments: int = 64) -> DataFrame:
    """Top-k BM25 over the blocked index WITH inline dl
    (postings_blocked(..., ds=doc_stats)) using block-max pruning.
    Rank- and score-identical to bm25_topk (property-gated).

    The doc-range grouping key comes from the index's own ``salt``
    column when present (postings_blocked stamps each block with the
    range it was built in), so correctness cannot depend on the caller
    passing the same ``salt_buckets``/``n_docs`` the build used; the
    parameter-derived span is only a fallback for legacy indexes
    without the column."""
    if "salt" in index_dl.columns:
        range_col = F.col("salt").cast("int")
    else:
        span = max(1, (n_docs + salt_buckets - 1) // salt_buckets)
        range_col = (F.col("first_doc_id") / span).cast("int")
    hits = (
        index_dl.join(F.broadcast(qterms), "term", "inner")
        .select(
            "qid", "qtf", "term", "df",
            "first_doc_id", "last_doc_id", "block_max_tf", "block_min_dl",
            F.transform("postings", lambda p: p["doc_id"]).alias("doc_ids"),
            F.transform("postings", lambda p: p["tf"]).alias("tfs"),
            F.transform("postings", lambda p: p["dl"]).alias("dls"),
            range_col.alias("_range"),
        )
    )

    def scorer(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_group(pdf, n_docs, avgdl, k, k1, b, n_segments)

    local = hits.groupBy("qid", "_range").applyInPandas(scorer, schema=_OUT_SCHEMA)
    return _topk(local, k)
