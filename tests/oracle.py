"""Pure-Python oracle — independent reimplementation of the engine
semantics (SURVEY.md §5.1) used as the rank/score-identity reference.

Shares ONLY the frozen contracts in search_engine_spark.conf (tokenizer
regex, k1/b, tie order, rounding); all computation here is plain
Python/stdlib, no Spark.

Reference parity: the per-doc Counter build mirrors
src/invertedIndex.py getTokenCounts (:629-659); df = posting-list
length (:718); doc length L2 = sqrt(sum tf^2) (:675-684); TAAT
accumulation (:527-532); top-k (:286,568) with the deterministic tie
order the engine pins (score DESC, doc_id ASC).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from search_engine_spark.conf import BM25_K1, BM25_B, PIVOT, PIVOT_SLOPE
from search_engine_spark.functions.tokenize import tokenize_py

SCORE_DECIMALS = 6


def round_half_up(x: float, d: int = SCORE_DECIMALS) -> float:
    """Match Spark's F.round (HALF_UP) and DuckDB round for positives —
    Python's round() is banker's rounding, which would diverge."""
    m = 10 ** d
    return math.floor(x * m + 0.5) / m


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str | None]], filter_stopwords: bool = False):
        """docs: (doc_id, text). Builds per-doc counts, postings, stats."""
        self.tf: dict[int, Counter] = {}
        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.N = len(docs)
        for doc_id, text in sorted(docs):
            toks = tokenize_py(text, filter_stopwords)
            if not toks:
                continue
            cnt = Counter(toks)
            self.tf[doc_id] = cnt
            for term in sorted(cnt):
                self.postings[term].append((doc_id, cnt[term]))
        self.df = {t: len(p) for t, p in self.postings.items()}
        self.cf = {t: sum(tf for _, tf in p) for t, p in self.postings.items()}
        self.dl = {d: sum(c.values()) for d, c in self.tf.items()}
        self.len_l2 = {d: math.sqrt(sum(v * v for v in c.values())) for d, c in self.tf.items()}
        self.uniq = {d: len(c) for d, c in self.tf.items()}
        self.max_tf = {d: max(c.values()) for d, c in self.tf.items()}
        self.ave_tf = {d: sum(c.values()) / len(c) for d, c in self.tf.items()}
        self.avgdl = (sum(self.dl.values()) / len(self.dl)) if self.dl else 0.0

    # --- BM25 ----------------------------------------------------------
    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def bm25_topk(self, title: str, k: int,
                  k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[int, int, float]]:
        """[(doc_id, rank, score_rounded)] in rank order."""
        qcounts = Counter(tokenize_py(title))
        scores: dict[int, float] = defaultdict(float)
        for term, qtf in sorted(qcounts.items()):
            if term not in self.postings:
                continue
            idf = self.idf(term)
            for doc_id, tf in self.postings[term]:
                dl_norm = 1.0 - b + b * self.dl[doc_id] / self.avgdl
                sat = tf * (k1 + 1.0) / (tf + k1 * dl_norm)
                scores[doc_id] += qtf * idf * sat
        ranked = sorted(((round_half_up(s), d) for d, s in scores.items()),
                        key=lambda x: (-x[0], x[1]))[:k]
        return [(d, i + 1, s) for i, (s, d) in enumerate(ranked)]

    def bm25_topk_conj(self, title: str, k: int,
                       k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[int, int, float]]:
        """AND-semantics BM25: filter-based oracle — score exactly like
        bm25_topk but keep only docs whose term set covers EVERY query
        term (strict: an OOV query term means no doc qualifies)."""
        need = set(Counter(tokenize_py(title)))
        full = self.bm25_topk(title, k=self.N or 1)
        keep = [(d, s) for d, _, s in full
                if need and need <= set(self.tf.get(d, ()))]
        return [(d, i + 1, s) for i, (d, s) in enumerate(keep[:k])]

    # --- SMART ddd.qqq (reference calculateWeightOfTerm :171-202) ------
    def _tf_w(self, scheme: str, tf: int, doc_id: int) -> float:
        if scheme == "n":
            return float(tf)
        if scheme == "l":
            return 1.0 + math.log10(tf)
        if scheme == "a":
            return 0.5 + 0.5 * tf / self.max_tf[doc_id]
        if scheme == "b":
            return 1.0 if tf > 0 else 0.0
        if scheme == "L":
            return (1.0 + math.log10(tf)) / (1.0 + math.log10(self.ave_tf[doc_id]))
        raise ValueError(scheme)

    def _df_w(self, scheme: str, term: str) -> float:
        df = self.df.get(term, 0)
        if scheme == "n":
            return 1.0
        if scheme == "t":
            return math.log10(self.N / df)
        if scheme == "p":
            return max(0.0, math.log10((self.N - df) / df))
        raise ValueError(scheme)

    def smart_topk(self, title: str, k: int, scheme: str = "nnc.nnn") -> list[tuple[int, int, float]]:
        ddd, qqq = scheme.split(".")
        qcounts = Counter(tokenize_py(title))
        qws: dict[str, float] = {}
        max_qtf = max(qcounts.values()) if qcounts else 1
        ave_qtf = (sum(qcounts.values()) / len(qcounts)) if qcounts else 1.0
        for t, qtf in qcounts.items():
            if qqq[0] == "n":
                w = float(qtf)
            elif qqq[0] == "l":
                w = 1.0 + math.log10(qtf)
            elif qqq[0] == "a":
                w = 0.5 + 0.5 * qtf / max_qtf
            elif qqq[0] == "b":
                w = 1.0
            elif qqq[0] == "L":
                w = (1.0 + math.log10(qtf)) / (1.0 + math.log10(ave_qtf))
            else:
                raise ValueError(qqq)
            qws[t] = w
        qnorm = math.sqrt(sum(w * w for w in qws.values())) or 1.0 if qqq[2] == "c" else 1.0
        scores: dict[int, float] = defaultdict(float)
        for term, qw0 in sorted(qws.items()):
            if term not in self.postings:
                continue
            qw = (qw0 / qnorm) * self._df_w(qqq[1], term)
            for doc_id, tf in self.postings[term]:
                dw = self._tf_w(ddd[0], tf, doc_id) * self._df_w(ddd[1], term)
                if ddd[2] == "c":
                    dw /= self.len_l2[doc_id]
                elif ddd[2] == "u":
                    dw /= PIVOT_SLOPE * self.uniq[doc_id] + (1.0 - PIVOT_SLOPE) * PIVOT
                scores[doc_id] += qw * dw
        ranked = sorted(((round_half_up(s), d) for d, s in scores.items()),
                        key=lambda x: (-x[0], x[1]))[:k]
        return [(d, i + 1, s) for i, (s, d) in enumerate(ranked)]
