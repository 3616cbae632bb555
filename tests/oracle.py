"""Pure-Python exact BM25 reference oracle (SURVEY.md §5.2, FIXTURES.md §3).

This is the executable stand-in for the reference's query engine
(Elasticsearch 7 / Lucene BM25, k1=1.2 b=0.75 — /root/reference/app/go.mod
pins olivere/elastic/v7; the live ES is not runnable here). Deliberately
simple and single-process: dict/Counter data structures, float64 math,
no numpy, no shared code with the engine beyond the written spec:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(d) = sum_t idf(t) * tfn(t, d)
    ranking  = score desc, doc_id asc; AND semantics: every query term
               must occur in the doc (reference match operator=and,
               elasticAddressRepository.go:483).
"""

from __future__ import annotations

import math
import re
from collections import Counter

K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    return re.findall(r"\w+", text.lower())


def expand(tokens: list[str], mode: str, lo: int, hi: int) -> list[str]:
    if mode == "standard":
        return tokens
    out: list[str] = []
    for t in tokens:
        if mode == "edge_ngram":
            for i in range(lo, min(len(t), hi) + 1):
                out.append(t[:i])
        elif mode == "ngram":
            for size in range(lo, min(len(t), hi) + 1):
                for j in range(len(t) - size + 1):
                    out.append(t[j : j + size])
        else:
            raise ValueError(mode)
    return out


class OracleIndex:
    """In-memory exact index over {doc_id: content}."""

    def __init__(
        self,
        docs: dict[int, str],
        mode: str = "standard",
        min_gram: int = 1,
        max_gram: int = 40,
        attrs: dict[int, dict] | None = None,
    ):
        self.mode, self.lo, self.hi = mode, min_gram, max_gram
        self.attrs = attrs or {}
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        for doc_id, content in docs.items():
            toks = expand(tokenize(content), mode, min_gram, max_gram)
            self.tf[doc_id] = Counter(toks)
            self.dl[doc_id] = len(toks)
        self.n = len(docs)
        self.avgdl = (
            sum(self.dl.values()) / self.n if self.n else 0.0
        )
        self.df: Counter = Counter()
        for c in self.tf.values():
            for term in c:
                self.df[term] += 1

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def search(
        self,
        query: str,
        k: int = 10,
        offset: int = 0,
        mode: str = "and",
        predicate=None,
        msm: int | None = None,
        boosts: dict[str, float] | None = None,
    ) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), AND semantics by default.

        ``predicate(attrs_of_doc) -> bool`` composes like the reference's
        bool filter context (unscored pre-filter,
        elasticAddressRepository.go:449-452).

        ``msm`` = ES minimum_should_match (or-mode): doc must match at
        least that many distinct query terms. ``boosts`` multiply a term's
        idf (ES clause boost)."""
        # search-time analyzer is always standard+lowercase, distinct terms
        qterms: list[str] = []
        for t in tokenize(query):
            if t not in qterms:
                qterms.append(t)
        if not qterms:
            return []
        scored: list[tuple[int, float]] = []
        for doc_id, tfs in self.tf.items():
            if predicate is not None and not predicate(
                self.attrs.get(doc_id, {})
            ):
                continue
            matched = [t for t in qterms if tfs.get(t, 0) > 0]
            if mode == "and" and len(matched) != len(qterms):
                continue
            if not matched:
                continue
            if msm is not None and len(matched) < msm:
                continue
            dl = self.dl[doc_id]
            s = 0.0
            for t in matched:
                tf = tfs[t]
                tfn = (
                    tf
                    * (K1 + 1.0)
                    / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                )
                w = (boosts or {}).get(t, 1.0)
                s += self.idf(t) * w * tfn
            scored.append((doc_id, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[offset : offset + k]

    def count(self, query: str | None = None, predicate=None) -> int:
        if query is None and predicate is None:
            return self.n
        hits = self.search(
            query or "", k=self.n, mode="and", predicate=predicate
        )
        if query:
            return len(hits)
        return sum(
            1
            for d in self.tf
            if predicate is None or predicate(self.attrs.get(d, {}))
        )
