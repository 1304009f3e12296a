"""Single-process BM25 oracle (SURVEY.md §0, §5).

The reference has no BM25 (SURVEY.md §0), so "rank-identical to the
reference" is operationalized as rank-identity (docIDs AND float64 scores)
against this pure-Python/NumPy scorer, which uses the reference's exact
tokenization (``clean_query`` ≡ /root/reference/dataprocess/cleaners.py:38-41)
and classic BM25:

    idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(d, q) = Σ_{t ∈ unique(q)} idf(t) · (k1+1)·tf / (tf + k1·(1-b+b·|d|/avgdl))

with k1 = 1.2, b = 0.75, float64 throughout. Duplicate query terms count
once (set semantics). Tie-break: score desc, then doc_id asc.

This is the analog of the reference's ``brute_force_search``
(/root/reference/index/hash_index.py:81-90): a linear scan that defines
ground truth for the distributed engine.
"""

from __future__ import annotations

import math
from collections import Counter

from .codec import BM25_B, BM25_K1
from .text import clean_query


class OracleBM25:
    """In-memory exact BM25 over a small corpus. Test/ground-truth only."""

    def __init__(self, docs: dict[int, str], k1: float = BM25_K1, b: float = BM25_B):
        self.k1, self.b = k1, b
        self.tf: dict[int, Counter] = {}
        self.doc_len: dict[int, int] = {}
        self.df: Counter = Counter()
        for doc_id, content in docs.items():
            toks = clean_query(content or "")
            if not toks:
                continue  # empty-doc filter, reference main.py:32-33
            c = Counter(toks)
            self.tf[doc_id] = c
            self.doc_len[doc_id] = len(toks)
            self.df.update(c.keys())
        self.n_docs = len(self.tf)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, query: str, doc_id: int) -> float:
        # sorted unique terms + parenthesization chosen to match the
        # engine's float64 evaluation order exactly (codec.bm25_tf_part,
        # query.py) so scores are bitwise identical, not just close.
        terms = sorted(set(clean_query(query)))
        c = self.tf.get(doc_id)
        if not c:
            return 0.0
        dl = float(self.doc_len[doc_id])
        s = 0.0
        for t in terms:
            tf = float(c.get(t, 0))
            if tf == 0.0:
                continue
            norm = self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
            s += self.idf(t) * ((self.k1 + 1.0) * tf / (tf + norm))
        return s

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact top-k: (doc_id, score), score desc then doc_id asc.
        Docs with score 0 (no query term) are excluded."""
        scored = []
        for doc_id in self.tf:
            s = self.score(query, doc_id)
            if s > 0.0:
                scored.append((doc_id, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
