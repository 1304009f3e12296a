"""User-extension registries (SURVEY.md §2.10).

The reference exposes pluggable hash/distance/feature hooks
(`hash_func` injection /root/reference/index/index_new.py:16,
`distance_func`/`key_extractor` /root/reference/index/hash_index.py:27-28,
`HParams.getFeatureExtractor` /root/reference/hparams.py:32-36,
`resolve_data_set` /root/reference/dataprocess/api.py:124-138).

Ours: named registries for tokenizers, scorers and sources. A scorer is
``fn(tf, doc_len, df, n_docs, avgdl) -> float64 ndarray`` (idf-inclusive,
vectorized over postings); the query engine's exhaustive path accepts any
registered scorer, so ranking functions beyond BM25 (TF-IDF, constant,
user-defined) plug in without touching the engine. A scorer that also
declares keyword params ``cf`` / ``total_len`` (or ``**kwargs``) is a
COLLECTION-STATS scorer: the engine passes the term's global collection
frequency and the corpus's total kept-token count (language-model
similarities need p(t|C) = cf/total_len — see ``lm_dirichlet``).
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np

_TOKENIZERS: dict[str, Callable] = {}
_SCORERS: dict[str, Callable] = {}
_SOURCES: dict[str, Callable] = {}


def register_tokenizer(name: str):
    def deco(fn):
        _TOKENIZERS[name] = fn
        return fn
    return deco


def get_tokenizer(name: str) -> Callable:
    return _TOKENIZERS[name]


def register_scorer(name: str):
    def deco(fn):
        _SCORERS[name] = fn
        return fn
    return deco


def get_scorer(name: str) -> Callable:
    return _SCORERS[name]


def register_source(name: str):
    def deco(fn):
        _SOURCES[name] = fn
        return fn
    return deco


def get_source(name: str) -> Callable:
    return _SOURCES[name]


def names() -> dict[str, list[str]]:
    return {"tokenizers": sorted(_TOKENIZERS), "scorers": sorted(_SCORERS),
            "sources": sorted(_SOURCES)}


# ---- built-ins ----

from .text import clean_query  # noqa: E402

register_tokenizer("reference")(clean_query)


@register_tokenizer("suffix_stem")
def suffix_stem_tokenizer(query: str, max_tokens: int | None = 16
                          ) -> list[str]:
    """Analyzer = reference tokenize → 3-rule suffix stem (ing/ed/s,
    ≥3-char stems). The same rules run vectorized over Arrow token
    arrays at index time (pipelines/documents._stem_flat) and in the
    DuckDB oracle (pipelines/sql.stemmed_topk_sql) — RE2 semantics on
    all three paths, pinned token-for-token by tests."""
    from .text import stem_token

    return [stem_token(t) for t in clean_query(query, max_tokens=max_tokens)]


@register_scorer("bm25")
def bm25_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                n_docs: int, avgdl: float,
                k1: float = 1.2, b: float = 0.75) -> np.ndarray:
    from .codec import bm25_tf_part

    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * bm25_tf_part(tf, doc_len, avgdl, k1, b)


@register_scorer("tfidf")
def tfidf_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                 n_docs: int, avgdl: float) -> np.ndarray:
    idf = math.log(n_docs / max(df, 1))
    # ln(1+tf), spelled exactly like the DuckDB oracle's ln(1.0 + tf)
    # (np.log1p is more accurate for tiny x but not bit-identical)
    return idf * np.log(1.0 + tf.astype(np.float64))


@register_scorer("bm25_plus")
def bm25_plus_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                     n_docs: int, avgdl: float,
                     k1: float = 1.2, b: float = 0.75,
                     delta: float = 1.0) -> np.ndarray:
    """BM25+ (Lv & Zhai, CIKM 2011): the lower-bounded tf normalization
    — a constant δ added to the saturated tf part so long documents
    that DO match a term can never score below a floor:

        score(t, d) = ln((n_docs + 1)/df) · (bm25_tf_part + δ)

    idf uses the BM25+ paper's ln((N+1)/df) (always > 0 for df ≤ N, so
    the δ floor can't flip sign). Mirrored micros-bitwise by the DuckDB
    oracle (pipelines/sql.bm25plus_topk_sql): identical float expression
    order, δ injected as the same literal."""
    from .codec import bm25_tf_part

    # max(df, 1): alive-df can be 0 with pending tombstones (all docs
    # holding the term deleted) — those rows' contributions are masked
    # from results anyway, and the oracle's df CTE never sees df=0
    idf = math.log((n_docs + 1.0) / max(df, 1))
    return idf * (bm25_tf_part(tf, doc_len, avgdl, k1, b) + delta)


@register_scorer("match_count")
def match_count_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                       n_docs: int, avgdl: float) -> np.ndarray:
    """Coordination-level ranking: one point per matched query term."""
    return np.ones(len(tf), dtype=np.float64)


@register_scorer("lm_dirichlet")
def lm_dirichlet_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                        n_docs: int, avgdl: float, *,
                        cf: int, total_len: int,
                        mu: float = 2000.0) -> np.ndarray:
    """Query-likelihood with Dirichlet smoothing (Zhai & Lafferty 2001;
    the Lucene ``LMDirichletSimilarity`` analog), per-term clamp at 0:

        score(t, d) = max(0, ln(1 + tf / (mu · cf/total_len))
                             + ln(mu / (dl + mu)))

    Collection-stats scorer: declares keyword params ``cf`` (global
    collection frequency of the term) and ``total_len`` (total kept
    tokens) — the engine detects them in the signature and supplies
    both (query.py _search_exhaustive). cf is PHYSICAL (segment/
    term_dict counts): exact on clean, purged or compacted indexes;
    with pending tombstones it still counts the deleted docs'
    occurrences (purge_doc_ids / compact_index restore exactness),
    while result masking stays exact either way. Expression order is
    mirrored by the DuckDB oracle (pipelines/sql.py) micros-bitwise:
    ln(1.0 + tf / ((mu · cf) / total_len)) + ln(mu / (dl + mu))."""
    s = (np.log(1.0 + tf.astype(np.float64) / (mu * float(cf)
                                               / float(total_len)))
         + np.log(mu / (doc_len.astype(np.float64) + mu)))
    return np.maximum(0.0, s)


@register_scorer("lm_jelinek_mercer")
def lm_jelinek_mercer_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
                             n_docs: int, avgdl: float, *,
                             cf: int, total_len: int,
                             lam: float = 0.1) -> np.ndarray:
    """Query-likelihood with Jelinek-Mercer (linear) smoothing (Zhai &
    Lafferty 2001; the Lucene ``LMJelinekMercerSimilarity`` analog):

        score(t, d) = ln(1 + ((1-λ)/λ) · (tf/dl) / (cf/total_len))

    Always ≥ 0 for tf ≥ 1, so no clamp. Collection-stats scorer like
    ``lm_dirichlet`` (same cf/total_len binding and the same exactness
    caveats with pending tombstones). The DuckDB oracle
    (pipelines/sql.py lm_jm_topk_sql) mirrors the float expression
    order micros-bitwise: the (1-λ)/λ coefficient is computed HERE and
    injected into the SQL as a literal so both engines use the
    identical double."""
    coef = (1.0 - lam) / lam
    return np.log(1.0 + (coef * (tf.astype(np.float64)
                                 / doc_len.astype(np.float64)))
                  / (float(cf) / float(total_len)))


@register_scorer("dfi")
def dfi_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
               n_docs: int, avgdl: float, *,
               cf: int, total_len: int) -> np.ndarray:
    """Divergence-from-independence (Kocabas/Dincer/Karaoglan 2014; the
    Lucene ``DFISimilarity`` analog, standardized measure): the expected
    tf under independence is e = (cf · dl) / total_len, the standardized
    surprise is (tf − e)/√e, and

        score(t, d) = log2(1 + max(tf − e, 0) / sqrt(e))

    (the max-0 clamp keeps under-represented terms at exactly 0 and the
    log argument ≥ 1 — Lucene likewise never lets a term contribute
    negatively). Collection-stats scorer (cf/total_len binding, same
    pending-tombstone caveat as lm_dirichlet). Expression order is
    mirrored by the DuckDB oracle micros-bitwise: e first, then
    greatest(tf − e, 0)/sqrt(e), then log2(1 + ·)."""
    e = (float(cf) * doc_len.astype(np.float64)) / float(total_len)
    return np.log2(1.0 + np.maximum(tf.astype(np.float64) - e, 0.0)
                   / np.sqrt(e))


@register_scorer("dfr")
def dfr_scorer(tf: np.ndarray, doc_len: np.ndarray, df: int,
               n_docs: int, avgdl: float, *,
               cf: int, total_len: int) -> np.ndarray:
    """Divergence-from-randomness, Lucene ``DFRSimilarity`` with basic
    model G (geometric), after-effect L (Laplace), normalization H2
    (Amati & van Rijsbergen 2002):

        tfn = tf · log2(1 + avgdl/dl)          (H2, c = 1)
        λ   = F/N  (collection freq / doc count)
        score = max(0, (log2(1/(1+λ)) + tfn·log2((1+λ)/λ)) / (tfn+1))

    The max-0 clamp matches Lucene's non-negative-scores contract
    (common terms with λ ≥ 1 and tiny tfn can push the raw gain
    negative). Fourth collection-stats scorer (cf binding; total_len
    unused by the formula but part of the hook signature). Expression
    order mirrored by dfr_topk_sql micros-bitwise: λ recomputed per
    use from the SAME division, tfn per use from the SAME product —
    identical doubles either way."""
    tfn = tf.astype(np.float64) * np.log2(1.0 + avgdl
                                          / doc_len.astype(np.float64))
    lam = float(cf) / float(n_docs)
    raw = (np.log2(1.0 / (1.0 + lam))
           + tfn * np.log2((1.0 + lam) / lam)) / (tfn + 1.0)
    return np.maximum(0.0, raw)
