"""Semantic properties of the twelfth-wave surfaces: batched msearch,
grouped top-hits, rank-feature saturation scoring, and span-first gated
ranking. The DuckDB oracle pins exact values; these pin the MEANING
against brute force derived from the raw text."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def P(ray_session):
    from stacksearch_ray.pipelines import documents as P

    return P


def _doc_texts(P):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_search_many_matches_single_searches(P):
    eng = P._index_for(SF)
    queries = list(P.MSEARCH_QUERIES) + ["", "zzz_missing"]
    got = eng.search_many(queries, 10)
    assert got == [eng.search(q, 10) for q in queries]
    assert got[-2] == [] and got[-1] == []


def test_msearch_entry_rows(P):
    t = P.msearch(SF).to_pandas()
    # every query contributes a contiguous ranked block
    for qi in range(len(P.MSEARCH_QUERIES)):
        sub = t[t["query_id"] == qi]
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
        assert len(sub) > 0, P.MSEARCH_QUERIES[qi]
        # scores non-increasing within a query
        assert (np.diff(sub["score_micros"].to_numpy()) <= 0).all()


def test_span_first_gate_brute_force(P):
    """The positional gate == raw-text derivation: first occurrence of
    the term within the leading LIMIT kept tokens (1-based ≤ limit ⇔
    membership in toks[:limit]); survivors keep their UNFILTERED
    scores."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    texts = _doc_texts(P)
    allowed = {d for d, txt in texts.items()
               if P.SPAN_FIRST_TERM
               in clean_query(txt, max_tokens=None)[:P.SPAN_FIRST_LIMIT]}
    containing = {d for d, txt in texts.items()
                  if P.SPAN_FIRST_TERM in clean_query(txt, max_tokens=None)}
    # the gate must genuinely bite (not reduce to term containment)
    assert allowed and allowed < containing
    got = eng.search_span_first(P.BM25_QUERY, 10,
                                first_term=P.SPAN_FIRST_TERM,
                                limit=P.SPAN_FIRST_LIMIT)
    want = eng.search_filtered(P.BM25_QUERY, 10,
                               allowed_doc_ids=sorted(allowed))
    assert got == want and len(got) > 0
    # survivors carry unfiltered scores
    full = dict(eng.search(P.BM25_QUERY, len(eng.doclens.ids)))
    for d, s in got:
        assert d in allowed and full[d] == s


def test_span_first_validates_term(P):
    eng = P._index_for(SF)
    with pytest.raises(ValueError):
        eng.search_span_first(P.BM25_QUERY, 10, first_term="merge sort",
                              limit=3)
    with pytest.raises(ValueError):
        eng.search_span_first(P.BM25_QUERY, 10, first_term="the", limit=3)
    # unknown term: empty, not an error
    assert eng.search_span_first(P.BM25_QUERY, 10,
                                 first_term="zzzmissing", limit=3) == []


def test_sharded_span_first_identity(P, ray_session):
    from stacksearch_ray.query import ShardedQueryEngine

    eng = P._index_for(SF)
    sharded = ShardedQueryEngine(eng.index_dir, num_workers=3)
    for limit in (1, 3, 10):
        got = sharded.search_span_first(P.BM25_QUERY, 10,
                                        first_term=P.SPAN_FIRST_TERM,
                                        limit=limit)
        want = eng.search_span_first(P.BM25_QUERY, 10,
                                     first_term=P.SPAN_FIRST_TERM,
                                     limit=limit)
        assert got == want, limit


def test_top_hits_brute_force(P):
    """Each lang bucket's hits are exactly its best per_group matched
    docs (score desc, doc asc), independent of the collapse walk."""
    import pyarrow.parquet as pq

    from stacksearch_ray.micros import to_micros

    eng = P._index_for(SF)
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "lang"])
    lang_of = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    ranked = eng.search(P.BM25_QUERY, len(eng.doclens.ids))
    per_lang: dict[str, list] = {}
    for d, s in ranked:  # already score desc, doc asc
        lg = lang_of[d]
        if len(per_lang.setdefault(lg, [])) < P.TOPHITS_PER_GROUP:
            per_lang[lg].append((d, to_micros(s)))
    want = []
    for lg in sorted(per_lang):
        for gr, (d, sm) in enumerate(per_lang[lg], 1):
            want.append((lg, d, sm, gr))
    got = [tuple(r) for r in P.top_hits_by_label(SF).to_pandas()
           .itertuples(index=False)]
    assert got == want and len(got) > 0


def test_rank_feature_brute_force(P):
    """combined = bm25 + w·sat(n_chars) over matched docs, top-10 by
    (combined desc, doc asc) — recomputed from the full ranking."""
    import pyarrow.parquet as pq

    from stacksearch_ray.micros import to_micros

    eng = P._index_for(SF)
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["doc_id", "n_chars"])
    nc = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    full = eng.search(P.BM25_QUERY, len(eng.doclens.ids))
    combined = [(d, s + P.RANK_FEATURE_W
                 * (nc[d] / (nc[d] + P.RANK_FEATURE_PIVOT)))
                for d, s in full]
    combined.sort(key=lambda x: (-x[1], x[0]))
    want = [(d, to_micros(s), r)
            for r, (d, s) in enumerate(combined[:10], 1)]
    got = [tuple(r) for r in P.rank_feature_search(SF).to_pandas()
           .itertuples(index=False)]
    assert got == want
    # saturation is bounded: the prior can never exceed w itself
    base = dict(full)
    for d, sm, _ in got:
        assert sm <= to_micros(base[d] + P.RANK_FEATURE_W) + 1


def test_phrase_prefix_brute_force(P):
    """Gate == raw-text derivation: fixed tokens adjacent in the kept
    stream, immediately followed by any prefix-expanded kept term;
    survivors keep unfiltered fixed-term scores."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    texts = _doc_texts(P)
    allowed = set()
    for d, txt in texts.items():
        toks = clean_query(txt, max_tokens=None)
        for i in range(len(toks) - 1):
            if toks[i] == "merge" and toks[i + 1].startswith("s"):
                allowed.add(d)
                break
    assert allowed
    got = eng.search_phrase_prefix(P.PHRASE_PREFIX, 10,
                                   max_expansions=P.PP_MAX_EXP)
    want = eng.search_filtered("merge", 10,
                               allowed_doc_ids=sorted(allowed))
    assert got == want and len(got) > 0
    full = dict(eng.search("merge", len(eng.doclens.ids)))
    for d, s in got:
        assert d in allowed and full[d] == s


def test_phrase_prefix_expansion_cap(P):
    """max_expansions keeps the FIRST N expansions in term order — the
    capped result equals gating on exactly that subset."""
    from stacksearch_ray.text import clean_query

    eng = P._index_for(SF)
    exps = eng.prefix_terms("s")
    assert len(exps) >= 3 and exps == sorted(exps)
    capped = eng.search_phrase_prefix("merge s", 500, max_expansions=2)
    texts = _doc_texts(P)
    keep = set(exps[:2])
    allowed = set()
    for d, txt in texts.items():
        toks = clean_query(txt, max_tokens=None)
        if any(toks[i] == "merge" and toks[i + 1] in keep
               for i in range(len(toks) - 1)):
            allowed.add(d)
    assert {d for d, _ in capped} == allowed


def test_phrase_prefix_guards_and_stopword_prefix(P):
    eng = P._index_for(SF)
    with pytest.raises(ValueError):
        eng.search_phrase_prefix("merge", 10)  # bare prefix
    with pytest.raises(ValueError):
        eng.search_phrase_prefix("the s", 10)  # fixed all stopwords
    # a stopword-shaped prefix must NOT vanish: 'so*' expands 'sort'
    res = eng.search_phrase_prefix("merge so", 10)
    assert res, "'merge so' should match 'merge sort' docs"
    # unknown prefix: empty, not an error
    assert eng.search_phrase_prefix("merge zzz", 10) == []


def test_sharded_phrase_prefix_identity(P, ray_session):
    from stacksearch_ray.query import ShardedQueryEngine

    eng = P._index_for(SF)
    sharded = ShardedQueryEngine(eng.index_dir, num_workers=3)
    for phrase, cap in (("merge s", 50), ("merge s", 2), ("sort jo", 50)):
        got = sharded.search_phrase_prefix(phrase, 10, max_expansions=cap)
        want = eng.search_phrase_prefix(phrase, 10, max_expansions=cap)
        assert got == want, (phrase, cap)
