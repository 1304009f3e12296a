"""BM25F / term_vectors / dsir_weights: third-derivation ground truth
(straight from the texts, independent of both the index and the DuckDB
oracle), plus the term_postings accessor's parity with brute tf counts."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _doc_tokens(sf_dir):
    import pyarrow.parquet as pq

    from stacksearch_ray.text import clean_query

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    return [(t["doc_id"][i].as_py(),
             clean_query(t["text"][i].as_py(), max_tokens=None),
             t["lang"][i].as_py())
            for i in range(t.num_rows)]


def test_term_postings_matches_brute(ray_session, tmp_path):
    from stacksearch_ray.build import build_index
    from stacksearch_ray.corpus import generate_corpus, write_corpus
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import doc_id_for
    from stacksearch_ray.text import clean_query

    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    write_corpus(corpus_dir, 200, rows_per_file=50)
    build_index(corpus_dir, index_dir, num_shards=4)
    eng = QueryEngine(index_dir)

    tbl = generate_corpus(200)
    brute: dict[str, dict[int, int]] = {}
    for i in range(200):
        did = doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                         tbl["commit"][i].as_py())
        for tok in clean_query(tbl["content"][i].as_py(), max_tokens=None):
            brute.setdefault(tok, {}).setdefault(did, 0)
            brute[tok][did] += 1
    # a mid-df term exercises multi-segment merge; a missing term the
    # empty path
    probe = sorted(brute, key=lambda t: (-len(brute[t]), t))[3]
    ids, tfs = eng.term_postings(probe)
    assert list(ids) == sorted(brute[probe])
    assert {int(d): int(f) for d, f in zip(ids, tfs)} == brute[probe]
    ids0, tfs0 = eng.term_postings("zzzznotaterm")
    assert ids0.size == 0 and tfs0.size == 0


def test_bm25f_matches_brute_force(ray_session):
    from stacksearch_ray.micros import to_micros
    from stacksearch_ray.pipelines.documents import (
        BM25F_B,
        BM25F_K1,
        BM25F_WB,
        BM25F_WT,
        BM25_QUERY,
        TITLE_K,
        bm25f_search,
    )
    from stacksearch_ray.text import clean_query

    docs = [(d, toks[:TITLE_K], toks[TITLE_K:])
            for d, toks, _ in _doc_tokens(SF) if toks]
    terms = sorted(set(clean_query(BM25_QUERY)))
    n_docs = float(len(docs))
    avg_t = sum(len(t) for _, t, _ in docs) / len(docs)
    bodies = [b for _, _, b in docs if b]
    avg_b = sum(len(b) for b in bodies) / len(bodies)
    scores: dict[int, float] = {}
    for term in terms:
        df = float(sum(1 for _, t, b in docs
                       if term in t or term in b))
        if df == 0:
            continue
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for d, t, b in docs:
            tft, tfb = float(t.count(term)), float(b.count(term))
            if tft == 0.0 and tfb == 0.0:
                continue
            wtf = (BM25F_WT * (tft / (1.0 - BM25F_B
                                      + BM25F_B * (len(t) / avg_t)))
                   + BM25F_WB * ((tfb / (1.0 - BM25F_B
                                         + BM25F_B * (len(b) / avg_b)))
                                 if b else 0.0))
            scores[d] = scores.get(d, 0.0) + idf * (
                (BM25F_K1 + 1.0) * wtf / (wtf + BM25F_K1))
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = bm25f_search(SF)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    gm = got["score_micros"].to_pylist()
    wm = [to_micros(s) for _, s in want]
    # brute avgdl is a plain float mean vs the engine's stored stat —
    # micros absorb the ≤1-ulp gap, allow exactly that much
    assert all(abs(a - b) <= 1 for a, b in zip(gm, wm))


def test_term_vectors_brute(ray_session):
    from stacksearch_ray.pipelines.documents import TV_DOC_ID, term_vectors

    all_docs = [(d, toks) for d, toks, _ in _doc_tokens(SF) if toks]
    target = dict(all_docs)[TV_DOC_ID]
    tv = term_vectors(SF)
    assert tv["term"].to_pylist() == sorted(set(target))
    for term, tf, df in zip(tv["term"].to_pylist(),
                            tv["tf"].to_pylist(), tv["df"].to_pylist()):
        assert tf == target.count(term)
        assert df == sum(1 for _, toks in all_docs if term in toks)
    # contributions are positive, terms with equal tf rank by rarity
    assert all(c > 0 for c in tv["contrib_micros"].to_pylist())


def test_dsir_weights_brute(ray_session):
    from stacksearch_ray.pipelines.documents import (
        DSIR_K,
        DSIR_TARGET_LANG,
        dsir_weights,
    )

    docs = _doc_tokens(SF)
    c_all: dict[str, int] = {}
    c_en: dict[str, int] = {}
    for _, toks, lang in docs:
        for tok in toks:
            c_all[tok] = c_all.get(tok, 0) + 1
            if lang == DSIR_TARGET_LANG:
                c_en[tok] = c_en.get(tok, 0) + 1
    n_all, n_en, v = (float(sum(c_all.values())),
                      float(sum(c_en.values())), float(len(c_all)))
    lr = {t: int(np.floor((math.log((c_en.get(t, 0) + 1.0) / (n_en + v))
                           - math.log((c + 1.0) / (n_all + v)))
                          * 1e6 + 0.5))
          for t, c in c_all.items()}
    weights = {}
    for d, toks, _ in docs:
        if toks:
            weights[d] = sum(lr[t] for t in toks)
    want = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:DSIR_K]
    got = dsir_weights(SF)
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    assert got["weight_micros"].to_pylist() == [w for _, w in want]
    assert got["rank"].to_pylist() == list(range(1, len(want) + 1))
    # the signal points the right way: target-language docs average a
    # higher per-token importance weight than the rest (per-token, so
    # doc length doesn't confound the tiny shared sf0.001 vocab)
    langs = {d: lang for d, _, lang in docs}
    lens = {d: len(toks) for d, toks, _ in docs if toks}
    per_tok = {d: w / lens[d] for d, w in weights.items()}
    en = [per_tok[d] for d in per_tok if langs[d] == DSIR_TARGET_LANG]
    rest = [per_tok[d] for d in per_tok if langs[d] != DSIR_TARGET_LANG]
    assert sum(en) / len(en) > sum(rest) / len(rest)
