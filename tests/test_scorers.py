"""Collection-stats scorer hook (lm_dirichlet) + tfidf through the
driver path: brute-force ground truth, shard-subset bitwise identity,
filtered-plan identity, tombstone masking."""

import math

import numpy as np
import pytest

from stacksearch_ray.corpus import generate_corpus, write_corpus
from stacksearch_ray.text import clean_query

MU = 2000.0


@pytest.fixture(scope="module")
def lm_index(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("scorers")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_corpus(corpus_dir, 300, rows_per_file=75)
    build_index(corpus_dir, index_dir, num_shards=4)
    return corpus_dir, index_dir


def _brute_lm(query: str, n_rows: int = 300) -> dict[int, float]:
    """Ground-truth LM-Dirichlet scores straight from the corpus text,
    independent of the index: per-term clamp at 0, summed in sorted-term
    order (the engine's accumulation order)."""
    from stacksearch_ray.schema import doc_id_for

    tbl = generate_corpus(n_rows)
    docs = {}
    for i in range(n_rows):
        did = doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                         tbl["commit"][i].as_py())
        docs[did] = clean_query(tbl["content"][i].as_py(), max_tokens=None)
    total_len = sum(len(t) for t in docs.values() if t)
    terms = sorted(set(clean_query(query)))
    cf = {t: sum(toks.count(t) for toks in docs.values()) for t in terms}
    scores: dict[int, float] = {}
    for did, toks in docs.items():
        if not toks:
            continue
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or cf[t] == 0:
                continue
            val = (math.log(1.0 + tf / (MU * float(cf[t]) / float(total_len)))
                   + math.log(MU / (len(toks) + MU)))
            s += max(0.0, val)
        if s > 0.0:
            scores[did] = s
    return scores


def test_lm_dirichlet_matches_brute_force(lm_index):
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    res = eng.search(q, 10, scorer="lm_dirichlet")
    assert len(res) == 10
    truth = _brute_lm(q)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in res] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(res, want):
        assert s == pytest.approx(ws, abs=1e-12), d


def test_bm25_plus_matches_brute_force(lm_index):
    """BM25+ (Lv & Zhai 2011) through the scorer registry: ground truth
    straight from the corpus text, same expression order as the scorer
    (idf · (part + δ)); δ keeps every matched (doc, term) above idf·δ."""
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import doc_id_for

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    res = eng.search(q, 10, scorer="bm25_plus")
    assert len(res) == 10

    tbl = generate_corpus(300)
    docs = {}
    for i in range(300):
        did = doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                         tbl["commit"][i].as_py())
        docs[did] = clean_query(tbl["content"][i].as_py(), max_tokens=None)
    lens = {d: len(t) for d, t in docs.items() if t}
    n_docs = len(lens)
    avgdl = sum(lens.values()) / n_docs
    terms = sorted(set(clean_query(q)))
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in terms}
    truth = {}
    for did, toks in docs.items():
        if not toks:
            continue
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            part = (1.2 + 1.0) * tf / (tf + 1.2 * (1.0 - 0.75
                    + 0.75 * (len(toks) / avgdl)))
            s += math.log((n_docs + 1.0) / df[t]) * (part + 1.0)
        if s > 0.0:
            truth[did] = s
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in res] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(res, want):
        assert s == pytest.approx(ws, abs=1e-9), d
    # the δ floor: every matched doc scores ≥ Σ_matched idf·δ over its
    # matched terms — spot-check the floor binds above plain bm25
    plain = dict(eng.search(q, 300, method="exhaustive"))
    for d, s in res:
        assert s > plain.get(d, 0.0)


def test_bm25_plus_uses_index_k1_b(ray_session, tmp_path_factory):
    """On a custom-parameter index the bm25_plus tf part must use the
    STORED k1/b (stats.json), not the scorer-signature defaults — the
    'BM25 family' contract."""
    from stacksearch_ray.build import build_index
    from stacksearch_ray.codec import bm25_tf_part
    from stacksearch_ray.query import QueryEngine

    root = tmp_path_factory.mktemp("bm25plus_kb")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_corpus(corpus_dir, 120, rows_per_file=60)
    K1, B = 2.0, 0.5
    build_index(corpus_dir, index_dir, num_shards=2, k1=K1, b=B)
    eng = QueryEngine(index_dir)
    q = "def return import"
    res = eng.search(q, 5, scorer="bm25_plus")
    assert res
    for d, s in res:
        ex = eng.explain(q, d, scorer="bm25_plus")
        # recompute each contribution with the INDEX params
        want = 0.0
        for row in ex["terms"]:
            if row["tf"] == 0:
                continue
            part = float(bm25_tf_part(
                np.array([row["tf"]], dtype=np.float64),
                np.array([row["doc_len"]], dtype=np.float64),
                eng.avgdl, K1, B)[0])
            want += math.log((eng.n_docs + 1.0) / row["df"]) * (part + 1.0)
        assert s == pytest.approx(want, abs=1e-12), d


def test_lm_dirichlet_shard_subset_bitwise(lm_index):
    """Disjoint shard-subset engines (cf via term_dict) reproduce the
    full engine's lm scores bitwise — every doc lives in exactly one
    subset, so the union of per-subset results re-ranked equals full."""
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    full = QueryEngine(index_dir)
    q = "def return import"
    want = full.search(q, 20, scorer="lm_dirichlet")
    got = []
    for subset in ([0, 1], [2, 3]):
        got += QueryEngine(index_dir, shard_subset=subset).search(
            q, 20, scorer="lm_dirichlet")
    got.sort(key=lambda r: (-r[1], r[0]))
    assert got[:len(want)] == want  # floats compared EXACTLY


def test_lm_dirichlet_filtered_plans_identical(lm_index):
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    base = dict(eng.search(q, 300, scorer="lm_dirichlet"))
    allowed = sorted(base)[::3][:20]
    dense = eng.search_filtered(q, 10, allowed_doc_ids=allowed,
                                plan="dense", scorer="lm_dirichlet")
    sel = eng.search_filtered(q, 10, allowed_doc_ids=allowed,
                              plan="selective", scorer="lm_dirichlet")
    assert dense == sel
    for d, s in dense:
        assert s == base[d]  # filtering never changes a survivor's score


def test_lm_dirichlet_masks_deleted(ray_session, tmp_path_factory):
    from stacksearch_ray.append import delete_from_index
    from stacksearch_ray.build import build_index
    from stacksearch_ray.query import QueryEngine

    root = tmp_path_factory.mktemp("scorers_del")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_corpus(corpus_dir, 120, rows_per_file=60)
    build_index(corpus_dir, index_dir, num_shards=2)
    q = "def return import"
    top = QueryEngine(index_dir).search(q, 3, scorer="lm_dirichlet")
    victim = top[0][0]
    delete_from_index(index_dir, [victim])
    res = QueryEngine(index_dir).search(q, 10, scorer="lm_dirichlet")
    assert victim not in {d for d, _ in res}


def test_feature_boost_weight_zero_is_plain_bm25(lm_index):
    """weight=0 → combined == text score bitwise (the additive term is
    0.0·feat, and x + 0.0 is exact for finite x)."""
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    plain = eng.search(q, 15, method="exhaustive")
    ids = np.array([d for d, _ in plain], np.int64)
    boosted = eng.search_feature_boost(
        q, 15, feature_ids=np.sort(ids), feature_vals=np.ones(len(ids)),
        weight=0.0)
    assert boosted == plain


def test_feature_boost_reranks_and_defaults_zero(lm_index):
    """A large feature on one low-ranked doc promotes it to rank 1;
    docs without a feature row keep their plain text score exactly."""
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    plain = eng.search(q, 20, method="exhaustive")
    victim, vscore = plain[-1]
    res = eng.search_feature_boost(
        q, 20, feature_ids=np.array([victim], np.int64),
        feature_vals=np.array([100.0]), weight=1.0)
    assert res[0][0] == victim
    assert res[0][1] == vscore + 1.0 * 100.0
    unboosted = {d: s for d, s in res if d != victim}
    for d, s in plain[:-1]:
        if d in unboosted:
            assert unboosted[d] == s  # feature defaults 0 → score unchanged


def test_feature_boost_unknown_ids_ignored(lm_index):
    from stacksearch_ray.query import QueryEngine

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    plain = eng.search(q, 10, method="exhaustive")
    res = eng.search_feature_boost(
        q, 10, feature_ids=np.array([-1, 2**62], np.int64),
        feature_vals=np.array([5.0, 7.0]), weight=1.0)
    assert res == plain


def test_lm_jelinek_mercer_matches_brute_force(lm_index):
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import doc_id_for

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    res = eng.search(q, 10, scorer="lm_jelinek_mercer")
    assert len(res) == 10
    tbl = generate_corpus(300)
    docs = {}
    for i in range(300):
        did = doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                         tbl["commit"][i].as_py())
        toks = clean_query(tbl["content"][i].as_py(), max_tokens=None)
        if toks:
            docs[did] = toks
    total_len = sum(len(t) for t in docs.values())
    terms = sorted(set(clean_query(q)))
    cf = {t: sum(toks.count(t) for toks in docs.values()) for t in terms}
    lam = 0.1
    coef = (1.0 - lam) / lam
    truth = {}
    for did, toks in docs.items():
        s = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or cf[t] == 0:
                continue
            s += math.log(1.0 + (coef * (tf / len(toks)))
                          / (cf[t] / total_len))
        if s > 0.0:
            truth[did] = s
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in res] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(res, want):
        assert s == pytest.approx(ws, abs=1e-12), d


def test_tfidf_matches_brute_force(lm_index):
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import doc_id_for

    _, index_dir = lm_index
    eng = QueryEngine(index_dir)
    q = "def return import"
    res = eng.search(q, 10, scorer="tfidf")
    tbl = generate_corpus(300)
    docs = {}
    for i in range(300):
        did = doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                         tbl["commit"][i].as_py())
        toks = clean_query(tbl["content"][i].as_py(), max_tokens=None)
        if toks:
            docs[did] = toks
    n_docs = len(docs)
    terms = sorted(set(clean_query(q)))
    df = {t: sum(t in toks for toks in docs.values()) for t in terms}
    truth = {}
    for did, toks in docs.items():
        s = sum(math.log(n_docs / max(df[t], 1)) * math.log(1.0 + toks.count(t))
                for t in terms if toks.count(t))
        if s > 0.0:
            truth[did] = s
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in res] == [d for d, _ in want]
    for (d, s), (_, ws) in zip(res, want):
        assert s == pytest.approx(ws, abs=1e-12), d
