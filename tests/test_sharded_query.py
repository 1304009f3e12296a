"""Sharded query fan-out (SURVEY.md E2): worker-pool results must be
bitwise identical to the single-process engine, including with shard
subsets whose local df differs from global df."""

import pytest

from stacksearch_ray.corpus import write_corpus


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("sharded")
    corpus = str(root / "corpus")
    write_corpus(corpus, 600, rows_per_file=100)
    idx = str(root / "idx")
    build_index(corpus, idx, num_shards=8, term_buckets=16)
    return idx


def test_sharded_identity(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=3)  # uneven split
    for q in ["def return var_1", "Determine a user's timezone",
              "helper_3 field_7 import", "numpy python", "zzz_missing", ""]:
        assert sharded.search(q, 10) == eng.search(q, 10), q


def test_shard_subset_uses_global_df(index_dir):
    from stacksearch_ray.query import QueryEngine

    full = QueryEngine(index_dir)
    sub = QueryEngine(index_dir, shard_subset=[0, 1, 2])
    q = "def return var_1"
    full_res = dict(full.search(q, 1000))
    # every doc the subset returns must carry the SAME score as in the
    # full engine (global idf) — a local-df idf would differ
    for doc_id, score in sub.search(q, 20):
        assert full_res[doc_id] == score


def test_sharded_custom_scorer(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=2)
    q = "def import class"
    assert (sharded.search(q, 10, scorer="tfidf")
            == eng.search(q, 10, scorer="tfidf"))


def test_search_many_batched(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=3)
    queries = ["def return var_1", "numpy python", "helper_3 field_7", ""]
    batch = sharded.search_many(queries, 10)
    assert len(batch) == len(queries)
    for q, res in zip(queries, batch):
        assert res == eng.search(q, 10), q


def test_sharded_boosted_and_synonym_identity(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=3)
    boosts = {"def": 0.3, "return": 2.0, "var_1": 1.0}
    assert (sharded.search_boosted(boosts, 10)
            == eng.search_boosted(boosts, 10))
    groups = [["def", "return"], ["var_1", "helper_3"]]
    assert (sharded.search_synonym_groups(groups, 10)
            == eng.search_synonym_groups(groups, 10))
    assert sharded.search_synonym_groups([["zzz_missing"]], 10) == []


def test_sharded_feature_boost_identity(index_dir):
    import numpy as np

    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=3)
    q = "def return var_1"
    # deterministic synthetic feature over every doc in the index
    ids = eng.doclens.ids
    vals = np.log(1.0 + (ids % 97).astype(np.float64))
    single = eng.search_feature_boost(q, 12, feature_ids=ids,
                                      feature_vals=vals, weight=0.5)
    fan = sharded.search_feature_boost(q, 12, feature_ids=ids,
                                       feature_vals=vals, weight=0.5)
    assert fan == single  # floats compared EXACTLY (disjoint shards)


def test_min_should_match_semantics(index_dir):
    """m=1 == plain exhaustive; m=n_terms == conjunctive; middle m keeps
    only docs matching ≥m terms, at their full accumulated scores."""
    import numpy as np

    from stacksearch_ray.query import QueryEngine

    from stacksearch_ray.text import clean_query

    eng = QueryEngine(index_dir)
    q = "def return var_1"
    terms = sorted(set(clean_query(q)))  # var_1 tokenizes to var1
    assert (eng.search_min_should_match(q, 1, 10)
            == eng.search(q, 10, method="exhaustive"))
    assert (eng.search_min_should_match(q, 3, 10)
            == eng.search_conjunctive(q, 10))
    mid = eng.search_min_should_match(q, 2, 50)
    full = dict(eng.search(q, 10_000, method="exhaustive"))
    for d, s in mid:
        n = sum(int(np.searchsorted(eng.term_doc_ids(t), d)
                    < len(eng.term_doc_ids(t))
                    and eng.term_doc_ids(t)[np.searchsorted(
                        eng.term_doc_ids(t), d)] == d) for t in terms)
        assert n >= 2, (d, n)
        assert s == full[d]  # survivor keeps its unfiltered score


def test_sharded_min_should_match_identity(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    sharded = ShardedQueryEngine(index_dir, num_workers=3)
    q = "def return var_1"
    for m in (1, 2, 3):
        assert (sharded.search_min_should_match(q, m, 12)
                == eng.search_min_should_match(q, m, 12)), m


def test_term_routing_identity_and_pruning(index_dir):
    """Routing-enabled fan-out is bitwise identical to unrouted AND to
    the single engine, and genuinely prunes workers for a term that
    lives in a strict subset of shards."""
    import numpy as np

    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    routed = ShardedQueryEngine(index_dir, num_workers=4, route_terms=True)
    assert routed._route_bits is not None
    assert routed._route_bits.shape == (4, 1 << 20)
    for q in ["def return var_1", "numpy python", "helper_3 field_7 import",
              "zzz_missing", ""]:
        assert routed.search(q, 10) == eng.search(q, 10), q
    # a rare term: find one whose postings sit in < all 4 worker subsets
    # (doc-hash sharding spreads hot terms everywhere; pick the rarest)
    rare = None
    for t, df in sorted(eng._df_only(
            ["helper_3", "field_7", "var_1"]).items(), key=lambda kv: kv[1]):
        ids = eng.term_doc_ids(t)
        if ids.size and ids.size <= 4:
            rare = t
            break
    if rare is not None:
        n_routed = len(routed._routed_workers([rare]))
        assert 1 <= n_routed <= 4
        assert routed.search(rare, 10) == eng.search(rare, 10)
    # empty-query and all-unknown-term routing return [] without any RPC
    assert routed._routed_workers([""]) == []


def test_search_many_routed_identity(index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    routed = ShardedQueryEngine(index_dir, num_workers=3, route_terms=True)
    queries = ["def return var_1", "numpy python", "helper_3 field_7", ""]
    got = routed.search_many(queries, 10)
    assert got == [eng.search(q, 10) for q in queries]


def test_search_after_cursor(index_dir):
    """Cursor pages stitch into the exhaustive top-k, and the sharded
    cursor fan-out is bitwise identical to the single engine."""
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(index_dir)
    q = "def return var_1"
    top30 = eng.search(q, 30, method="exhaustive")
    pages, cur = [], None
    for _ in range(3):
        page = (eng.search(q, 10, method="exhaustive") if cur is None
                else eng.search_after(q, cur[1], cur[0], 10))
        pages.extend(page)
        cur = page[-1]
    assert pages == top30
    sharded = ShardedQueryEngine(index_dir, num_workers=3,
                                 route_terms=True)
    c = top30[9]
    assert (sharded.search_after(q, c[1], c[0], 10)
            == eng.search_after(q, c[1], c[0], 10) == top30[10:20])
    # cursor past the last result -> empty
    last = top30[-1]
    deep = eng.search_after(q, last[1], last[0], 1000)
    assert eng.search(q, 10_000, method="exhaustive")[30:] == deep


@pytest.fixture(scope="module")
def pos_index_dir(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("sharded_pos")
    corpus = str(root / "corpus")
    write_corpus(corpus, 400, rows_per_file=100)
    idx = str(root / "idx")
    build_index(corpus, idx, num_shards=8, term_buckets=16,
                store_positions=True)
    return idx


def test_sharded_coord_identity(pos_index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(pos_index_dir)
    sharded = ShardedQueryEngine(pos_index_dir, num_workers=3)
    for q in ["def return var_1", "helper_3 field_7 import",
              "numpy python", "zzz_missing"]:
        assert sharded.search_coord(q, 10) == eng.search_coord(q, 10), q


def test_sharded_feature_scale_identity(pos_index_dir):
    import numpy as np

    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(pos_index_dir)
    sharded = ShardedQueryEngine(pos_index_dir, num_workers=3)
    rng = np.random.default_rng(5)
    ids = eng.doclens.ids[::3]  # sparse feature table
    vals = rng.uniform(0.0, 1.0, size=ids.size)
    q = "def return var_1"
    assert (sharded.search_feature_scale(q, 15, feature_ids=ids,
                                         feature_vals=vals)
            == eng.search_feature_scale(q, 15, feature_ids=ids,
                                        feature_vals=vals))


def test_sharded_rescore_identity(pos_index_dir):
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    eng = QueryEngine(pos_index_dir)
    sharded = ShardedQueryEngine(pos_index_dir, num_workers=3)
    for q in ["def return var_1", "helper_3 field_7 import", "zzz_missing"]:
        for w in (5, 30, 100):
            assert (sharded.search_rescore(q, 10, window_size=w,
                                           rescore_weight=2.0)
                    == eng.search_rescore(q, 10, window_size=w,
                                          rescore_weight=2.0)), (q, w)
