"""Oracle BM25 unit tests on hand-computable micro-corpora (FIXTURES.md F2,
mirroring /root/reference/tests/minhash_index_test.py:19-31 exact-id style
and /root/reference/tests/test_search.py:29-37 self-retrieval)."""

import math

from stacksearch_ray.oracle import OracleBM25

# /root/reference/tests/test_search.py:29-32 micro-corpus
MICRO = {
    1: "i have a pen i have an apple",
    2: "numpy python",
    3: "please work",
    4: "maple story good game",
}


def test_self_retrieval():
    o = OracleBM25(MICRO)
    for doc_id, text in MICRO.items():
        assert o.search(text, 1)[0][0] == doc_id


def test_perturbed_query():
    # reference test_search.py:36-37: perturbed query still retrieves doc 2
    o = OracleBM25(MICRO)
    assert o.search("numpy python matrix", 1)[0][0] == 2


def test_hand_computed_score():
    o = OracleBM25({1: "x q", 2: "x z z"})
    # "q" alone is not a stopword → doc1=[x,q] dl=2, doc2=[x,z,z] dl=3
    # N=2, avgdl=2.5; term x: df=2, idf=ln(0.5/2.5 + 1)
    k1, b = 1.2, 0.75
    idf = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
    norm = k1 * (1.0 - b + b * (2.0 / 2.5))
    expect = idf * ((k1 + 1.0) * 1.0 / (1.0 + norm))
    assert o.score("x", 1) == expect
    assert o.search("x", 2) == sorted(
        [(1, o.score("x", 1)), (2, o.score("x", 2))], key=lambda t: (-t[1], t[0]))


def test_empty_docs_excluded():
    o = OracleBM25({1: "hello", 2: "", 3: "the of a"})  # 2,3 tokenless
    assert o.n_docs == 1
    assert o.search("hello", 5) == [(1, o.score("hello", 1))]


def test_duplicate_query_terms_count_once():
    o = OracleBM25(MICRO)
    assert o.score("numpy numpy", 2) == o.score("numpy", 2)


def test_tie_break_doc_id_asc():
    o = OracleBM25({7: "same text here", 3: "same text here"})
    res = o.search("same text here", 2)
    assert [d for d, _ in res] == [3, 7]
    assert res[0][1] == res[1][1]
