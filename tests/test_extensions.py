"""Registry hooks (§2.10), eval harness (E3), bounded-range source (S1/S2)."""

import numpy as np
import pytest

from stacksearch_ray.corpus import generate_corpus, write_corpus
from stacksearch_ray.registry import get_scorer, names, register_scorer
from stacksearch_ray.schema import doc_id_for


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from stacksearch_ray.build import build_index

    root = tmp_path_factory.mktemp("ext")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_corpus(corpus_dir, 200, rows_per_file=50)
    build_index(corpus_dir, index_dir, num_shards=4)
    return corpus_dir, index_dir


def test_registry_names():
    n = names()
    assert "bm25" in n["scorers"] and "tfidf" in n["scorers"]
    assert "reference" in n["tokenizers"]


def test_custom_scorer_plugs_in(small_index):
    from stacksearch_ray.query import QueryEngine

    _, index_dir = small_index
    eng = QueryEngine(index_dir)

    @register_scorer("const_test")
    def const(tf, dl, df, n, avgdl):
        return np.full(len(tf), 0.5, dtype=np.float64)

    res = eng.search("def return import", 5, scorer="const_test")
    assert len(res) == 5
    # every matched doc scores 0.5 per matched term → scores in {0.5, 1.0, 1.5}
    assert all(abs(s / 0.5 - round(s / 0.5)) < 1e-12 for _, s in res)
    # tfidf ranks differently from match_count but both return k results
    assert len(eng.search("def return import", 5, scorer="tfidf")) == 5


def test_eval_harness(small_index):
    from stacksearch_ray.eval import evaluate, perturb_query

    corpus_dir, index_dir = small_index
    tbl = generate_corpus(200)
    pairs = []
    from stacksearch_ray.corpus import GOLDEN_SENTENCES

    for i, s in enumerate(GOLDEN_SENTENCES[:6]):
        pairs.append((s, doc_id_for(tbl["repo"][i].as_py(), tbl["path"][i].as_py(),
                                    tbl["commit"][i].as_py())))
    hits, summary = evaluate(
        {"bm25_auto": {"index_dir": index_dir},
         "match_count": {"index_dir": index_dir, "scorer": "match_count"}},
        pairs, k=10)
    sdf = summary.to_pandas().set_index(["config", "variant"])
    assert sdf.loc[("bm25_auto", "exact"), "hits"] == 6  # golden docs all found
    assert sdf.loc[("bm25_auto", "exact"), "n"] == 6
    assert set(hits.to_pandas()["variant"]) == {"exact", "perturbed"}
    # perturbation actually drops a token
    assert perturb_query("alpha beta gamma", 1, seed=1) != "alpha beta gamma"


def test_range_source(ray_session, small_index):
    from stacksearch_ray.sources.corpus_source import (
        read_corpus_range,
        train_test_split,
    )

    corpus_dir, _ = small_index  # 200 rows in files of 50
    full = generate_corpus(200)
    # range spanning a file boundary, partial on both ends
    ds = read_corpus_range(corpus_dir, 30, 130, columns=["path"])
    got = sorted(r["path"] for r in ds.take_all())
    expect = sorted(full["path"].to_pylist()[30:130])
    assert got == expect
    # whole-file fast path + split disjointness
    tr, te = train_test_split(corpus_dir, 100, columns=["path"])
    ptr = set(r["path"] for r in tr.take_all())
    pte = set(r["path"] for r in te.take_all())
    assert len(ptr) == 100 and len(pte) == 100 and not (ptr & pte)
    # empty range
    assert read_corpus_range(corpus_dir, 500, 600).count() == 0


def test_source_registry(ray_session, small_index):
    from stacksearch_ray.registry import get_source
    import stacksearch_ray.sources.corpus_source  # noqa: F401 — registers

    corpus_dir, _ = small_index
    src = get_source("parquet_range")
    assert src(corpus_dir, 0, 10, columns=["path"]).count() == 10
