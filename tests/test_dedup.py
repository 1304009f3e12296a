import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, ids=None):
    import ray.data as rd

    ids = ids or list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": pa.array(texts, pa.string())}))


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "the quick brown fox jumps over the lazy dog again and again today",   # exact dup of 0
    "the quick brown fox jumps over the lazy dog again and again tonight",  # near dup
    "import numpy as np def main return values sorted unique array",
    "completely different content about database query optimization plans",
    "another unrelated document mentioning graphs trees and traversal",
]


def test_exact_dedup(ray_session):
    from stacksearch_ray.functions.dedup import exact_dedup_groups

    out = exact_dedup_groups(_docs_ds(TEXTS)).to_pandas()
    assert len(out) == 5  # 6 docs, one exact dup pair
    dup = out[out["n_dups"] == 2]
    assert len(dup) == 1 and dup["keep_id"].iloc[0] == 0


def test_dedup_corpus(ray_session):
    """dedup_corpus returns the INPUT rows minus exact duplicates (min
    id kept), all columns intact; broadcast and join lookups agree."""
    from stacksearch_ray.functions.dedup import dedup_corpus

    # extra column rides along untouched
    import ray.data as rd

    texts = TEXTS + [TEXTS[0], TEXTS[3]]  # ids 6, 7 duplicate 0 and 3
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "meta": pa.array([f"m{i}" for i in range(len(texts))]),
    }))
    for lookup in ("broadcast", "join"):
        out = (dedup_corpus(ds, lookup=lookup, num_buckets=4).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert list(out["doc_id"]) == [0, 2, 3, 4, 5]
        assert list(out.columns) == ["doc_id", "text", "meta"]
        assert list(out["meta"]) == ["m0", "m2", "m3", "m4", "m5"]


def test_dedup_corpus_no_dups_is_identity(ray_session):
    from stacksearch_ray.functions.dedup import dedup_corpus

    ds = _docs_ds(TEXTS[2:])  # all distinct
    for lookup in ("broadcast", "join"):
        out = dedup_corpus(ds, lookup=lookup).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2, 3]


def test_minhash_identical_signatures(ray_session):
    from stacksearch_ray.functions.dedup import minhash_signatures

    sigs = minhash_signatures(_docs_ds(TEXTS[:2] + TEXTS[4:5]),
                              num_perm=64).to_pandas().sort_values("doc_id")
    s = [np.asarray(x) for x in sigs["sig"]]
    assert (s[0] == s[1]).all()          # identical docs → identical sigs
    assert (s[0] == s[2]).mean() < 0.5   # unrelated docs → mostly different


def test_minhash_lsh_clusters(ray_session):
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    out = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                               threshold=0.5).to_pandas()
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lbl[0] == lbl[1] == 0         # exact dups clustered, min-label
    assert lbl[2] == 0                   # near dup joins the cluster
    assert lbl[4] == 4 and lbl[5] == 5   # singletons keep own id


def test_minhash_distributed_clustering_identical(ray_session):
    """driver-loop clustering == distributed label propagation (default)."""
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    a = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, clustering="driver").to_pandas()
    b = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, clustering="distributed").to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))


def test_minhash_inline_verify_identical(ray_session):
    """verify='inline' (default: sig carried into buckets, no join/
    broadcast) == verify='broadcast'."""
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    a = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, verify="broadcast").to_pandas()
    b = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, verify="inline").to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))


def test_minhash_join_verify_identical(ray_session):
    """verify='broadcast' (small-corpus opt-in) == verify='join' (default)."""
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    a = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, verify="broadcast").to_pandas()
    b = minhash_lsh_clusters(_docs_ds(TEXTS), num_perm=64, num_bands=16,
                             threshold=0.5, verify="join").to_pandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True))


def test_minhash_starred_bucket_stats(ray_session):
    """Degenerate buckets (mass duplicates) collapse to a hub star; the
    stats_out channel reports how many pairs were starred, and the dup
    group still clusters together."""
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    texts = ["alpha beta gamma delta epsilon zeta"] * 8 + [
        "completely different content here once",
        "another unrelated singleton document text",
    ]
    stats: dict = {}
    out = minhash_lsh_clusters(_docs_ds(texts), num_perm=64, num_bands=16,
                               threshold=0.5, max_bucket_pairs_ids=4,
                               stats_out=stats).to_pandas()
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(lbl[i] == 0 for i in range(8))   # dup group intact
    assert lbl[8] == 8 and lbl[9] == 9
    assert stats["starred_pairs"] > 0
    assert stats["verified_pairs"] >= stats["starred_pairs"]


def test_simhash_pairs(ray_session):
    from stacksearch_ray.functions.dedup import (
        simhash_near_dup_pairs,
        simhash_signatures,
    )

    sigs = simhash_signatures(_docs_ds(TEXTS)).to_pandas().sort_values("doc_id")
    assert sigs["simhash"].iloc[0] == sigs["simhash"].iloc[1]
    pairs = simhash_near_dup_pairs(_docs_ds(TEXTS), max_hamming=3).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got
    assert pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]["hamming"].iloc[0] == 0


def test_ngram_jaccard_pairs(ray_session):
    from stacksearch_ray.functions.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(_docs_ds(TEXTS), threshold=0.5).to_pandas()
    got = dict(((a, b), j) for a, b, j in
               zip(out["a"], out["b"], out["jaccard_micros"]))
    assert got[(0, 1)] == 1_000_000
    assert (0, 2) in got and got[(0, 2)] >= 500_000
    assert (0, 4) not in got


def test_mega_duplicate_bucket_stays_linear(ray_session):
    """Thousands of exact duplicates must not explode into O(n²) pairs;
    the star fallback still clusters them all together."""
    from stacksearch_ray.functions.dedup import minhash_lsh_clusters

    texts = (["identical content repeated many times over and over here"] * 600
             + ["something entirely different apart from nothing shared"])
    out = minhash_lsh_clusters(_docs_ds(texts), num_perm=64, num_bands=16,
                               threshold=0.5).to_pandas()
    lbl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert all(lbl[i] == 0 for i in range(600))
    assert lbl[600] == 600


def test_ngram_jaccard_size_guard(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from stacksearch_ray.functions.dedup import ngram_jaccard_pairs

    t = pa.table({
        "doc_id": pa.array(list(range(32)), pa.int64()),
        "text": pa.array([f"alpha beta gamma {i}" for i in range(32)]),
    })
    with pytest.raises(ValueError, match="minhash_lsh_clusters"):
        ngram_jaccard_pairs(rd.from_arrow(t), max_rows=10)
    out = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.5).to_pandas()
    assert (out["a"] < out["b"]).all()
