"""MinHash-LSH search index: golden expected-id lists + save/reload
round-trip + incremental add, mirroring the reference's
tests/minhash_index_test.py:18-40 structure (expectations follow true
Jaccard ranking)."""

import pyarrow as pa


# token-set analogs of the reference test's binary vectors
V1 = "t0 t1 t2 t4 t7"
V2 = "t0 t2 t4 t7"
V3 = "t0 t2 t4 t5 t7 t9"
V4 = "t0 t2 t3 t4 t7 t8 t9"
DOCS = {1: V1, 2: V2, 3: V3, 4: V4}


def _ds(docs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    }))


def test_search_insert_save_reload(ray_session, tmp_path):
    from stacksearch_ray.minhash_index import MinHashSearchIndex

    idx_dir = str(tmp_path / "mh")
    idx = MinHashSearchIndex.build(_ds(DOCS), idx_dir, num_perm=128,
                                   num_bands=32, shingle_k=1)
    assert idx.size() == 4

    def ids(res):
        return [d for d, _ in res]

    # exact text → self first with est 1.0
    res = idx.search(V1, top_k=1)
    assert ids(res) == [1] and res[0][1] == 1.0
    # near miss of v1 (one extra token) still retrieves 1 first
    assert ids(idx.search("t0 t1 t2 t4 t7 t9", top_k=1)) == [1]
    # v3's own tokens → 3 first
    assert ids(idx.search(V3, top_k=1)) == [3]
    assert ids(idx.search(V2, top_k=1)) == [2]
    # broad query reaches the high-jaccard docs (doc 2 sits at j=0.44,
    # below the banding's effective threshold — LSH may skip it, exactly
    # like the reference's datasketch LSH at threshold 0.5)
    broad = ids(idx.search("t0 t1 t2 t3 t4 t5 t7 t8 t9", top_k=4))
    assert {1, 3, 4} <= set(broad) <= {1, 2, 3, 4}

    # save/reload round-trip (constructor reopens from disk)
    idx = None
    idx2 = MinHashSearchIndex(idx_dir)
    assert idx2.size() == 4
    assert ids(idx2.search(V1, top_k=1)) == [1]
    assert ids(idx2.search(V3, top_k=1)) == [3]

    # incremental add (reference insert()): near-dup of doc 1
    idx2.add(_ds({5: V1 + " t9"}))
    assert idx2.size() == 5
    assert ids(idx2.search(V1, top_k=2)) == [1, 5]
    # search_by_doc excludes the probe doc itself
    assert ids(idx2.search_by_doc(1, V1, top_k=1)) == [5]


def test_search_no_candidates(ray_session, tmp_path):
    from stacksearch_ray.minhash_index import MinHashSearchIndex

    idx = MinHashSearchIndex.build(_ds(DOCS), str(tmp_path / "mh2"),
                                   num_perm=64, num_bands=16)
    assert idx.search("zz1 zz2 zz3 zz4", top_k=5) == []
