"""Binary quantization (sign-bit packing + Hamming ANN) — functions/bq.py."""

import numpy as np
import pyarrow as pa
import pytest


def _emb_ds(mat, ids=None):
    import ray.data as rd

    ids = ids if ids is not None else np.arange(len(mat))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def test_popcount64_matches_python():
    from stacksearch_ray.functions.bq import popcount64

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**63 - 1, size=100, dtype=np.int64)
    vals = np.concatenate([vals, np.array([0, 1, 2**32 - 1, -1], np.int64)])
    got = popcount64(vals)
    expect = np.array([bin(int(v) & 0xFFFFFFFFFFFFFFFF).count("1")
                       for v in vals], np.int64)
    assert (got == expect).all()


def test_pack_signs_bit_layout():
    from stacksearch_ray.functions.bq import pack_signs

    # dim 64: bit j of word w set iff v[32w+j] >= 0 (including +/-0.0)
    v = np.full(64, -1.0)
    v[0] = 1.0       # word0 bit0
    v[31] = 0.0      # word0 bit31 (>= 0 holds at zero)
    v[32] = 5.0      # word1 bit0
    v[63] = -0.0     # word1 bit31 (-0.0 >= 0 is True)
    codes = pack_signs(v[None, :])
    assert codes.shape == (1, 2)
    assert codes[0, 0] == (1 << 0) | (1 << 31)
    assert codes[0, 1] == (1 << 0) | (1 << 31)
    assert codes.min() >= 0  # 32-bit words never go negative

    # ragged tail: dim 40 -> 2 words, tail bits zero
    v2 = np.ones(40)
    c2 = pack_signs(v2[None, :])
    assert c2[0, 0] == (1 << 32) - 1 and c2[0, 1] == (1 << 8) - 1


def test_hamming_distances_matches_bitcount():
    from stacksearch_ray.functions.bq import hamming_distances, pack_signs

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((50, 64))
    codes = pack_signs(mat)
    q = pack_signs(mat[[3]])[0]
    got = hamming_distances(codes, q)
    for i in range(50):
        expect = sum(bin(int(codes[i, w]) ^ int(q[w])).count("1")
                     for w in range(2))
        assert got[i] == expect
    assert got[3] == 0  # self-distance


def test_hamming_knn_exact_and_tiebreak(ray_session):
    from stacksearch_ray.functions.bq import (hamming_distances, hamming_knn,
                                              pack_signs)

    rng = np.random.default_rng(13)
    mat = rng.standard_normal((120, 64))
    mat[77] = mat[5]  # exact duplicate -> hamming 0, tie broken by id
    out = hamming_knn(_emb_ds(mat), mat[5], k=10).to_pandas()
    dist = hamming_distances(pack_signs(mat), pack_signs(mat[[5]])[0])
    order = np.lexsort((np.arange(len(dist)), dist))[:10]
    assert out["vec_id"].tolist() == list(order)
    assert out["vec_id"].tolist()[:2] == [5, 77]  # tie: id asc
    assert out["hamming"].tolist() == [int(dist[i]) for i in order]
    assert out["rank"].tolist() == list(range(1, 11))


def test_shortlist_rerank_matches_exact_when_candidates_cover(ray_session):
    from stacksearch_ray.functions.bq import hamming_shortlist_rerank
    from stacksearch_ray.functions.similarity import knn_brute_force

    rng = np.random.default_rng(17)
    mat = rng.standard_normal((100, 64))
    # candidates = corpus size -> the re-rank IS exact cosine top-k
    got = hamming_shortlist_rerank(_emb_ds(mat), mat[0], k=5,
                                   candidates=100).to_pandas()
    exact = knn_brute_force(_emb_ds(mat), mat[[0]], k=5,
                            max_rows=None).to_pandas()
    assert got["vec_id"].tolist() == exact["vec_id"].tolist()
    assert got["sim_micros"].tolist() == exact["sim_micros"].tolist()


def test_shortlist_recall_reasonable(ray_session):
    from stacksearch_ray.functions.bq import hamming_shortlist_rerank
    from stacksearch_ray.functions.similarity import knn_brute_force

    rng = np.random.default_rng(19)
    mat = rng.standard_normal((300, 64))
    got = hamming_shortlist_rerank(_emb_ds(mat), mat[0], k=10,
                                   candidates=60).to_pandas()
    exact = knn_brute_force(_emb_ds(mat), mat[[0]], k=10,
                            max_rows=None).to_pandas()
    overlap = len(set(got["vec_id"]) & set(exact["vec_id"]))
    assert overlap >= 6  # 64 sign bits on random gaussians: high recall
    # the query itself must survive both stages
    assert got["vec_id"].tolist()[0] == 0


def test_binary_quantize_ds_roundtrip(ray_session):
    from stacksearch_ray.functions.bq import binary_quantize, pack_signs

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((40, 64))
    out = binary_quantize(_emb_ds(mat)).to_pandas().sort_values("vec_id")
    codes = pack_signs(mat)
    assert out["w0"].to_numpy().tolist() == codes[:, 0].tolist()
    assert out["w1"].to_numpy().tolist() == codes[:, 1].tolist()
