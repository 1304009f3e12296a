"""IVF ANN: distributed k-means (order-independent micros-exact
updates) + centroid-partitioned parquet index."""

import numpy as np
import pyarrow as pa
import pytest


def _vecs(n=300, dim=12, seed=9):
    rng = np.random.default_rng(seed)
    # clustered data so IVF has structure to exploit
    centers = rng.standard_normal((5, dim)) * 3
    x = centers[rng.integers(0, 5, n)] + rng.standard_normal((n, dim))
    return x


def _ds(x):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(x.reshape(-1), pa.float64()), x.shape[1]),
    })).repartition(7)  # odd batch layout: updates must not care


def test_distributed_kmeans_bitwise_equals_numpy(ray_session):
    from stacksearch_ray.functions.ivf import kmeans_numpy, train_kmeans

    x = _vecs()
    a = kmeans_numpy(x, k=6, iters=4, seed=17)
    b = train_kmeans(_ds(x), k=6, iters=4, seed=17)
    assert np.array_equal(a, b)  # bitwise — micros sums commute


def test_ivf_full_probe_equals_brute_force(ray_session, tmp_path):
    from stacksearch_ray.functions.ivf import IVFIndex
    from stacksearch_ray.functions.similarity import knn_brute_force

    x = _vecs()
    idx = IVFIndex.build(_ds(x), str(tmp_path / "ivf"), k=6, iters=3)
    q = x[0]
    got = idx.search(q, k=10, nprobe=6).to_pandas()  # probe ALL → exact
    exact = knn_brute_force(_ds(x), q[None, :], k=10).to_pandas()
    assert list(got["vec_id"]) == list(exact["vec_id"])
    assert list(got["sim_micros"]) == list(exact["sim_micros"])


def test_ivf_partition_pruning_and_recall(ray_session, tmp_path):
    import os

    from stacksearch_ray.functions.ivf import IVFIndex
    from stacksearch_ray.functions.similarity import knn_brute_force

    x = _vecs()
    d = str(tmp_path / "ivf")
    idx = IVFIndex.build(_ds(x), d, k=6, iters=3)
    # hive layout exists: one cid=N dir per non-empty centroid
    parts = [p for p in os.listdir(os.path.join(d, "lists"))
             if p.startswith("cid=")]
    assert len(parts) >= 2
    # nprobe=2 on clustered data: high recall vs brute force
    q = x[0]
    got = set(idx.search(q, k=10, nprobe=2).to_pandas()["vec_id"])
    exact = set(knn_brute_force(_ds(x), q[None, :], k=10)
                .to_pandas()["vec_id"])
    assert len(got & exact) >= 8
    # reload from disk serves identically
    idx2 = IVFIndex(d)
    again = idx2.search(q, k=10, nprobe=2).to_pandas()
    assert set(again["vec_id"]) == got


def test_empty_cluster_keeps_centroid():
    from stacksearch_ray.functions.ivf import kmeans_numpy

    # 2 tight points, k=4 → at least 2 empty clusters keep their init
    x = np.array([[0.0, 0.0], [0.1, 0.0]])
    c = kmeans_numpy(x, k=4, iters=3, seed=1)
    assert np.isfinite(c).all()


def test_pq_encode_and_adc(ray_session):
    """PQ codes are deterministic; the Ray codes-table top-k equals the
    pure-NumPy ADC ranking exactly; ADC recall@10 vs exact L2 beats
    chance by a wide margin on structured data."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stacksearch_ray.functions.pq import (adc_lut_micros, encode_pq,
                                              encode_pq_ds, pq_topk,
                                              train_pq_codebooks)

    rng = np.random.default_rng(5)
    # clustered data so quantization has structure to find
    centers = rng.standard_normal((6, 32)) * 3.0
    x = np.concatenate([c + rng.standard_normal((50, 32))
                        for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    cbs = train_pq_codebooks(x, m=4, k=8, iters=4, seed=17)
    codes = encode_pq(x, cbs)
    assert codes.shape == (300, 4)
    assert np.array_equal(codes, encode_pq(x, cbs))  # deterministic
    assert codes.min() >= 0 and codes.max() < 8

    q = x[7]
    lut = adc_lut_micros(q, cbs)
    dist = np.zeros(len(x), dtype=np.int64)
    for s in range(4):
        dist += lut[s][codes[:, s]]
    order = np.lexsort((ids, dist))[:10]
    want = list(zip(ids[order].tolist(), dist[order].tolist()))

    ds = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [row.tolist() for row in x]}))
    got = pq_topk(encode_pq_ds(ds, cbs), lut, k=10)
    assert list(zip(got["vec_id"].to_pylist(),
                    got["dist_micros"].to_pylist())) == want
    assert got["rank"].to_pylist() == list(range(1, 11))

    # semantic usefulness: within a cluster the exact neighbors are
    # near-equidistant (recall@10 ≈ chance), but ADC must place ALL
    # top-10 in the query's cluster (ids 0-49) — the compression keeps
    # the coarse geometry
    assert all(0 <= d < 50 for d in ids[order].tolist()), ids[order]


def test_ivfpq_composes_probe_and_adc(ray_session):
    """IVF-PQ results are exactly the full-PQ ADC ranking restricted to
    the 2 probed coarse cells."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stacksearch_ray.functions.ivf import (assign_centroids,
                                               kmeans_numpy)
    from stacksearch_ray.functions.pq import (adc_lut_micros, encode_pq,
                                              ivfpq_topk,
                                              train_pq_codebooks)

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((6, 32)) * 3.0
    x = np.concatenate([c + rng.standard_normal((40, 32))
                        for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    coarse = kmeans_numpy(x, k=6, iters=4, seed=17)
    cbs = train_pq_codebooks(x, m=4, k=8, iters=4, seed=17)
    q = x[3]
    ds = rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": [r.tolist() for r in x]}))
    got = ivfpq_topk(ds, coarse, cbs, q, k=10, nprobe=2)

    probes = set(np.argsort(((coarse - q) ** 2).sum(axis=1),
                            kind="stable")[:2].tolist())
    cid = assign_centroids(x, coarse)
    keep = np.isin(cid, list(probes))
    codes = encode_pq(x[keep], cbs)
    lut = adc_lut_micros(q, cbs)
    dist = np.zeros(keep.sum(), dtype=np.int64)
    for s in range(4):
        dist += lut[s][codes[:, s]]
    kid = ids[keep]
    o = np.lexsort((kid, dist))[:10]
    assert list(zip(got["vec_id"].to_pylist(),
                    got["dist_micros"].to_pylist())) == \
        list(zip(kid[o].tolist(), dist[o].tolist()))
    # pruning is real: some corpus vectors live outside the probes
    assert keep.sum() < len(x)
