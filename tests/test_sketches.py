import numpy as np
import pyarrow as pa
import pytest

from stacksearch_ray.functions.sketches import HLL


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(2)
    # HLL consumes uniform 64-bit hashes (the operator hashes inputs with
    # pd.util.hash_array); emulate that full range here
    a = rng.integers(0, 2**64, 60_000, dtype=np.uint64)
    b = rng.integers(0, 2**64, 60_000, dtype=np.uint64)
    h1 = HLL().add_hashes(a)
    h2 = HLL().add_hashes(b)
    exact = len(np.unique(np.concatenate((a, b))))
    merged = HLL.from_bytes(h1.to_bytes()).merge(h2)
    assert abs(merged.estimate() - exact) / exact < 0.05
    # merge is idempotent and order-insensitive
    m2 = HLL().merge(h2).merge(h1).merge(h1)
    assert m2.estimate() == merged.estimate()


def test_hll_small_range_linear_counting():
    vals = np.arange(50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h = HLL().add_hashes(vals)
    assert abs(h.estimate() - 50) <= 3


def test_approx_distinct_dataset(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.sketches import (
        approx_distinct,
        approx_distinct_tokens,
    )

    n = 20_000
    ids = np.arange(n) % 3777  # 3777 distinct
    ds = rd.from_arrow(pa.table({"v": pa.array(ids, pa.int64())})).repartition(8)
    est = approx_distinct(ds, "v")
    assert abs(est - 3777) / 3777 < 0.05

    docs = rd.from_items([{"text": f"alpha tok_{i % 211} beta tok_{i % 97}"}
                          for i in range(2000)])
    est_t = approx_distinct_tokens(docs)
    # vocabulary: alpha, beta + 211 + 97 distinct tok_k... tok_k overlap:
    # tok_0..tok_210 and tok_0..tok_96 share names → 211 + 2 distinct
    assert abs(est_t - 213) / 213 < 0.06


def test_mg_compress_guarantee():
    """Compressed counts undercount by at most total/(k+1), and any
    dropped value's true count is within the same bound — on zipf data."""
    from stacksearch_ray.functions.sketches import mg_compress

    rng = np.random.default_rng(7)
    vals = rng.zipf(1.3, 50_000)
    uniq, cnts = np.unique(vals, return_counts=True)
    k = 100
    cvals, ccnts = mg_compress(uniq, cnts.astype(np.int64), k)
    assert len(cvals) <= k
    bound = len(vals) // (k + 1)
    true = dict(zip(uniq.tolist(), cnts.tolist()))
    for v, c in zip(cvals.tolist(), ccnts.tolist()):
        assert 0 < c <= true[v]
        assert true[v] - c <= bound
    dropped = set(uniq.tolist()) - set(cvals.tolist())
    assert all(true[v] <= bound for v in dropped)


def test_heavy_hitters_exact_matches_bruteforce(ray_session):
    """heavy_hitters_exact == GROUP BY + HAVING on skewed data, with a
    small k that forces real per-batch compression."""
    import pandas as pd
    import ray.data as rd

    from stacksearch_ray.functions.sketches import heavy_hitters_exact

    rng = np.random.default_rng(11)
    vals = np.minimum(rng.zipf(1.2, 30_000), 5_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    got = (heavy_hitters_exact(ds, "v", threshold_frac=0.01, k=128)
           .to_pandas().sort_values("v").reset_index(drop=True))
    threshold = int(len(vals) * 0.01) + 1
    uniq, cnts = np.unique(vals, return_counts=True)
    ref = pd.DataFrame({"v": uniq, "cf": cnts})
    ref = (ref[ref["cf"] >= threshold].astype(np.int64)
           .sort_values("v").reset_index(drop=True))
    assert got.astype("int64").equals(ref)


def test_heavy_hitters_k_too_small_raises(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.sketches import heavy_hitters_exact

    ds = rd.from_arrow(pa.table({"v": np.arange(10_000, dtype=np.int64)}))
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters_exact(ds, "v", threshold_frac=0.001, k=10)


def test_count_min_properties():
    """CMS never undercounts; merge equals one-shot; error bounded."""
    from stacksearch_ray.functions.sketches import CountMin

    rng = np.random.default_rng(5)
    vals = rng.zipf(1.3, 50_000)
    vals = np.minimum(vals, 10_000).astype(np.int64)
    import pandas as pd

    h = pd.util.hash_array(vals)
    cm = CountMin(w=2048, d=4).add_hashes(h)
    uniq, cnts = np.unique(vals, return_counts=True)
    hu = pd.util.hash_array(uniq)
    est = cm.estimate_hashes(hu)
    assert (est >= cnts).all()  # one-sided error
    # e/w bound: overcount <= e*N/w for (almost) all probes; allow the
    # probabilistic tail a 3x margin
    bound = 3 * np.e * len(vals) / 2048
    assert np.quantile(est - cnts, 0.99) <= bound
    # mergeability: two halves merged == one pass (exact table equality)
    a = CountMin(w=2048, d=4).add_hashes(h[:25_000])
    b = CountMin(w=2048, d=4).add_hashes(h[25_000:])
    assert (a.merge(b).table == cm.table).all()
    # round-trip
    back = CountMin.from_bytes(cm.to_bytes(), 2048, 4)
    assert (back.table == cm.table).all()


def test_cms_token_counts_dataset(ray_session):
    """Distributed CMS over the real documents table: estimates are
    >= exact per-term counts and tight on hot terms."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from stacksearch_ray.functions.sketches import (
        cms_estimate_terms,
        cms_token_counts,
    )
    from stacksearch_ray.text import clean_query

    docs = "/root/testdata/sf0.001/documents.parquet"
    ds = rd.read_parquet(docs, columns=["text"]).repartition(4)
    cm = cms_token_counts(ds, "text", w=4096, d=4)
    texts = pq.read_table(docs, columns=["text"])["text"].to_pylist()
    from collections import Counter

    exact = Counter()
    total = 0
    for t in texts:
        toks = clean_query(t, max_tokens=None)
        exact.update(toks)
        total += len(toks)
    probe = [t for t, _ in exact.most_common(20)] + ["merge", "sort", "dup"]
    est = cms_estimate_terms(cm, probe)
    truth = np.array([exact[t] for t in probe], dtype=np.int64)
    assert (est >= truth).all()
    assert (est - truth <= np.e * total / 4096 + 1).all()


def test_kmv_grouped_null_groups(ray_session):
    """Null group values are dropped (not a TypeError) and non-null
    groups match exact distinct counts below k."""
    import pyarrow as pa
    import ray.data as rd

    from stacksearch_ray.functions.sketches import kmv_distinct_grouped

    t = pa.table({
        "g": pa.array(["a", None, "b", "a", None, "b", "a"]),
        "v": pa.array(["x1", "x2", "x3", "x4", "x5", "x3", "x1"]),
    })
    res = kmv_distinct_grouped(rd.from_arrow(t), "g", "v", k=64)
    assert set(res) == {"a", "b"}
    assert res["a"][0] == 2 and res["a"][1] == 2.0  # {x1, x4}; x1 dup
    assert res["b"][0] == 1 and res["b"][1] == 1.0  # {x3} twice
