import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(4)
    left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                         "x": rng.integers(0, 1000, 500)})
    right = pd.DataFrame({"k": rng.integers(0, 60, 200),
                          "y": rng.integers(0, 1000, 200)})
    return left, right


def _canon(df):
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
            .astype({c: "int64" for c in df.columns}))


def test_hash_join_matches_pandas(ray_session, tables):
    from stacksearch_ray.functions.joins import hash_join

    left, right = tables
    got = hash_join(_ds(left), _ds(right), on="k", num_buckets=8).to_pandas()
    expect = left.merge(right, on="k", how="inner")
    assert _canon(got[["k", "x", "y"]]).equals(_canon(expect[["k", "x", "y"]]))


def test_broadcast_join(ray_session, tables):
    from stacksearch_ray.functions.joins import broadcast_join

    left, right = tables
    dim = right.drop_duplicates("k")
    got = broadcast_join(_ds(left), dim, on="k").to_pandas()
    expect = left.merge(dim, on="k", how="inner")
    assert _canon(got[["k", "x", "y"]]).equals(_canon(expect[["k", "x", "y"]]))


def test_salted_join_bounds_hot_key_and_matches_unsalted(ray_session):
    """One key holds 50% of left rows: salt=8 splits it across
    sub-buckets (max per-bucket left rows bounded) and the joined result
    is identical to the unsalted join."""
    from stacksearch_ray.functions.joins import _tag_and_bucket, hash_join

    rng = np.random.default_rng(5)
    n = 2000
    hot = np.full(n // 2, 7, dtype=np.int64)
    rest = rng.integers(0, 50, n // 2).astype(np.int64)
    left = pd.DataFrame({"k": np.concatenate([hot, rest]),
                         "x": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "y": np.arange(50, dtype=np.int64) * 10})

    plain = hash_join(_ds(left), _ds(right), on="k", num_buckets=8).to_pandas()
    salted = hash_join(_ds(left), _ds(right), on="k", num_buckets=8,
                       salt=8).to_pandas()
    cols = ["k", "x", "y"]
    assert _canon(salted[cols]).equals(_canon(plain[cols]))

    # observe the shuffle key distribution: the hot key's left rows are
    # spread across salt sub-buckets, so no group sees them all
    unified = [("k", pa.int64()), ("x", pa.int64())]
    tagged = _tag_and_bucket(_ds(left), "k", "l", 8, unified,
                             salt=8).to_pandas()
    per_bucket = tagged.groupby("__bucket").size()
    assert per_bucket.max() <= n // 2 // 8 + len(rest)  # ≈ hot/8 + noise
    hot_buckets = tagged[tagged["k"] == 7]["__bucket"].nunique()
    assert hot_buckets == 8


def test_native_join_matches_portable(ray_session, tables):
    """Ray's hash-shuffle Dataset.join (native=True) == the portable
    groupby-bucket join."""
    from stacksearch_ray.functions.joins import hash_join

    left, right = tables
    got = hash_join(_ds(left), _ds(right), on="k", num_buckets=4,
                    native=True).to_pandas()
    expect = left.merge(right, on="k", how="inner")
    assert _canon(got[["k", "x", "y"]]).equals(_canon(expect[["k", "x", "y"]]))


def test_distributed_label_propagation(ray_session):
    from stacksearch_ray.functions.joins import propagate_min_labels

    # two chains + a singleton: {1-2-3-4}, {10-11}, {99}
    pairs = pd.DataFrame({"a": [1, 2, 3, 10], "b": [2, 3, 4, 11]})
    nodes = np.array([1, 2, 3, 4, 10, 11, 99], dtype=np.int64)
    out = propagate_min_labels(_ds(pairs), nodes).set_index("doc_id")["cluster_id"]
    assert out[1] == out[2] == out[3] == out[4] == 1
    assert out[10] == out[11] == 10
    assert out[99] == 99


def test_asof_join_matches_pandas(ray_session):
    """asof_join == pandas merge_asof(by=key) on random per-key series,
    including keys with no match and left rows before any right row."""
    from stacksearch_ray.functions.joins import asof_join

    rng = np.random.default_rng(6)
    left = pd.DataFrame({
        "k": rng.integers(0, 12, 300).astype(np.int64),
        "t": rng.integers(0, 10_000, 300).astype(np.int64),
        "lv": np.arange(300, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, 150).astype(np.int64),
        "t": rng.integers(0, 10_000, 150).astype(np.int64),
        "rv": np.arange(150, dtype=np.int64) * 7,
    })
    got = (asof_join(_ds(left), _ds(right), by="k", on="t",
                     num_buckets=4).to_pandas()
           [["k", "t", "lv", "t_r", "rv"]])
    expect = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                           on="t", by="k", suffixes=("", "_r"),
                           direction="backward")
    expect = expect[expect["rv"].notna()].copy()
    # pandas keeps right's t only implicitly; recompute via the matched rv
    rmap = right.set_index("rv")["t"]
    expect["t_r"] = expect["rv"].map(rmap).astype(np.int64)
    expect["rv"] = expect["rv"].astype(np.int64)
    cols = ["k", "t", "lv", "t_r", "rv"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = expect[cols].sort_values(cols).reset_index(drop=True)
    assert a.astype("int64").equals(b.astype("int64"))


def test_range_join_matches_bruteforce(ray_session):
    """range_join == the O(n*m) per-key cartesian filter on random
    series, across band boundaries, negative values, and empty keys."""
    from stacksearch_ray.functions.joins import range_join

    rng = np.random.default_rng(9)
    left = pd.DataFrame({
        "k": rng.integers(0, 12, 300).astype(np.int64),
        "t": rng.integers(-5_000, 10_000, 300).astype(np.int64),
        "lv": np.arange(300, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, 150).astype(np.int64),
        "t": rng.integers(-5_000, 10_000, 150).astype(np.int64),
        "rv": np.arange(150, dtype=np.int64) * 7,
    })
    for lower, upper in ((0, 700), (-300, 300), (100, 100)):
        got = range_join(_ds(left), _ds(right), by="k", on="t",
                         lower=lower, upper=upper, num_buckets=4).to_pandas()
        ref = left.merge(right, on="k", suffixes=("", "_r"))
        d = ref["t"] - ref["t_r"]
        ref = ref[(d >= lower) & (d <= upper)]
        if ref.empty:
            # an all-empty map_groups output has no schema to compare
            assert got.empty, (lower, upper)
            continue
        cols = ["k", "t", "lv", "t_r", "rv"]
        a = got[cols].sort_values(cols).reset_index(drop=True)
        b = ref[cols].sort_values(cols).reset_index(drop=True)
        assert a.astype("int64").equals(b.astype("int64")), (lower, upper)


def test_label_propagation_join_lookup_identical(ray_session):
    """lookup='join' (edges hash-joined to labels, no broadcast) ==
    the broadcast lookup."""
    from stacksearch_ray.functions.joins import propagate_min_labels

    pairs = pd.DataFrame({"a": [1, 2, 3, 10], "b": [2, 3, 4, 11]})
    nodes = np.array([1, 2, 3, 4, 10, 11, 99], dtype=np.int64)
    a = propagate_min_labels(_ds(pairs), nodes).sort_values("doc_id")
    b = propagate_min_labels(_ds(pairs), nodes,
                             lookup="join").sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_distributed_equals_driver_clustering(ray_session):
    """Distributed propagation == the driver union-loop used by
    minhash_lsh_clusters, on a random graph."""
    from stacksearch_ray.functions.joins import propagate_min_labels

    rng = np.random.default_rng(8)
    n = 200
    a = rng.integers(0, n, 150)
    b = rng.integers(0, n, 150)
    keep = a != b
    pairs = pd.DataFrame({"a": np.minimum(a, b)[keep].astype(np.int64),
                          "b": np.maximum(a, b)[keep].astype(np.int64)})
    nodes = np.arange(n, dtype=np.int64)
    dist = propagate_min_labels(_ds(pairs), nodes).set_index("doc_id")["cluster_id"]

    label = {int(d): int(d) for d in nodes}
    edges = list(zip(pairs["a"], pairs["b"]))
    for _ in range(50):
        changed = False
        for x, y in edges:
            m = min(label[x], label[y])
            if label[x] != m or label[y] != m:
                label[x] = label[y] = m
                changed = True
        if not changed:
            break
    for node in nodes:
        assert dist[node] == label[int(node)], node


def test_dataset_label_propagation_matches_legacy(ray_session):
    """propagate_min_labels_ds (label table a Dataset end to end) ==
    the legacy pandas-frame propagation, on a random graph."""
    import ray.data as rd

    from stacksearch_ray.functions.joins import (
        propagate_min_labels,
        propagate_min_labels_ds,
    )

    rng = np.random.default_rng(13)
    # dense graph → small diameter → few propagation rounds (each round
    # is a real Ray shuffle; a sparse 300-node chainy graph costs ~17
    # rounds and nearly a minute of suite time for no extra coverage)
    n = 100
    a = rng.integers(0, n, 200)
    b = rng.integers(0, n, 200)
    keep = a != b
    pairs = pd.DataFrame({"a": np.minimum(a, b)[keep].astype(np.int64),
                          "b": np.maximum(a, b)[keep].astype(np.int64)})
    nodes_arr = np.arange(n, dtype=np.int64)
    nodes_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes_arr)}))

    legacy = (propagate_min_labels(_ds(pairs), nodes_arr)
              .sort_values("doc_id").reset_index(drop=True))
    ds_out = (propagate_min_labels_ds(_ds(pairs), nodes_ds).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert ds_out.equals(legacy)


def test_dataset_label_propagation_million_nodes(ray_session, tmp_path):
    """Scale shape: 10^6 nodes clustered with the label table a Dataset
    end to end — consumed via write_parquet, validated with distributed
    aggregates only (no driver-side label materialization)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    from stacksearch_ray.functions.joins import propagate_min_labels_ds

    n = 1_000_000
    n_pairs = 400_000  # pairs (2i, 2i+1) for i < 400k; rest singletons

    def gen_nodes(batch):
        lo = int(batch["lo"][0].as_py())
        ids = np.arange(lo, min(lo + 100_000, n), dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids)})

    nodes = rd.from_arrow(pa.table(
        {"lo": pa.array(np.arange(0, n, 100_000, dtype=np.int64))}
    )).map_batches(gen_nodes, batch_format="pyarrow", batch_size=1)

    def gen_pairs(batch):
        lo = int(batch["lo"][0].as_py())
        i = np.arange(lo, min(lo + 100_000, n_pairs), dtype=np.int64)
        return pa.table({"a": pa.array(2 * i), "b": pa.array(2 * i + 1)})

    pairs = rd.from_arrow(pa.table(
        {"lo": pa.array(np.arange(0, n_pairs, 100_000, dtype=np.int64))}
    )).map_batches(gen_pairs, batch_format="pyarrow", batch_size=1)

    labels = propagate_min_labels_ds(pairs, nodes, num_buckets=8)
    out_dir = str(tmp_path / "labels")
    labels.write_parquet(out_dir)

    # validate via streaming aggregates over the parquet output:
    # paired nodes 2i and 2i+1 both get label 2i; singletons keep own id
    got_rows, got_sum = 0, 0
    for rb in pads.dataset(out_dir).to_batches(columns=["doc_id",
                                                        "cluster_id"]):
        got_rows += rb.num_rows
        d = rb.column(0).to_numpy(zero_copy_only=False)
        c = rb.column(1).to_numpy(zero_copy_only=False)
        exp = np.where(d < 2 * n_pairs, d & ~np.int64(1), d)
        assert (c == exp).all()
        got_sum += int(c.sum())
    assert got_rows == n
    i = np.arange(n_pairs, dtype=np.int64)
    sing = np.arange(2 * n_pairs, n, dtype=np.int64)
    assert got_sum == int((4 * i).sum() + sing.sum())


# ---------------- bloom semi-join ----------------


def test_bloom_no_false_negatives(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.bloom import _hashes, build_bloom

    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    bm = build_bloom(rd.from_arrow(pa.table({"k": keys})), "k",
                     m_bits=1 << 16, k=4)
    pos = _hashes(keys, 1 << 16, 4)
    for j in range(4):
        p = pos[j]
        byte = bm[(p >> np.uint64(3)).astype(np.int64)]
        assert np.all((byte >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1)


def test_bloom_semi_join_modes_match_ground_truth(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.bloom import bloom_semi_join

    rng = np.random.default_rng(4)
    big_keys = rng.integers(0, 2000, size=3000, dtype=np.int64)
    vals = np.arange(3000, dtype=np.int64)
    keyset = rng.choice(2000, size=300, replace=False).astype(np.int64)
    # duplicate keys on the key side must not duplicate output rows
    keys_tbl = pa.table({"k": np.concatenate([keyset, keyset[:50]])})
    big = rd.from_arrow(pa.table({"k": big_keys, "v": vals}))
    expect = set(vals[np.isin(big_keys, keyset)].tolist())
    for verify in ("broadcast", "join"):
        out = bloom_semi_join(big, rd.from_arrow(keys_tbl), on="k",
                              m_bits=1 << 14, verify=verify).to_pandas()
        assert set(out["v"]) == expect, verify
        assert len(out) == len(expect), verify
        assert sorted(out.columns) == ["k", "v"]


def test_bloom_semi_join_empty_sides(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.bloom import bloom_semi_join

    big = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                  "v": pa.array([9, 8, 7], pa.int64())}))
    none = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert bloom_semi_join(big, none, on="k",
                           verify="broadcast").count() == 0
    assert bloom_semi_join(big, none, on="k", m_bits=1 << 10,
                           verify="join").count() == 0


def test_bloom_anti_join_modes_match_ground_truth(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.bloom import bloom_anti_join

    rng = np.random.default_rng(5)
    big_keys = rng.integers(0, 2000, size=3000, dtype=np.int64)
    vals = np.arange(3000, dtype=np.int64)
    keyset = rng.choice(2000, size=300, replace=False).astype(np.int64)
    big = rd.from_arrow(pa.table({"k": big_keys, "v": vals}))
    keys = rd.from_arrow(pa.table({"k": keyset}))
    expect = set(vals[~np.isin(big_keys, keyset)].tolist())
    for verify in ("broadcast", "join"):
        out = bloom_anti_join(big, keys, on="k", m_bits=1 << 14,
                              verify=verify).to_pandas()
        assert set(out["v"]) == expect, verify
        assert len(out) == len(expect), verify
        assert str(out["v"].dtype) == "int64", verify


def test_bloom_anti_join_empty_keys(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.bloom import bloom_anti_join

    big = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                  "v": pa.array([5, 6], pa.int64())}))
    none = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    for verify in ("broadcast", "join"):
        assert bloom_anti_join(big, none, on="k", m_bits=1 << 10,
                               verify=verify).count() == 2


def test_setops_intersect_except(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.setops import (
        except_distinct,
        intersect_distinct,
    )

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": pa.array([2, 3, 3, 4], pa.int64())}))
    assert sorted(intersect_distinct(a, b, "k").to_pandas()["k"]) == [2, 3]
    assert sorted(except_distinct(a, b, "k").to_pandas()["k"]) == [1, 5]
    assert sorted(except_distinct(b, a, "k").to_pandas()["k"]) == [4]


def test_bloom_tree_reduce_many_blocks(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions import bloom as B

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 10_000, size=2000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": keys})).repartition(100).materialize()
    # force the tree path (100 blocks > threshold)
    assert ds.num_blocks() > B._TREE_THRESHOLD
    bm_tree = B.build_bloom(ds, "k", m_bits=1 << 14, k=3)
    bm_flat = B.build_bloom(ds.repartition(4), "k", m_bits=1 << 14, k=3)
    assert np.array_equal(bm_tree, bm_flat)
