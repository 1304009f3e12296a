import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_grouped_running_sums_matches_pandas(ray_session):
    """cum/rollN == pandas groupby cumsum / rolling(min_periods=1) on
    random per-key series, across bucket boundaries and window sizes."""
    from stacksearch_ray.functions.windows import grouped_running_sums

    rng = np.random.default_rng(12)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 15, n).astype(np.int64),
        "t": rng.permutation(n).astype(np.int64),  # unique order key
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    for window in (1, 3, 7):
        got = (grouped_running_sums(_ds(df), by="k", order=["t"],
                                    value_col="v", window=window,
                                    num_buckets=4)
               .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
        ref = df.sort_values(["k", "t"]).reset_index(drop=True)
        grp = ref.groupby("k", sort=False)["v"]
        ref["cum_v"] = grp.cumsum()
        ref[f"roll{window}_v"] = (
            grp.rolling(window, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype(np.int64))
        cols = ["k", "t", "v", "cum_v", f"roll{window}_v"]
        assert got[cols].astype("int64").equals(ref[cols].astype("int64")), \
            window


def test_grouped_running_sums_single_key_and_short_groups(ray_session):
    """Window longer than a group's row count degrades to the running
    total; a single hot key stays exact inside one bucket."""
    from stacksearch_ray.functions.windows import grouped_running_sums

    df = pd.DataFrame({
        "k": np.array([1, 1, 1, 2], dtype=np.int64),
        "t": np.array([10, 20, 30, 5], dtype=np.int64),
        "v": np.array([4, -2, 7, 9], dtype=np.int64),
    })
    got = (grouped_running_sums(_ds(df), by="k", order=["t"],
                                value_col="v", window=10, num_buckets=2)
           .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    assert got["cum_v"].tolist() == [4, 2, 9, 9]
    assert got["roll10_v"].tolist() == [4, 2, 9, 9]


def test_grouped_shift_lag_and_lead(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.windows import grouped_shift

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "o": pa.array([10, 20, 30, 5, 6, 1], pa.int64()),
        "v": pa.array([100, 200, 300, 7, 8, 9], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    lag = (grouped_shift(ds, by="k", order=["o"], value_col="v",
                         periods=1).to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    def vals(s):
        return [None if v is None else int(v)
                for v in s.astype(object).where(s.notna(), None)]

    assert vals(lag["lag_v"]) == [None, 100, 200, None, 7, None]
    lead = (grouped_shift(ds, by="k", order=["o"], value_col="v",
                          periods=-1).to_pandas()
            .sort_values(["k", "o"]).reset_index(drop=True))
    assert vals(lead["lead_v"]) == [200, 300, None, 8, None, None]


def test_grouped_ranks_ties_and_tiles(ray_session):
    import ray.data as rd
    from stacksearch_ray.functions.windows import grouped_ranks

    # key 1: values 10,10,20,30,30,30 (6 rows, ties); key 2: singleton;
    # key 3: two rows (count < ntiles → one row per tile)
    t = pa.table({
        "k": pa.array([1] * 6 + [2] + [3, 3], pa.int64()),
        "v": pa.array([10, 10, 20, 30, 30, 30, 5, 7, 7], pa.int64()),
        "id": pa.array(list(range(9)), pa.int64()),
    })
    out = (grouped_ranks(rd.from_arrow(t).repartition(3), by="k",
                         rank_cols=["v"], tiebreak=["id"], ntiles=4)
           .to_pandas().sort_values(["k", "id"]).reset_index(drop=True))
    k1 = out[out["k"] == 1]
    assert k1["row_number"].tolist() == [1, 2, 3, 4, 5, 6]
    assert k1["rank"].tolist() == [1, 1, 3, 4, 4, 4]
    assert k1["dense_rank"].tolist() == [1, 1, 2, 3, 3, 3]
    # ntile(4) over 6 rows: sizes 2,2,1,1
    assert k1["ntile4"].tolist() == [1, 1, 2, 2, 3, 4]
    # percent_rank = (rank-1)/5; cume_dist = run_end/6
    assert k1["percent_rank_micros"].tolist() == [0, 0, 400000,
                                                  600000, 600000, 600000]
    assert k1["cume_dist_micros"].tolist() == [333333, 333333, 500000,
                                               1000000, 1000000, 1000000]
    k2 = out[out["k"] == 2]
    assert k2["rank"].tolist() == [1]
    assert k2["percent_rank_micros"].tolist() == [0]   # singleton → 0
    assert k2["cume_dist_micros"].tolist() == [1000000]
    k3 = out[out["k"] == 3]  # tie pair: rank 1,1 but ntile 1,2
    assert k3["rank"].tolist() == [1, 1]
    assert k3["ntile4"].tolist() == [1, 2]


def test_keyed_offsets_exclusive_prefix_sum(ray_session):
    import numpy as np
    import ray.data as rd
    from stacksearch_ray.functions.windows import keyed_offsets

    rng = np.random.default_rng(3)
    keys = rng.permutation(2000).astype(np.int64)  # arbitrary arrival order
    vals = rng.integers(0, 50, 2000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "n": vals})).repartition(7)
    out = (keyed_offsets(ds, "k", "n", bucket_size=64)
           .to_pandas().sort_values("k").reset_index(drop=True))
    order = np.argsort(keys)
    expect = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    assert out["k"].tolist() == sorted(keys.tolist())
    assert np.array_equal(out["offset"].to_numpy(), expect)


def test_grouped_range_window_peer_semantics(ray_session):
    import ray.data as rd
    from stacksearch_ray.functions.windows import grouped_range_window

    # user 1: ts 0, 10, 10, 25 with window 10 — the two ts=10 rows are
    # RANGE peers: each includes the OTHER equal-ts row (and ts=0,
    # which is exactly window distance away); ts=25 sees only itself
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10, 10, 25, 5], pa.int64()),
        "v": pa.array([1, 2, 4, 8, 16], pa.int64()),
    })
    out = (grouped_range_window(rd.from_arrow(t).repartition(2), by="k",
                                ts_col="ts", value_col="v", window=10)
           .to_pandas().sort_values(["k", "ts", "v"]).reset_index(drop=True))
    k1 = out[out.k == 1]
    assert k1["win_sum_v"].tolist() == [1, 7, 7, 8]
    assert k1["win_n"].tolist() == [1, 3, 3, 1]
    assert out[out.k == 2]["win_sum_v"].tolist() == [16]
