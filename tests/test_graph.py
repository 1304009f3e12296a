import pyarrow as pa


def test_pagerank_micros_hand_trajectory(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.graph import pagerank_micros

    # 1→2, 1→3, 2→1; node 3 is a sink (dangling — mass drains).
    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 1, 2], pa.int64()),
        "dst": pa.array([2, 3, 1], pa.int64()),
    }))
    out = (pagerank_micros(edges, iterations=3, num_buckets=4)
           .to_pandas().set_index("node")["pr_micros"])
    # n=3, pr0=333333, base=50000; integer floor steps by hand:
    # it1: 1←333333 → 333333; 2,3←166666 → 191666
    # it2: 1←191666 → 212916; 2,3 → 191666
    # it3: 1←191666 → 212916; 2,3←106458 → 140489
    assert out.loc[1] == 212916
    assert out.loc[2] == 140489
    assert out.loc[3] == 140489
