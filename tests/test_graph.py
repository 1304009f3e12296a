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


def test_ppr_all_seeds_equals_uniform_and_zero_isolates(ray_session):
    """Personalized-PageRank invariants: seeding EVERY node reproduces
    the uniform run bitwise (same integer base/start), and with a
    strict seed subset, nodes with no inbound path from the seeds hold
    exactly zero mass."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stacksearch_ray.functions.graph import pagerank_micros

    rng = np.random.default_rng(21)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    # two isolated sink-only nodes unreachable from anything
    src = np.concatenate([src, [97, 98]])
    dst = np.concatenate([dst, [99, 99]])
    pairs = np.unique(src * 1000 + dst)
    edges = rd.from_arrow(pa.table({
        "src": pa.array(pairs // 1000, pa.int64()),
        "dst": pa.array(pairs % 1000, pa.int64()),
    }))
    uni = (pagerank_micros(edges, iterations=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    all_nodes = sorted(set((pairs // 1000).tolist())
                       | set((pairs % 1000).tolist()))
    seeded = (pagerank_micros(edges, iterations=2, seeds=all_nodes)
              .to_pandas().sort_values("node").reset_index(drop=True))
    assert uni.equals(seeded)
    # strict subset: 97/98/99 are unreachable from seed 0
    ppr = (pagerank_micros(edges, iterations=2, seeds=[0]).to_pandas()
           .set_index("node")["pr_micros"])
    assert ppr.loc[97] == 0 and ppr.loc[98] == 0
    assert ppr.loc[0] > 0
