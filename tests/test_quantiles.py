"""Distributed exact selection: kth_smallest / quantile_disc vs numpy
sort and DuckDB quantile_disc semantics."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})
                         ).repartition(8)


def test_kth_matches_numpy(ray_session):
    from stacksearch_ray.functions.quantiles import kth_smallest

    rng = np.random.default_rng(2)
    vals = np.concatenate([rng.lognormal(2, 1, 5000),
                           -rng.lognormal(0, 2, 3000)])
    s = np.sort(vals)
    ds = _ds(vals)
    # tiny exact_threshold forces several narrowing passes
    for k in (0, 1, 3999, 4000, len(vals) - 1):
        got = kth_smallest(ds, "v", k, exact_threshold=50)
        assert got == s[k], k


def test_kth_mass_duplicates(ray_session):
    from stacksearch_ray.functions.quantiles import kth_smallest

    vals = np.concatenate([np.full(4000, 7.25), np.full(3000, 7.2500001),
                           np.array([1.0, 99.0])])
    s = np.sort(vals)
    ds = _ds(vals)
    for k in (0, 1, 3999, 4000, 4001, len(vals) - 1):
        assert kth_smallest(ds, "v", k, exact_threshold=10) == s[k], k


def test_quantile_disc_matches_duckdb(ray_session):
    import duckdb

    from stacksearch_ray.functions.quantiles import quantile_disc

    rng = np.random.default_rng(5)
    vals = rng.normal(0, 100, 2001)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(float(v),) for v in vals])
    ds = _ds(vals)
    for q in (0.1, 0.5, 0.9, 0.999):
        expect = con.sql(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert quantile_disc(ds, "v", q) == expect, q


def test_kth_property_random(ray_session):
    """Property check over awkward distributions: duplicates, negatives,
    huge magnitudes, tiny ranges — every k matches the sorted array."""
    from stacksearch_ray.functions.quantiles import kth_smallest

    rng = np.random.default_rng(11)
    cases = [
        rng.choice([0.0, -0.0, 1e-300, 1e300, -5.5], size=500),
        np.repeat(rng.normal(0, 1, 7), 100),
        rng.uniform(-1e-9, 1e-9, 400),
        np.concatenate([np.full(300, 3.14), rng.normal(3.14, 1e-12, 300)]),
    ]
    for vals in cases:
        s = np.sort(vals)
        ds = _ds(vals)
        for k in sorted({0, len(vals) // 3, len(vals) // 2, len(vals) - 1}):
            assert kth_smallest(ds, "v", int(k), exact_threshold=32) == s[k], \
                (k, vals[:4])


def test_kth_out_of_range(ray_session):
    from stacksearch_ray.functions.quantiles import kth_smallest

    with pytest.raises(IndexError):
        kth_smallest(_ds([1.0, 2.0]), "v", 5)


def test_grouped_quantile_matches_numpy(ray_session):
    import math

    import ray.data as rd

    from stacksearch_ray.functions.quantiles import grouped_quantile_disc

    rng = np.random.default_rng(9)
    parts = {
        "a": rng.standard_normal(5000) * 100,
        "b": rng.uniform(-5, 1e30, 3000),   # huge range: bit-space path
        "c": np.array([42.0]),              # singleton group
        "d": np.repeat(7.5, 400),           # all-equal group
    }
    g = np.concatenate([[k] * len(v) for k, v in parts.items()])
    v = np.concatenate(list(parts.values()))
    perm = rng.permutation(len(v))
    ds = rd.from_arrow(pa.table({"g": g[perm], "v": v[perm]})
                       ).repartition(8)
    for q in (0.1, 0.5, 0.9):
        out = grouped_quantile_disc(ds, "g", "v", q,
                                    exact_threshold=50)
        got = dict(zip(out["g"].to_pylist(), out["value"].to_pylist()))
        for key, vals in parts.items():
            k = max(0, math.ceil(q * len(vals)) - 1)
            expect = float(np.sort(vals)[k])
            assert got[key] == expect, (key, q)


def test_quantiles_cont_matches_numpy(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.quantiles import quantiles_cont

    rng = np.random.default_rng(12)
    v = rng.standard_normal(4001) * 50
    ds = rd.from_arrow(pa.table({"v": v})).repartition(8)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = quantiles_cont(ds, "v", qs)
    for q, g in zip(qs, got):
        assert np.isclose(g, np.quantile(v, q, method="linear"),
                          rtol=0, atol=1e-12), q


def test_quantile_sketch_rank_error_bound(ray_session):
    import ray.data as rd

    from stacksearch_ray.functions.quantiles import (
        quantile_sketch,
        quantiles_disc,
    )

    rng = np.random.default_rng(5)
    # heavy-tailed + a point mass: the shapes that break naive binning
    v = np.concatenate([rng.lognormal(0, 3, 20_000),
                        np.full(2_000, 7.25),
                        -rng.lognormal(1, 2, 8_000)])
    ds = rd.from_arrow(pa.table({"v": pa.array(v, pa.float64())}))
    qs = [0.1, 0.5, 0.9, 0.99]
    got = quantile_sketch(ds, "v", qs, bits=16)
    exact = quantiles_disc(ds, "v", qs)
    sv = np.sort(v)
    n = len(v)
    for (est, err_bound), q, ex in zip(got, qs, exact):
        target = max(0, int(np.ceil(q * n)) - 1)
        # the estimate is an actual data value...
        assert np.any(sv == est)
        # ...whose rank is within the reported per-bucket bound
        lo = np.searchsorted(sv, est, side="left")
        hi = np.searchsorted(sv, est, side="right") - 1
        dist = 0 if lo <= target <= hi else min(abs(lo - target),
                                                abs(hi - target))
        assert dist < err_bound
        # and on continuous data the bound itself is tight
        assert err_bound < n * 0.01 or est == ex
