"""Wave-16 semantics: ES bucket_sort / bucket_selector pipeline aggs and
the geotile-style integer grid + geo_centroid agg. The DuckDB oracle
(selfcheck) pins exact values; these pin the MEANING — truncation
window, per-bucket predicate, grid-cell containment of centroids."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _monthly_hist():
    t = pq.read_table(os.path.join(SF, "orders.parquet"),
                      columns=["o_orderdate", "o_orderpriority"]).to_pandas()
    t["y"] = t["o_orderdate"].dt.year.astype(np.int64)
    t["m"] = t["o_orderdate"].dt.month.astype(np.int64)
    t["urgent"] = (t["o_orderpriority"] == "1-URGENT").astype(np.int64)
    g = (t.groupby(["y", "m"], as_index=False)
         .agg(n=("urgent", "size"), n_urgent=("urgent", "sum")))
    return g


def test_bucket_sort_is_the_from_size_window(ray_session):
    from stacksearch_ray.pipelines.documents import (
        BSORT_FROM, BSORT_SIZE, bucket_sort_pipeline)

    out = bucket_sort_pipeline(SF).to_pandas()
    g = _monthly_hist()
    order = np.lexsort((g["m"].to_numpy(), g["y"].to_numpy(),
                        -g["n"].to_numpy()))
    ref = g.iloc[order[BSORT_FROM:BSORT_FROM + BSORT_SIZE]]
    assert out["pos"].tolist() == list(
        range(BSORT_FROM + 1, BSORT_FROM + 1 + len(ref)))
    assert out["y"].tolist() == ref["y"].tolist()
    assert out["m"].tolist() == ref["m"].tolist()
    assert out["n"].tolist() == ref["n"].tolist()
    # sorted by count DESC inside the window
    assert (np.diff(out["n"].to_numpy()) <= 0).all()


def test_bucket_selector_keeps_exactly_the_predicate_rows(ray_session):
    from stacksearch_ray.pipelines.documents import (
        BSEL_NUM, bucket_selector_pipeline)

    out = bucket_selector_pipeline(SF).to_pandas()
    g = _monthly_hist()
    ref = g[g["n_urgent"] * BSEL_NUM > g["n"]].sort_values(["y", "m"])
    assert out[["y", "m", "n", "n_urgent"]].reset_index(drop=True).equals(
        ref[["y", "m", "n", "n_urgent"]].reset_index(drop=True))
    assert (out["n_urgent"].to_numpy() * BSEL_NUM
            > out["n"].to_numpy()).all()


def test_geo_grid_partitions_and_centroids_contained(ray_session):
    from stacksearch_ray.pipelines.documents import GEO_GRID_N, geo_grid_agg

    out = geo_grid_agg(SF).to_pandas()
    n_cust = pq.read_metadata(
        os.path.join(SF, "customer.parquet")).num_rows
    # every customer lands in exactly one cell
    assert int(out["n"].sum()) == n_cust
    cells = out["cell"].to_numpy(np.int64)
    assert cells.min() >= 0 and cells.max() < GEO_GRID_N * GEO_GRID_N
    assert (np.diff(cells) > 0).all()  # unique, sorted
    # centroid containment: the floor-average of points in a cell lies
    # within that cell's lat/lon band (up to the floor's 1-micro slack)
    cy, cx = cells // GEO_GRID_N, cells % GEO_GRID_N
    lat = out["centroid_lat_micros"].to_numpy(np.int64)
    lon = out["centroid_lon_micros"].to_numpy(np.int64)
    # cell bounds from the forward map: cy = (90e6 - lat)*N // 180000001
    lat_hi = 90_000_000 - np.ceil(cy * 180_000_001 / GEO_GRID_N
                                  ).astype(np.int64) + 1
    lat_lo = 90_000_000 - ((cy + 1) * 180_000_001 // GEO_GRID_N)
    lon_lo = np.ceil(cx * 360_000_001 / GEO_GRID_N).astype(np.int64) \
        - 180_000_000
    lon_hi = ((cx + 1) * 360_000_001 // GEO_GRID_N) - 180_000_000
    assert (lat >= lat_lo - 1).all() and (lat <= lat_hi).all()
    assert (lon >= lon_lo - 1).all() and (lon <= lon_hi).all()
