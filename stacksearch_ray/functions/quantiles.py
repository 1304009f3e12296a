"""Distributed EXACT selection (kth smallest / discrete quantiles) by
iterative histogram narrowing — no global sort, no data shuffle.

Each pass streams the column once through ``map_batches``, emitting one
tiny (bin, count) partial table per batch (nonzero bins only); a
256-row groupby-sum locates the bin containing the target rank, which
narrows the value range for the next pass. When the candidate bin holds
few enough values they are pulled once and solved with ``np.partition``.
Converges in O(log₂₅₆ of the value range) ≈ 2–4 passes for float64 —
the classic distributed-selection alternative to ``ds.sort`` (an
all-to-all) when only order statistics are needed.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum


def _range_mask(v: np.ndarray, lo: float, hi: float,
                hi_inc: bool) -> np.ndarray:
    m = v >= lo
    return m & ((v <= hi) if hi_inc else (v < hi))


def kth_smallest(ds: Dataset, col: str, k: int, bins: int = 256,
                 exact_threshold: int = 100_000,
                 max_passes: int = 16) -> float:
    """Value at 0-indexed rank ``k`` of the ascending-sorted column
    (ties resolved by multiplicity, as in a sorted array). Exact.

    The active range is [lo, hi) for interior bins and [lo, hi] only
    while the original maximum is still in range — otherwise upper-edge
    values of a bin would be double-counted in the next pass."""
    agg = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(agg["lo"]), float(agg["hi"])
    hi_inc = True

    for _ in range(max_passes):
        if lo == hi:
            return lo
        if np.nextafter(lo, np.inf) >= hi:
            # the range holds at most two representable doubles — a mass
            # of duplicates can't subdivide further; one counting pass
            # decides which side rank k falls on
            def cnt_lo(batch: pa.Table, lo=lo, hi=hi,
                       hi_inc=hi_inc) -> pa.Table:
                v = np.asarray(batch[col].combine_chunks().cast(pa.float64()))
                v = v[_range_mask(v, lo, hi, hi_inc)]
                return pa.table({"c": pa.array([int((v == lo).sum())],
                                               pa.int64())})

            c_lo = int(ds.map_batches(cnt_lo, batch_format="pyarrow")
                       .sum("c") or 0)
            return lo if k < c_lo else hi
        edges = np.linspace(lo, hi, bins + 1)

        def hist(batch: pa.Table, edges=edges, lo=lo, hi=hi,
                 hi_inc=hi_inc) -> pa.Table:
            v = np.asarray(batch[col].combine_chunks().cast(pa.float64()))
            v = v[_range_mask(v, lo, hi, hi_inc)]
            if len(v) == 0:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            b = np.clip(np.searchsorted(edges, v, side="right") - 1,
                        0, bins - 1)
            bc = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(bc)
            return pa.table({"bin": nz.astype(np.int64),
                             "cnt": bc[nz].astype(np.int64)})

        hrows = (ds.map_batches(hist, batch_format="pyarrow")
                 .groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
                 .to_pandas().sort_values("bin"))
        counts = np.zeros(bins, dtype=np.int64)
        counts[hrows["bin"].to_numpy()] = hrows["cnt"].to_numpy()
        cum = np.concatenate(([0], np.cumsum(counts)))
        if k >= cum[-1]:
            raise IndexError(f"k={k} out of range (n={int(cum[-1])})")
        j = int(np.searchsorted(cum, k, side="right")) - 1
        k -= int(cum[j])
        if counts[j] <= exact_threshold:
            def pull(batch: pa.Table, edges=edges, lo=lo, hi=hi,
                     hi_inc=hi_inc, j=j) -> pa.Table:
                v = np.asarray(batch[col].combine_chunks().cast(pa.float64()))
                v = v[_range_mask(v, lo, hi, hi_inc)]
                if len(v):
                    b = np.clip(np.searchsorted(edges, v, side="right") - 1,
                                0, bins - 1)
                    v = v[b == j]
                return pa.table({"v": pa.array(v, pa.float64())})

            vals = (ds.map_batches(pull, batch_format="pyarrow")
                    .to_pandas()["v"].to_numpy())
            return float(np.partition(vals, k)[k])
        # bin j spans [edges[j], edges[j+1]) — upper edge EXCLUSIVE for
        # interior bins (those values live in bin j+1); the last bin
        # keeps the current upper inclusivity
        if j < bins - 1:
            lo, hi, hi_inc = float(edges[j]), float(edges[j + 1]), False
        else:
            lo = float(edges[j])
    raise RuntimeError("kth_smallest did not converge (pathological "
                       "value distribution?) — raise max_passes")


def quantile_disc(ds: Dataset, col: str, q: float) -> float:
    """Discrete quantile with DuckDB ``quantile_disc`` index semantics
    (rank = ⌈q·n⌉ − 1), so the driver oracle matches exactly."""
    n = ds.count()
    if n == 0:
        raise ValueError("empty dataset")
    k = max(0, math.ceil(q * n) - 1)
    return kth_smallest(ds, col, k)
