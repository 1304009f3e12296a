"""Distributed EXACT selection (kth smallest / discrete quantiles) by
iterative histogram narrowing — no global sort, no data shuffle.

Each pass streams the column once through ``map_batches``, emitting one
tiny (bin, count) partial table per batch (nonzero bins only); a
256-row groupby-sum locates the bin containing the target rank, which
narrows the key range for the next pass. Narrowing happens in MONOTONE
FLOAT-BIT space (the IEEE-754 total-order key), so every pass shrinks
the key span by the bin factor regardless of the value distribution —
guaranteed ≤ ⌈64 / log₂(bins)⌉ = 8 passes at 256 bins (a linear-value
binning degenerates on huge ranges like [-5, 1e300], found by the
property test). When the rank's bin holds few enough values they are
pulled once and solved with ``np.partition``; a single-key bin is
answered directly. The classic distributed-selection alternative to
``ds.sort`` (an all-to-all) when only order statistics are needed.
NaNs are not supported (filter upstream).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

_SIGN = np.uint64(1 << 63)


def _float_keys(v: np.ndarray) -> np.ndarray:
    """IEEE-754 total-order key: monotone uint64 image of float64."""
    i = np.ascontiguousarray(v, dtype=np.float64).view(np.int64)
    u = i.view(np.uint64)
    return np.where(i >= 0, u ^ _SIGN, ~u)


def _key_to_float(k: int) -> float:
    ku = np.uint64(k)
    u = (ku ^ _SIGN) if k >= (1 << 63) else ~ku
    return float(np.uint64(u).view(np.float64))


def kth_smallest(ds: Dataset, col: str, k: int, bins: int = 256,
                 exact_threshold: int = 100_000) -> float:
    """Value at 0-indexed rank ``k`` of the ascending-sorted column
    (ties resolved by multiplicity, as in a sorted array). Exact."""
    lo_k, hi_k = 0, (1 << 64) - 1  # full key space; first pass narrows
    remaining = None

    max_passes = math.ceil(64 / math.log2(bins)) + 2
    for _ in range(max_passes):
        span = hi_k - lo_k + 1
        scale = (span + bins - 1) // bins
        lo_u, hi_u, sc_u = (np.uint64(lo_k), np.uint64(hi_k),
                            np.uint64(scale))

        def hist(batch: pa.Table, lo_u=lo_u, hi_u=hi_u,
                 sc_u=sc_u) -> pa.Table:
            keys = _float_keys(
                np.asarray(batch[col].combine_chunks().cast(pa.float64())))
            keys = keys[(keys >= lo_u) & (keys <= hi_u)]
            if len(keys) == 0:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            b = ((keys - lo_u) // sc_u).astype(np.int64)
            bc = np.bincount(b, minlength=1)
            nz = np.flatnonzero(bc)
            return pa.table({"bin": nz.astype(np.int64),
                             "cnt": bc[nz].astype(np.int64)})

        hrows = (ds.map_batches(hist, batch_format="pyarrow")
                 .groupby("bin").aggregate(Sum("cnt", alias_name="cnt"))
                 .to_pandas().sort_values("bin"))
        hbins = hrows["bin"].to_numpy()
        hcnts = hrows["cnt"].to_numpy()
        cum = np.concatenate(([0], np.cumsum(hcnts)))
        total = int(cum[-1])
        if remaining is None and k >= total:
            raise IndexError(f"k={k} out of range (n={total})")
        pos = int(np.searchsorted(cum, k, side="right")) - 1
        j = int(hbins[pos])
        k -= int(cum[pos])
        remaining = int(hcnts[pos])
        lo_k2 = lo_k + j * scale
        hi_k2 = min(hi_k, lo_k + (j + 1) * scale - 1)
        if scale == 1 or lo_k2 == hi_k2:
            return _key_to_float(lo_k2)
        if remaining <= exact_threshold:
            lo_u2, hi_u2 = np.uint64(lo_k2), np.uint64(hi_k2)

            def pull(batch: pa.Table, lo_u2=lo_u2,
                     hi_u2=hi_u2) -> pa.Table:
                v = np.asarray(batch[col].combine_chunks().cast(pa.float64()))
                keys = _float_keys(v)
                return pa.table({"v": pa.array(
                    v[(keys >= lo_u2) & (keys <= hi_u2)], pa.float64())})

            vals = (ds.map_batches(pull, batch_format="pyarrow")
                    .to_pandas()["v"].to_numpy())
            return float(np.partition(vals, k)[k])
        lo_k, hi_k = lo_k2, hi_k2
    raise RuntimeError("kth_smallest did not converge — unreachable with "
                       "bit-space narrowing; please report")


def quantile_disc(ds: Dataset, col: str, q: float) -> float:
    """Discrete quantile with DuckDB ``quantile_disc`` index semantics
    (rank = ⌈q·n⌉ − 1), so the driver oracle matches exactly."""
    return quantiles_disc(ds, col, [q])[0]


def quantiles_disc(ds: Dataset, col: str, qs: list[float]) -> list[float]:
    """Several discrete quantiles with the row count (and the input
    materialization) shared across them — each selection still narrows
    independently."""
    ds = ds.materialize()  # consumed count + per-q passes
    n = ds.count()
    if n == 0:
        raise ValueError("empty dataset")
    return [kth_smallest(ds, col, max(0, math.ceil(q * n) - 1))
            for q in qs]
