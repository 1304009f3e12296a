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


def grouped_quantile_disc(ds: Dataset, group_col: str, col: str,
                          q: float, bins: int = 256,
                          exact_threshold: int = 100_000) -> "pa.Table":
    """EXACT per-group discrete quantile (DuckDB ``quantile_disc``
    rank = ⌈q·n⌉ − 1) WITHOUT a per-group sort: every group narrows its
    own float-bit bracket simultaneously, so each pass is ONE stream
    over the data emitting (group, bin) count partials and one small
    groupby — total passes ≤ ⌈64/log₂(bins)⌉ + 1 regardless of group
    count or skew. Driver state is O(groups) scalars (brackets +
    residual ranks), never values. Groups whose bracket population
    drops below ``exact_threshold`` resolve in one final filtered pull
    (all such groups share the pass). NaNs unsupported (filter
    upstream); group keys must be non-null.
    """
    import pandas as pd
    from ray.data.aggregate import Sum as _Sum

    ds = ds.materialize()

    # pass 0: per-group row counts (map-side combined)
    def gcounts(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[group_col].to_pandas())
        vc = s.value_counts()
        return pa.table({group_col: pa.array(vc.index.to_numpy()),
                         "cnt": pa.array(vc.to_numpy(), pa.int64())})

    gdf = (ds.map_batches(gcounts, batch_format="pyarrow")
           .groupby(group_col).aggregate(_Sum("cnt", alias_name="cnt"))
           .to_pandas())
    groups = gdf[group_col].to_numpy()
    counts = gdf["cnt"].to_numpy().astype(np.int64)
    G = len(groups)
    lo = np.zeros(G, dtype=np.uint64)
    hi = np.full(G, (1 << 64) - 1, dtype=np.uint64)
    k = np.maximum(0, np.ceil(q * counts).astype(np.int64) - 1)
    resolved = np.full(G, np.nan)
    active = np.ones(G, dtype=bool)
    pull = np.zeros(G, dtype=bool)
    gidx = {g: i for i, g in enumerate(groups)}

    max_passes = math.ceil(64 / math.log2(bins)) + 2
    for _ in range(max_passes):
        if not active.any():
            break
        span = hi - lo + np.uint64(1)  # wraps to 0 on the full-space pass
        full = span == np.uint64(0)
        scale = np.where(
            full, np.uint64((1 << 64) // bins),
            (span + np.uint64(bins - 1)) // np.uint64(bins))
        lo_c, hi_c, sc_c, act_c = lo.copy(), hi.copy(), scale.copy(), active.copy()

        def hist(batch: pa.Table, lo=lo_c, hi=hi_c, sc=sc_c,
                 act=act_c) -> pa.Table:
            gi = (pd.Series(batch[group_col].to_pandas()).map(gidx)
                  .to_numpy())
            keys = _float_keys(
                np.asarray(batch[col].combine_chunks().cast(pa.float64())))
            gi = gi.astype(np.int64)
            m = act[gi] & (keys >= lo[gi]) & (keys <= hi[gi])
            if not m.any():
                return pa.table({"gb": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            gi, keys = gi[m], keys[m]
            b = ((keys - lo[gi]) // sc[gi]).astype(np.int64)
            gb = gi * bins + np.minimum(b, bins - 1)
            bc = np.bincount(gb, minlength=1)
            nz = np.flatnonzero(bc)
            return pa.table({"gb": nz.astype(np.int64),
                             "cnt": bc[nz].astype(np.int64)})

        hdf = (ds.map_batches(hist, batch_format="pyarrow")
               .groupby("gb").aggregate(_Sum("cnt", alias_name="cnt"))
               .to_pandas())
        gb = hdf["gb"].to_numpy().astype(np.int64)
        cnt = hdf["cnt"].to_numpy().astype(np.int64)
        order = np.argsort(gb, kind="stable")
        gb, cnt = gb[order], cnt[order]
        g_of = gb // bins
        for gi_i in np.flatnonzero(active):
            sel = g_of == gi_i
            if not sel.any():
                # empty bracket can only mean k out of range — impossible
                # after pass 0 counted inside the bracket
                active[gi_i] = False
                continue
            bb, cc = gb[sel] % bins, cnt[sel]
            cum = np.concatenate(([0], np.cumsum(cc)))
            pos = int(np.searchsorted(cum, k[gi_i], side="right")) - 1
            j = int(bb[pos])
            k[gi_i] -= int(cum[pos])
            sc_i = int(scale[gi_i])
            lo2 = int(lo[gi_i]) + j * sc_i
            hi2 = min(int(hi[gi_i]), int(lo[gi_i]) + (j + 1) * sc_i - 1)
            if sc_i == 1 or lo2 == hi2:
                resolved[gi_i] = _key_to_float(lo2)
                active[gi_i] = False
                continue
            lo[gi_i], hi[gi_i] = np.uint64(lo2), np.uint64(hi2)
            if int(cc[pos]) <= exact_threshold:
                active[gi_i] = False
                pull[gi_i] = True

    if active.any():
        raise RuntimeError("grouped_quantile_disc did not converge — "
                           "unreachable with bit-space narrowing")
    if pull.any():
        lo_c, hi_c, pull_c = lo.copy(), hi.copy(), pull.copy()

        def pull_vals(batch: pa.Table, lo=lo_c, hi=hi_c,
                      pl=pull_c) -> pa.Table:
            gi = (pd.Series(batch[group_col].to_pandas()).map(gidx)
                  .to_numpy().astype(np.int64))
            v = np.asarray(batch[col].combine_chunks().cast(pa.float64()))
            keys = _float_keys(v)
            m = pl[gi] & (keys >= lo[gi]) & (keys <= hi[gi])
            return pa.table({"gi": pa.array(gi[m], pa.int64()),
                             "v": pa.array(v[m], pa.float64())})

        pdf = (ds.map_batches(pull_vals, batch_format="pyarrow")
               .to_pandas())
        for gi_i in np.flatnonzero(pull):
            vals = pdf.loc[pdf["gi"] == gi_i, "v"].to_numpy()
            resolved[gi_i] = float(np.partition(vals, k[gi_i])[k[gi_i]])

    return pa.table({group_col: pa.array(groups),
                     "value": pa.array(resolved, pa.float64())})


def quantile_disc(ds: Dataset, col: str, q: float) -> float:
    """Discrete quantile with DuckDB ``quantile_disc`` index semantics
    (rank = ⌈q·n⌉ − 1), so the driver oracle matches exactly."""
    return quantiles_disc(ds, col, [q])[0]


def quantiles_cont(ds: Dataset, col: str, qs: list[float]) -> list[float]:
    """Interpolated (continuous) quantiles with DuckDB ``quantile_cont``
    semantics: h = q·(n−1); result = v[⌊h⌋] + (h−⌊h⌋)·(v[⌈h⌉]−v[⌊h⌋]).
    Two kth-selections per quantile (shared materialization), same
    histogram-narrowing machinery — still no sort, no data shuffle."""
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        raise ValueError("empty dataset")
    out = []
    for q in qs:
        h = q * (n - 1)
        lo_i = math.floor(h)
        hi_i = min(n - 1, lo_i + 1)
        v_lo = kth_smallest(ds, col, lo_i)
        if hi_i == lo_i or h == lo_i:
            out.append(v_lo)
            continue
        v_hi = kth_smallest(ds, col, hi_i)
        out.append(v_lo + (h - lo_i) * (v_hi - v_lo))
    return out


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


def quantile_sketch(ds: Dataset, col: str, qs: list[float],
                    bits: int = 16) -> list[tuple[float, int]]:
    """ONE-pass mergeable approximate quantiles — the streaming
    alternative to the exact multi-pass narrowing above when a bounded
    rank error is acceptable (monitoring, partition planning, skew
    probes at 100 TB).

    Sketch = a 2^bits-bucket histogram over the monotone float-bit
    keyspace, plus the MIN observed key per bucket. Partials are
    (bucket, count, min_key) rows — pure sums/mins, so they merge
    associatively across any number of batches/nodes; the reduced
    sketch is at most 2^bits rows (bucket-count-bound, not data-bound).
    For each q the answer is the min key of the bucket containing the
    target rank — an ACTUAL data value whose rank error is < that
    bucket's count (returned alongside, so callers can assert their
    tolerance). Deterministic: no sampling, no randomness.
    """
    from ray.data.aggregate import Min

    shift = np.uint64(64 - bits)

    def hist(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[col].combine_chunks(), dtype=np.float64)
        keys = _float_keys(v)
        b = (keys >> shift).astype(np.int64)
        order = np.lexsort((keys, b))  # key-sorted within bucket
        bs, ks = b[order], keys[order]
        first = np.concatenate(([True], bs[1:] != bs[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(bs)))
        # int64 view of uint64 keys keeps Min order: bucket fixes the
        # top bits, so all keys in a bucket share the sign bit
        return pa.table({
            "bucket": pa.array(bs[starts], pa.int64()),
            "cnt": pa.array(counts, pa.int64()),
            "min_key": pa.array(ks[starts].view(np.int64), pa.int64()),
        })

    agg = (ds.map_batches(hist, batch_format="pyarrow")
           .groupby("bucket")
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Min("min_key", alias_name="min_key"))
           .to_pandas().sort_values("bucket"))
    counts = agg["cnt"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out: list[tuple[float, int]] = []
    for q in qs:
        r = max(0, math.ceil(q * n) - 1)
        i = int(np.searchsorted(cum, r + 1))
        key = np.int64(agg["min_key"].to_numpy()[i]).view(np.uint64)
        out.append((_key_to_float(int(key)), int(counts[i])))
    return out


def kmeans_1d(values: "np.ndarray", k: int, iters: int = 4
              ) -> "np.ndarray":
    """Deterministic 1-D Lloyd's for adaptive histograms (the ES
    ``variable_width_histogram`` primitive): QUANTILE-POSITION init
    (evenly spaced picks from the sorted values — data-scaled, no
    random init to get absorbed by out-of-scale data), argmin |v−c|
    assignment with first-min tie-break, exact integer-sum mean
    updates (inputs are int64 micros), empty clusters keep their
    centroid. Returns k float64 centroids in ascending order (1-D
    Lloyd's preserves the order of an ascending init)."""
    import numpy as np

    v = np.sort(np.asarray(values, dtype=np.int64)).astype(np.float64)
    if len(v) == 0:
        raise ValueError("kmeans_1d needs at least one value")
    idx = (np.arange(k, dtype=np.int64) * (len(v) - 1)) // max(k - 1, 1)
    c = v[idx].copy()
    for _ in range(iters):
        a = np.argmin(np.abs(v[:, None] - c[None, :]), axis=1)
        sums = np.zeros(k, np.int64)
        np.add.at(sums, a, v.astype(np.int64))
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        c = c.copy()
        c[nz] = sums[nz] / counts[nz]
    return c
