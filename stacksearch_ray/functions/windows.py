"""Per-key ordered window aggregates (SQL window-function analogs the
Dataset API lacks: SUM(...) OVER (PARTITION BY key ORDER BY ... ROWS
BETWEEN n PRECEDING AND CURRENT ROW) and the running total).

Scale shape: ONE hash shuffle — keys are bucketed by hash (the same
contract as sessionization in pipelines/documents.py), and each bucket
sorts once and computes the window sums for ALL its keys vectorized
(cumsum with group-boundary resets), so per-group scheduling cost is
O(buckets), not O(keys). No global sort, no per-key Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..micros import to_micros


def grouped_running_sums(ds: Dataset, by: str, order: list[str],
                         value_col: str, window: int,
                         num_buckets: int = 32) -> Dataset:
    """For each row: the running total of ``value_col`` over all rows of
    the same ``by`` key at-or-before it in ``order``, and the trailing
    sum over the last ``window`` rows (current row inclusive) —
    ``cum_<value_col>`` / ``roll<window>_<value_col>``. All other input
    columns ride along unchanged.

    ``order`` must make rows unique within a key (e.g. [ts, event_id])
    — otherwise "at-or-before" is ambiguous and results depend on sort
    stability. Values must be int64 (the micros convention); sums stay
    exact in int64.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    cum_col = f"cum_{value_col}"
    roll_col = f"roll{window}_{value_col}"

    def tag(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by].combine_chunks()).astype(np.int64)
        h = pd.util.hash_array(keys)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([by] + order, kind="mergesort")
             .reset_index(drop=True))
        key = g[by].to_numpy()
        v = g[value_col].to_numpy().astype(np.int64)
        n = len(g)
        first = np.concatenate(([True], key[1:] != key[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        cs = np.cumsum(v)
        base = np.repeat(cs[starts] - v[starts], counts)
        cum = cs - base
        pos = np.arange(n) - np.repeat(starts, counts)
        prev = np.where(pos >= window,
                        cum[np.maximum(np.arange(n) - window, 0)], 0)
        g[cum_col] = cum
        g[roll_col] = cum - prev
        return g

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(win, batch_format="pandas"))


def keyed_offsets(counts: Dataset, key_col: str, value_col: str,
                  bucket_size: int = 4096) -> Dataset:
    """Distributed EXCLUSIVE prefix sum over key order: (key, n) →
    (key, offset) with offset = Σ n over all strictly-smaller keys —
    the primitive behind sequence packing and global position
    assignment.

    Scale shape: RANGE-bucket by ``key // bucket_size`` (order must be
    preserved across buckets, so hash bucketing is wrong here);
    per-bucket totals reduce to one tiny driver table (one row per
    bucket — O(keys / bucket_size), the only driver state), whose
    cumulative sums broadcast back as per-bucket bases; each bucket
    then computes its interior exclusive cumsum vectorized. Two small
    shuffles, no global sort of the data.
    """
    import ray

    def tag(t: pa.Table) -> pa.Table:
        k = np.asarray(t[key_col].combine_chunks()).astype(np.int64)
        return pa.table({
            key_col: pa.array(k, pa.int64()),
            value_col: t[value_col].combine_chunks().cast(pa.int64()),
            "__bucket": pa.array(k // bucket_size, pa.int64()),
        })

    tagged = counts.map_batches(tag, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Sum as _Sum

    totals = (tagged.groupby("__bucket")
              .aggregate(_Sum(value_col, alias_name="tot"))
              .to_pandas().sort_values("__bucket"))
    base = np.concatenate(([0], np.cumsum(totals["tot"].to_numpy())[:-1]))
    base_map = dict(zip(totals["__bucket"].to_numpy().tolist(),
                        base.tolist()))
    base_ref = ray.put(base_map)

    def interior(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        v = g[value_col].to_numpy()
        excl = np.concatenate(([0], np.cumsum(v)[:-1]))
        b = ray.get(base_ref)[int(g["__bucket"].iloc[0])]
        return pd.DataFrame({key_col: g[key_col].to_numpy(),
                             "offset": (excl + b).astype(np.int64)})

    return (tagged.groupby("__bucket")
            .map_groups(interior, batch_format="pandas"))


def grouped_ranks(ds: Dataset, by: str, rank_cols: list[str],
                  tiebreak: list[str], ntiles: int = 4,
                  num_buckets: int = 32) -> Dataset:
    """The SQL rank family per ``by`` partition, all six in one pass:

    - ``row_number`` / ``ntile{n}``: over the fully deterministic order
      ``rank_cols + tiebreak`` (SQL ``ORDER BY v, id``).
    - ``rank`` / ``dense_rank`` / ``percent_rank_micros`` /
      ``cume_dist_micros``: over ``rank_cols`` alone, so ties in the
      ranking value share a rank exactly as SQL does.

    ``tiebreak`` must make rows unique within a key. percent_rank =
    (rank-1)/(count-1) (0 for singleton groups); cume_dist = rows with
    value ≤ current / count — both shipped as *_micros int64.

    Scale shape: same as the other window ops — one hash-bucket
    shuffle, then every key in a bucket is ranked vectorized off ONE
    mergesort (cumsum/segment algebra over group and tie-run
    boundaries); per-key cost is O(1) numpy, not a Python loop.
    Output keeps ``by`` + ``tiebreak`` + the rank columns.
    """
    if ntiles < 1:
        raise ValueError("ntiles must be >= 1")

    def tag(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by].combine_chunks()).astype(np.int64)
        h = pd.util.hash_array(keys)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    ntile_col = f"ntile{ntiles}"

    def ranks(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([by] + rank_cols + tiebreak, kind="mergesort")
             .reset_index(drop=True))
        key = g[by].to_numpy()
        n = len(g)
        idx = np.arange(n)
        first = np.concatenate(([True], key[1:] != key[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        gstart = np.repeat(starts, counts)
        gcount = np.repeat(counts, counts)
        pos = idx - gstart                       # 0-based row in group
        # tie runs: a new run wherever any rank col changes (or new key)
        run_start = first.copy()
        for c in rank_cols:
            v = g[c].to_numpy()
            run_start[1:] |= v[1:] != v[:-1]
        rs = np.where(run_start, idx, 0)
        run_first = np.maximum.accumulate(rs)    # index of my run's start
        rank = run_first - gstart + 1
        rid = np.cumsum(run_start)               # global run id (1-based)
        dense = rid - np.repeat(rid[starts] - 1, counts)
        # run END index: first index of the NEXT run, minus one
        run_starts_idx = np.flatnonzero(run_start)
        run_len = np.diff(np.append(run_starts_idx, n))
        run_last = np.repeat(run_starts_idx + run_len - 1, run_len)
        denom = np.maximum(gcount - 1, 1)
        pct = np.where(gcount > 1, (rank - 1) / denom, 0.0)
        cume = (run_last - gstart + 1) / gcount
        # SQL ntile: the first (count % n) tiles get ceil(count/n) rows
        q, r = np.divmod(gcount, ntiles)
        big = (q + 1) * r                        # rows in the big tiles
        in_big = pos < big
        qq = np.maximum(q, 1)                    # count < ntiles → q=0
        tile = np.where(in_big, pos // np.maximum(q + 1, 1),
                        r + (pos - big) // qq) + 1
        out = g[[by] + tiebreak].copy()
        out["row_number"] = pos + 1
        out["rank"] = rank
        out["dense_rank"] = dense
        out[ntile_col] = tile.astype(np.int64)
        out["percent_rank_micros"] = to_micros(pct)
        out["cume_dist_micros"] = to_micros(cume)
        return out

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(ranks, batch_format="pandas"))


def grouped_range_window(ds: Dataset, by: str, ts_col: str,
                         value_col: str, window: int,
                         num_buckets: int = 32) -> Dataset:
    """Event-time sliding window: per key, the sum and count of rows
    whose timestamp lies in ``[t - window, t]`` for each row at time t
    — SQL ``RANGE BETWEEN window PRECEDING AND CURRENT ROW``,
    INCLUDING equal-timestamp peers that sort later (SQL RANGE peer
    semantics; a ROWS frame cuts ties, RANGE doesn't).

    One hash-bucket shuffle; inside each bucket every key is solved by
    ONE pair of global searchsorted calls: keys are offset into
    disjoint time ranges (ts normalized to the bucket min, each group
    shifted by group_index · (span + window + 2)), so per-key windows
    cannot cross groups and no per-key loop exists. Output columns:
    ``win_sum_<value_col>`` / ``win_n``.
    """
    if window < 0:
        raise ValueError("window must be >= 0")
    sum_col = f"win_sum_{value_col}"

    def tag(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by].combine_chunks()).astype(np.int64)
        h = pd.util.hash_array(keys)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([by, ts_col], kind="mergesort")
             .reset_index(drop=True))
        key = g[by].to_numpy()
        ts = g[ts_col].to_numpy().astype(np.int64)
        v = g[value_col].to_numpy().astype(np.int64)
        n = len(g)
        first = np.concatenate(([True], key[1:] != key[:-1]))
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, n))
        gidx = np.repeat(np.arange(len(starts)), counts)
        t0 = ts.min()
        span = int(ts.max()) - int(t0) + window + 2
        adj = (ts - t0) + gidx * span
        left = np.searchsorted(adj, adj - window, side="left")
        right = np.searchsorted(adj, adj, side="right")
        cs = np.cumsum(v)
        cn = np.arange(1, n + 1)
        base_s = np.where(left > 0, cs[left - 1], 0)
        base_n = np.where(left > 0, cn[left - 1], 0)
        g[sum_col] = cs[right - 1] - base_s
        g["win_n"] = (cn[right - 1] - base_n).astype(np.int64)
        return g

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(win, batch_format="pandas"))


def grouped_shift(ds: Dataset, by: str, order: list[str], value_col: str,
                  periods: int = 1, num_buckets: int = 32) -> Dataset:
    """Per-key LAG/LEAD: for each row, the value of ``value_col``
    ``periods`` rows earlier (positive) or later (negative) within the
    same ``by`` key in ``order`` — SQL ``LAG(v, n) OVER (PARTITION BY
    key ORDER BY ...)``. NULL where the shifted row falls outside the
    key (as in SQL). Same scale shape as grouped_running_sums: one
    hash-bucket shuffle, each bucket sorts once and shifts ALL its keys
    vectorized. Output column: ``lag_<value_col>`` / ``lead_<value_col>``.
    """
    if periods == 0:
        raise ValueError("periods must be nonzero")
    out_col = (f"lag_{value_col}" if periods > 0 else f"lead_{value_col}")

    def tag(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[by].combine_chunks()).astype(np.int64)
        h = pd.util.hash_array(keys)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def shift(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns="__bucket")
             .sort_values([by] + order, kind="mergesort")
             .reset_index(drop=True))
        key = g[by].to_numpy()
        v = g[value_col].to_numpy()
        n = len(g)
        idx = np.arange(n) - periods
        ok = (idx >= 0) & (idx < n)
        same = np.zeros(n, dtype=bool)
        same[ok] = key[np.clip(idx, 0, n - 1)][ok] == key[ok]
        out = pd.array(np.where(same, v[np.clip(idx, 0, n - 1)], 0),
                       dtype="Int64")
        out[~same] = pd.NA
        g[out_col] = out
        return g

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(shift, batch_format="pandas"))
