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
