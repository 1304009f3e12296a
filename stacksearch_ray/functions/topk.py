"""Grouped top-k with map-side partial heaps (pre-aggregation pattern).

A naive ``groupby(g).map_groups(top_k)`` shuffles EVERY row. This
version cuts each batch down to its per-group top-k first (vectorized
lexsort + group-boundary slice), so the shuffle moves at most
``k × groups_per_batch`` rows per batch — the same partial-then-final
shape as the sketch and Sum pre-aggregations (SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def topk_desc_tiebreak(ids: np.ndarray, scores: np.ndarray,
                       k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, id asc) — EXACT under ties.
    argpartition does the heavy cut in O(n); the boundary tie set is
    widened before the final lexsort so a tied smaller-id row can never
    be dropped by the partial select (full lexsort only below 4k rows)."""
    kk = min(k, len(ids))
    if kk == 0:
        return np.empty(0, dtype=np.int64)
    if len(ids) > 4 * k:
        part = np.argpartition(-scores, kk - 1)[:kk]
        thresh = scores[part].min()
        keep = np.flatnonzero(scores >= thresh)
        return keep[np.lexsort((ids[keep], -scores[keep]))[:kk]]
    return np.lexsort((ids, -scores))[:kk]


def _partial_topk(batch: pa.Table, group_col: str, sort_col: str, k: int,
                  descending: bool, tie_col: str) -> pa.Table:
    df = batch.to_pandas()
    df = df.sort_values([group_col, sort_col, tie_col],
                        ascending=[True, not descending, True],
                        kind="mergesort")
    return pa.Table.from_pandas(df.groupby(group_col, sort=False).head(k),
                                preserve_index=False)


def grouped_topk(ds: Dataset, group_col: str, sort_col: str, k: int,
                 descending: bool = True, tie_col: str | None = None) -> Dataset:
    """Top-k rows per group by ``sort_col`` (desc by default), tie-broken
    by ``tie_col`` asc. Adds a ``rank`` column (1-based) per group."""
    tie = tie_col or sort_col

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_topk(batch, group_col, sort_col, k, descending, tie)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([sort_col, tie], ascending=[not descending, True],
                           kind="mergesort")
             .head(k).reset_index(drop=True))
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final, batch_format="pandas"))
