"""Distributed set operations (SQL INTERSECT / EXCEPT over a key
column) via indicator combiners: each side emits per-batch DISTINCT
keys with a side-indicator, one groupby sums the indicators, and the
predicate picks the membership class. The shuffle carries at most one
row per distinct key per batch per side — never the raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def _tagged(ds: Dataset, col: str, a_val: int, b_val: int) -> Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[col].combine_chunks().unique()
        n = len(keys)
        return pa.table({
            col: keys,
            "__a": pa.array(np.full(n, a_val, np.int64)),
            "__b": pa.array(np.full(n, b_val, np.int64)),
        })

    return ds.map_batches(tag, batch_format="pyarrow")


def _combine(a: Dataset, b: Dataset, col: str) -> Dataset:
    return (_tagged(a, col, 1, 0).union(_tagged(b, col, 0, 1))
            .groupby(col).aggregate(Sum("__a", alias_name="__a"),
                                    Sum("__b", alias_name="__b")))


def _pick(ds: Dataset, col: str, pred) -> Dataset:
    def fin(t: pa.Table) -> pa.Table:
        m = pred(t)
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        return pa.table({col: t[col].combine_chunks().filter(m)})

    return ds.map_batches(fin, batch_format="pyarrow")


def intersect_distinct(a: Dataset, b: Dataset, col: str) -> Dataset:
    """Distinct keys present in BOTH a and b (SQL INTERSECT)."""
    return _pick(_combine(a, b, col), col,
                 lambda t: pc.and_(pc.greater(t["__a"], 0),
                                   pc.greater(t["__b"], 0)))


def except_distinct(a: Dataset, b: Dataset, col: str) -> Dataset:
    """Distinct keys present in a but NOT in b (SQL EXCEPT)."""
    return _pick(_combine(a, b, col), col,
                 lambda t: pc.and_(pc.greater(t["__a"], 0),
                                   pc.equal(t["__b"], 0)))
