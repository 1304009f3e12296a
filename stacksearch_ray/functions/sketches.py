"""Mergeable sketches: HyperLogLog approximate distinct counting.

The canonical pre-aggregation pattern for wide counts at scale: each
``map_batches`` call emits ONE serialized sketch row per batch (registers
are an order-insensitive max — perfectly mergeable), the reduce merges a
handful of tiny rows, and no (value → count) shuffle ever happens.
Standard public HLL algorithm (Flajolet et al. 2007) with linear-counting
small-range correction; register maximum/merge fully NumPy-vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


class HLL:
    """HyperLogLog with 2^p registers (p=12 → ~1.6% standard error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> "HLL":
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = position of first set bit in the remaining 64-p bits + 1
        rank = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        found = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            hit = (~found) & ((cur & mask) != 0)
            rank[hit] = r
            found |= hit
            if found.all():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def _hash_column(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if pa.types.is_integer(arr.type):
        return pd.util.hash_array(np.asarray(arr).astype(np.int64))
    return pd.util.hash_array(np.asarray(arr.to_pylist(), dtype=object))


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Approximate count-distinct of ``col``: one HLL row per batch, tiny
    driver merge. Error ~1.04/sqrt(2^p) (~1.6% at p=12)."""
    def sketch(batch: pa.Table) -> pa.Table:
        h = HLL(p).add_hashes(_hash_column(batch, col))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc.merge(HLL.from_bytes(row["sketch"], p))
    return acc.estimate()


def approx_distinct_tokens(ds: Dataset, text_col: str = "text",
                           p: int = 12) -> float:
    """Approximate distinct-term count over tokenized text (the vocabulary
    size of a corpus without a term shuffle)."""
    from ..text import tokenize_array

    def sketch(batch: pa.Table) -> pa.Table:
        flat, _, _ = tokenize_array(batch[text_col].combine_chunks())
        h = HLL(p)
        if len(flat):
            h.add_hashes(pd.util.hash_array(
                np.asarray(flat.to_pylist(), dtype=object)))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HLL(p)
    for row in parts:
        acc.merge(HLL.from_bytes(row["sketch"], p))
    return acc.estimate()
