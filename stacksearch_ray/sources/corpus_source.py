"""Bounded-range parquet source (SURVEY.md §2.1 S1/S2).

The reference's XmlParser takes ``parseRange=[min,max)`` and skips /
early-stops the stream (/root/reference/dataprocess/parser.py:10-17,
71-89), and train/test splits are disjoint row ranges (hparams.py:12-14).

Ours prunes at the FILE level first (parquet footer row counts — no data
read for fully-skipped files), then slices the boundary files exactly, so
a range read of rows [a, b) touches only the files overlapping it. The
train/test split helper returns two range sources over the same corpus.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

import ray.data as rd
from ray.data import Dataset


def _files_with_counts(source: str | list[str]) -> list[tuple[str, int]]:
    if isinstance(source, str):
        if os.path.isfile(source):
            files = [source]
        else:
            files = sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(source) for f in fs
                if f.endswith(".parquet"))
    else:
        files = sorted(source)
    return [(f, pq.read_metadata(f).num_rows) for f in files]


def read_corpus_range(source: str | list[str], start: int, stop: int,
                      columns: list[str] | None = None) -> Dataset:
    """Rows [start, stop) in file order. Fully-contained files stream
    through ``read_parquet`` untouched; boundary files are sliced exactly
    (small reads on the driver)."""
    whole_files: list[str] = []
    boundary: list[tuple[str, int, int]] = []  # (file, offset, length)
    pos = 0
    for f, n in _files_with_counts(source):
        lo, hi = max(start, pos), min(stop, pos + n)
        if lo < hi:
            if lo == pos and hi == pos + n:
                whole_files.append(f)
            else:
                boundary.append((f, lo - pos, hi - lo))
        pos += n
        if pos >= stop:
            break
    parts = []
    if whole_files:
        parts.append(rd.read_parquet(whole_files, columns=columns))
    for f, off, length in boundary:
        t = pq.read_table(f, columns=columns).slice(off, length)
        parts.append(rd.from_arrow(t))
    if not parts:
        import pyarrow as pa

        return rd.from_arrow(pa.table({}))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


from ..registry import register_source

register_source("parquet_range")(read_corpus_range)


def train_test_split(source: str | list[str], train_rows: int,
                     columns: list[str] | None = None
                     ) -> tuple[Dataset, Dataset]:
    """Disjoint row-range split (reference hparams.py:12-14 semantics):
    train = rows [0, train_rows), test = the rest."""
    total = sum(n for _, n in _files_with_counts(source))
    return (read_corpus_range(source, 0, train_rows, columns),
            read_corpus_range(source, train_rows, total, columns))
