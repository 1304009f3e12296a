"""Feature-extraction scalar ops (SURVEY.md §2.2 M10, §2.3 F1/F2).

Vectorized ports of the reference's feature kernels, kept because a
user of the reference may still want dense per-doc features alongside
the BM25 path:

- char_histogram: per-doc character-count histogram, dim 32
  (/root/reference/features/FeatureExtractors.py:28-41 semantics:
  counts of a-z plus digit/space/other buckets, normalized max→1).
- to_binary_threshold: float vec → {0,1} at 0.5
  (/root/reference/models/api.py:16-27).
- binary_expansion: float → fixed-width binary-digit vector
  (/root/reference/models/utils.py:7-33 shape).

All operate on Arrow batches; histogram is pure NumPy over the UTF-8
buffer (no per-char Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HIST_DIM = 32


def _byte_class_counts(content: pa.Array) -> np.ndarray:
    """(n_rows, 32) int64 byte-class counts, zero-copy from the Arrow
    large_binary buffers (no Python bytes objects in the hot path)."""
    n = len(content)
    flat = content.cast(pa.large_binary())
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int64)[
        flat.offset: flat.offset + n + 1]
    data = flat.buffers()[2]
    buf = (np.frombuffer(data, dtype=np.uint8)[offs[0]:offs[-1]]
           if data is not None and offs[-1] > offs[0]
           else np.zeros(0, dtype=np.uint8))
    lens = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    bucket = np.full(len(buf), 31, dtype=np.int64)  # other-high default
    lower = (buf | 0x20)
    is_alpha = (lower >= ord("a")) & (lower <= ord("z"))
    bucket[is_alpha] = (lower[is_alpha] - ord("a")).astype(np.int64)
    bucket[(buf >= ord("0")) & (buf <= ord("9"))] = 26
    bucket[buf == ord(" ")] = 27
    bucket[buf == ord("\n")] = 28
    bucket[(buf < 32) & (buf != ord("\n"))] = 29
    bucket[(buf >= 33) & (buf <= 47)] = 30
    hist = np.zeros((n, HIST_DIM), dtype=np.int64)
    if len(buf):
        np.add.at(hist, (doc_idx, bucket), 1)
    return hist


def char_histogram_batch(batch: pa.Table, text_col: str = "text",
                         id_col: str = "doc_id",
                         normalize: bool = True) -> pa.Table:
    """dim-32 char histogram per doc: 26 letter buckets (case-folded),
    1 digit, 1 space, 1 newline, 3 other-range buckets."""
    content = batch[text_col].combine_chunks().fill_null("")
    hist = _byte_class_counts(content).astype(np.float32)
    if normalize:
        m = hist.max(axis=1, keepdims=True)
        hist = np.divide(hist, np.maximum(m, 1.0))
    return pa.table({
        "doc_id": batch[id_col].combine_chunks(),
        "features": pa.FixedSizeListArray.from_arrays(
            pa.array(hist.reshape(-1), pa.float32()), HIST_DIM),
    })


def char_histogram_long_batch(batch: pa.Table, text_col: str = "text",
                              id_col: str = "doc_id") -> pa.Table:
    """Long-format raw counts (doc_id, bucket, cnt), nonzero buckets only
    — the SQL-oracleable projection of char_histogram_batch (byte==char
    on ASCII corpora, which the DuckDB oracle's char classification
    assumes; non-ASCII bytes all land in bucket 31 engine-side while the
    oracle classifies codepoints)."""
    content = batch[text_col].combine_chunks().fill_null("")
    hist = _byte_class_counts(content)
    doc_ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
    ri, bi = np.nonzero(hist)
    return pa.table({
        "doc_id": pa.array(doc_ids[ri], pa.int64()),
        "bucket": pa.array(bi.astype(np.int64), pa.int64()),
        "cnt": pa.array(hist[ri, bi], pa.int64()),
    })


def to_binary_threshold(vec: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    """float array → {0,1} int8 at threshold (models/api.py:16-27)."""
    return (np.asarray(vec, dtype=np.float64) > threshold).astype(np.int8)


def binary_expansion(values: np.ndarray, bits: int = 8) -> np.ndarray:
    """Non-negative ints → (n, bits) binary-digit matrix, MSB first
    (models/utils.py:7-33 shape)."""
    v = np.asarray(values, dtype=np.uint64)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    return ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int8)
