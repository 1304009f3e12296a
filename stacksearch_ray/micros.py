"""THE float→int64 micros convention, shared by every driver entry and
every DuckDB oracle: ``floor(x * 1e6 + 0.5)`` — round-half-up toward
+inf, applied per row BEFORE any aggregation (round-then-sum).

Why a single convention: ``np.round``/``pc.round`` default to
half-to-even while DuckDB ``round()`` is half-away-from-zero — they
disagree whenever a value lands exactly on a .5 micro boundary, which is
a data-dependent conformance-hash failure. ``floor(x + 0.5)`` is
sign-independent and bit-identical across numpy, Arrow, and DuckDB
(same double multiply, add, floor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def to_micros(x) -> "np.ndarray | int":
    """Float scalar or array → int64 micros via floor(x*1e6 + 0.5)."""
    a = np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5)
    return a.astype(np.int64) if a.ndim else int(a)


def pc_micros(arr) -> pa.Array:
    """Arrow float array/chunked → int64 micros (same expression)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    x = pc.add(pc.multiply(arr.cast(pa.float64()), 1e6), 0.5)
    return pc.floor(x).cast(pa.int64())


def sql_micros(expr: str) -> str:
    """The matching DuckDB expression for a float-valued SQL expr."""
    return f"CAST(floor(({expr}) * 1e6 + 0.5) AS BIGINT)"
