"""GROUP BY GROUPING SETS / CUBE over a pre-aggregated finest level.

Scale shape: the caller computes the finest (all-keys) aggregate with
ONE pass over the data (map-side partials + one shuffle) and
materializes it — it is distinct-key-combo-sized, tiny relative to the
input. Every coarser grouping set is then a re-aggregation of THAT
table, so a d-dimension CUBE costs one corpus scan + 2^d re-aggregations
of a small table, never 2^d scans. Rolled-up key columns carry
``all_token`` (both engines coalesce, so NULL-key ambiguity never
reaches the conformance hash compare).
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum


def cube_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """All 2^d subsets of ``keys`` (CUBE), finest first."""
    return [s for r in range(len(keys), -1, -1)
            for s in combinations(keys, r)]


def rollup_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """The d+1 prefix subsets of ``keys`` (ROLLUP), finest first."""
    return [tuple(keys[:r]) for r in range(len(keys), -1, -1)]


def grouping_sets(finest: Dataset, keys: Sequence[str],
                  value_cols: Sequence[str],
                  sets: Sequence[Sequence[str]],
                  all_token: str = "ALL") -> Dataset:
    """Expand ``finest`` — the materialized GROUP BY ``keys`` aggregate
    with summable int64 ``value_cols`` — into one block-union over
    ``sets``. Key columns must be strings (``all_token`` fills the
    rolled-up ones). Each set re-aggregates the finest table only.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    out_cols = keys + value_cols
    aggs = [Sum(c, alias_name=c) for c in value_cols]

    def fill_all(missing: list[str]):
        def add(t: pa.Table) -> pa.Table:
            for col in missing:
                t = t.append_column(
                    col, pa.array([all_token] * t.num_rows, pa.string()))
            return t.select(out_cols)
        return add

    pieces: list[Dataset] = []
    for s in sets:
        s = list(s)
        missing = [k for k in keys if k not in s]
        if not missing:
            pieces.append(finest.map_batches(
                lambda t: t.select(out_cols), batch_format="pyarrow"))
        elif s:
            pieces.append(finest.groupby(s).aggregate(*aggs).map_batches(
                fill_all(missing), batch_format="pyarrow"))
        else:
            tot = finest.aggregate(*aggs)
            row = {k: pa.array([all_token], pa.string()) for k in keys}
            row.update({c: pa.array([int(tot[c])], pa.int64())
                        for c in value_cols})
            pieces.append(rd.from_arrow(pa.table(row).select(out_cols)))
    out = pieces[0]
    return out.union(*pieces[1:]) if len(pieces) > 1 else out
