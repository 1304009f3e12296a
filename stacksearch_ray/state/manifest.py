"""Build manifest: per-partition / per-shard checkpoints with lineage.

The distributed replacement for the reference's all-or-nothing
``erase_on_raised_exception`` + whole-index pickle
(/root/reference/index/hash_index.py:9-21, index/index.py:23-24,44-53):
every unit of work (input partition, index shard) records its inputs,
row counts, content-hash rollup and wall time; outputs are written
temp-then-rename so a unit is either absent or complete; a restarted
build skips units already marked done whose outputs exist.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class Manifest:
    VERSION = 1

    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "manifest.json")
        self.data: dict[str, Any] = {
            "version": self.VERSION,
            "created_at": time.time(),
            "config": {},
            "partitions": {},
            "shards": {},
            "phases": {},
        }

    @classmethod
    def load_or_create(cls, index_dir: str) -> "Manifest":
        m = cls(index_dir)
        if os.path.exists(m.path):
            with open(m.path) as f:
                m.data = json.load(f)
        return m

    def save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1)
        os.replace(tmp, self.path)

    # ---- units ----

    def partition_done(self, pid: str, outputs: list[str]) -> bool:
        rec = self.data["partitions"].get(pid)
        return bool(rec and rec.get("status") == "done"
                    and all(os.path.exists(o) for o in outputs))

    def mark_partition(self, pid: str, **lineage: Any) -> None:
        self.data["partitions"][pid] = {"status": "done",
                                        "finished_at": time.time(), **lineage}

    def shard_done(self, shard: int, outputs: list[str]) -> bool:
        rec = self.data["shards"].get(str(shard))
        return bool(rec and rec.get("status") == "done"
                    and all(os.path.exists(o) for o in outputs))

    def mark_shard(self, shard: int, **lineage: Any) -> None:
        self.data["shards"][str(shard)] = {"status": "done",
                                           "finished_at": time.time(), **lineage}

    def phase_done(self, name: str) -> bool:
        return self.data["phases"].get(name, {}).get("status") == "done"

    def mark_phase(self, name: str, **info: Any) -> None:
        self.data["phases"][name] = {"status": "done",
                                     "finished_at": time.time(), **info}


def atomic_write_parquet(table, final_path: str,
                         row_group_boundaries=None) -> None:
    """Write parquet temp-then-rename so outputs are all-or-nothing.

    ``row_group_boundaries``: optional sorted row offsets; one parquet row
    group is emitted per span so downstream predicate pushdown on the
    sort key prunes to exactly the matching groups (used to align staged
    postings row groups to shard boundaries — without this every shard
    task decompresses every partition's full postings)."""
    import pyarrow.parquet as pq

    from ..schema import segment_write_kwargs

    os.makedirs(os.path.dirname(final_path), exist_ok=True)
    tmp = final_path + ".tmp"
    # per-column codec policy (v4): position-blob columns write zstd
    kw = segment_write_kwargs(table.schema)
    if row_group_boundaries is None:
        pq.write_table(table, tmp, **kw)
    else:
        bounds = [0, *row_group_boundaries, table.num_rows]
        bounds = sorted({b for b in bounds if 0 <= b <= table.num_rows})
        with pq.ParquetWriter(tmp, table.schema, **kw) as w:
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                if hi > lo:
                    w.write_table(table.slice(lo, hi - lo))
    os.replace(tmp, final_path)
