"""Sinks beyond write_parquet (SURVEY.md §2.1 K1).

``export_projector_tsv`` is the analog of the reference's
embedding-projector export (vecs.tsv + meta.tsv written row-aligned,
/root/reference/main.py:41-64,92-131, results.py:62-84): vectors
tab-separated in one file, metadata (id + text fields) in the other.
Streams via iter_batches — bounded driver memory; for very large
exports prefer partitioned ``ds.write_csv``.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Iterable

from ray.data import Dataset


def write_partitioned(ds: Dataset, out_dir: str,
                      partition_cols: list[str]) -> None:
    """Hive-partitioned parquet (one directory per key value) — the
    output layout a 100 TB run wants: downstream readers prune whole
    directories, and failed runs re-drive only the affected keys."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)


def write_partitioned_resumable(make_ds: Callable[[object], Dataset],
                                out_dir: str, partitions: Iterable,
                                partition_key: str = "part") -> dict:
    """Unit-resumable sink: one subdirectory per logical partition with a
    ``_DONE`` marker written AFTER the partition's parquet lands; a
    re-run skips finished partitions and rewrites half-finished ones
    from scratch (marker absent ⇒ debris removed first). ``make_ds(p)``
    builds the partition's Dataset lazily (e.g. a filtered read), so
    skipped partitions cost nothing. Returns {written, skipped}."""
    written, skipped = [], []
    for p in partitions:
        pdir = os.path.join(out_dir, f"{partition_key}={p}")
        marker = os.path.join(pdir, "_DONE")
        if os.path.exists(marker):
            skipped.append(p)
            continue
        shutil.rmtree(pdir, ignore_errors=True)
        make_ds(p).write_parquet(pdir)
        with open(marker, "w") as f:
            f.write("ok")
        written.append(p)
    return {"written": written, "skipped": skipped}


def write_jsonl(ds: Dataset, out_dir: str, batch_size: int = 8192) -> int:
    """Sharded JSONL sink — the interchange format LLM-training loaders
    consume. One ``part-<uuid>.jsonl`` per map task, serialized with
    pandas ``to_json(lines=True)`` (C serializer, no per-row Python) and
    committed tmp→rename so readers never see partial files. Streams
    with backpressure (the driver only sums per-task row counts).
    Round-trips through ``ray.data.read_json``. Returns rows written."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import uuid

        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl")
        tmp = path + ".tmp"
        df.to_json(tmp, orient="records", lines=True, force_ascii=False)
        os.replace(tmp, path)
        return pd.DataFrame({"rows": [len(df)]})

    n = (ds.map_batches(dump, batch_format="pandas", batch_size=batch_size)
         .sum("rows"))
    return int(n or 0)


def export_projector_tsv(ds: Dataset, out_dir: str, vec_col: str,
                         meta_cols: list[str],
                         batch_size: int = 4096) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    vecs_path = os.path.join(out_dir, "vecs.tsv")
    meta_path = os.path.join(out_dir, "meta.tsv")
    with open(vecs_path, "w") as vf, open(meta_path, "w") as mf:
        mf.write("\t".join(meta_cols) + "\n")
        for batch in ds.iter_batches(batch_size=batch_size,
                                     batch_format="pyarrow"):
            vecs = batch[vec_col].to_pylist()
            metas = [batch[c].to_pylist() for c in meta_cols]
            for i, v in enumerate(vecs):
                vf.write("\t".join(str(x) for x in v) + "\n")
                mf.write("\t".join(str(m[i]).replace("\t", " ").replace("\n", " ")
                                   for m in metas) + "\n")
    return vecs_path, meta_path
