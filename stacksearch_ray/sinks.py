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
    consume. One part file per map batch, serialized with pandas
    ``to_json(lines=True)`` (C serializer, no per-row Python) and
    committed tmp→rename so readers never see partial files. Streams
    with backpressure (the driver only sums per-task row counts).
    Round-trips through ``ray.data.read_json``. Returns rows written.

    Part names are DETERMINISTIC — derived from the serialized batch
    content — so a Ray task retry after its rename committed rewrites
    the same file instead of leaving a duplicate part that read_json
    would double-count (the uuid-named variant had that bug). Blocks
    are deterministic under retry, so the re-executed batch hashes to
    the same name. Caveat: two byte-identical batches coalesce into one
    part; any dataset with a unique id column can't produce that."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def dump(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        import uuid

        payload = df.to_json(orient="records", lines=True,
                             force_ascii=False)
        name = hashlib.sha256(payload.encode()).hexdigest()[:24]
        path = os.path.join(out_dir, f"part-{name}-{len(df)}.jsonl")
        # tmp name stays unique per attempt: two concurrent attempts at
        # the same batch must not interleave writes into one tmp file
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
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
