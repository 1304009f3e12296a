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

from ray.data import Dataset


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
