"""Incremental index append — beyond the reference (which can only
rebuild, /root/reference/index/index.py:62-76: insert→freeze→save).

New documents are tokenized and encoded into ADDITIONAL segment files in
the same segments/ directory; the query engine already merges multiple
segment rows per (term, shard) (df sums, postings union — doc sets are
disjoint by the collision check). stats.json and term_dict are refreshed
from the updated docs/segments tables.

Correctness subtlety: block-max upper bounds are encoded against the
avgdl at encode time. An append changes avgdl, so PRE-EXISTING segments'
stored bounds may no longer bound true scores — pruning scorers (wand /
bmax) would become unsound. Appended indexes therefore set
``stats["appended"] = true`` and the query engine routes every method to
the exact exhaustive scorer (which recomputes scores from tf + doc_len +
fresh global stats and is exact under any avgdl). A full rebuild clears
the flag and restores pruning eligibility.

QueryEngine instances hold stats/doclens/segment caches from load time —
re-instantiate engines (and sharded pools) after an append to see the
new documents.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray.data as rd

from .build import (
    IndexBuildConfig,
    SegmentEncoder,
    check_doc_id_collisions,
    make_docs_meta_fn,
    make_postings_fn,
)


def append_to_index(source, index_dir: str,
                    cfg: IndexBuildConfig | None = None,
                    content_col: str | None = None, id_col: str | None = None,
                    **cfg_overrides) -> dict:
    """Append ``source`` documents to an existing index. Returns updated
    stats. New doc ids must be disjoint from existing ones (checked)."""
    from .build import load_stats

    prev = load_stats(index_dir)
    cfg = cfg or IndexBuildConfig()
    if content_col is not None:
        cfg.content_col = content_col
    if id_col is not None:
        cfg.id_col = id_col
    for k, v in cfg_overrides.items():
        setattr(cfg, k, v)
    # shard layout must match the existing index
    cfg.num_shards = int(prev["num_shards"])
    cfg.block_size = int(prev["block_size"])
    cfg.k1, cfg.b = float(prev["k1"]), float(prev["b"])

    docs_dir = os.path.join(index_dir, "docs")
    segments_dir = os.path.join(index_dir, "segments")

    if isinstance(source, rd.Dataset):
        src_ds = source
    else:
        src_ds = rd.read_parquet(source)

    # docs pass: append into docs/ (unique file names via UUID suffix)
    src_ds.map_batches(make_docs_meta_fn(cfg), batch_format="pyarrow",
                       batch_size=cfg.batch_size).write_parquet(docs_dir)

    # refresh stats over the UNION of old + new docs
    n_docs, total_len = 0, 0
    for rb in pads.dataset(docs_dir).to_batches(columns=["doc_len"]):
        n_docs += rb.num_rows
        total_len += int(pc.sum(rb.column(0)).as_py() or 0)
    check_doc_id_collisions(docs_dir, n_docs)
    avgdl = (total_len / n_docs) if n_docs else 0.0
    stats = dict(prev)
    stats.update({"n_docs": n_docs, "total_len": total_len, "avgdl": avgdl,
                  "appended": True})

    # postings pass for the NEW docs only → additional segment files
    encoder = SegmentEncoder(avgdl=avgdl, k1=cfg.k1, b=cfg.b,
                             block_size=cfg.block_size)

    def encode_group(group: pa.Table) -> pa.Table:
        return encoder(group)

    (src_ds.map_batches(make_postings_fn(cfg), batch_format="pyarrow",
                        batch_size=cfg.batch_size)
     .groupby("gkey")
     .map_groups(encode_group, batch_format="pyarrow")
     .write_parquet(segments_dir))

    # term_dict refresh (global df/cf over ALL segment rows)
    from .checkpoint import _write_term_dict

    term_dict_dir = os.path.join(index_dir, "term_dict")
    import shutil

    shutil.rmtree(term_dict_dir, ignore_errors=True)
    _write_term_dict(segments_dir, term_dict_dir)

    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    return stats
