"""Offline index integrity audit (``fsck_index``) — the ops tool that
closes the reliability story (journaled commits + crash recovery +
this): verify every structural invariant the engine relies on, and
report violations instead of letting a corrupt index serve wrong
results silently.

Checks (each independent; all violations collected, not just the first):

1. stats.json present with the required keys.
2. docs table: unique doc_id, doc_len > 0, shard == shard_of(doc_id).
3. global stats: n_docs / total_len / avgdl equal the ALIVE docs rows
   (tombstones subtracted), bitwise for avgdl.
4. segments: df == decoded posting count == tf count; cf == Σtf;
   doc ids strictly ascending; every posting doc exists in the docs
   table; the row's shard matches its docs' shard; positional rows
   decode to exactly Σtf ascending positions per doc.
5. term_dict == groupby(term).sum(df, cf) over the segment rows.
6. referenced sidecar files (tombstones / deleted-df) exist.
7. pruning soundness: multiple segment rows per (term, shard) are only
   legal while stats["appended"] is set (a compacted index must be one
   row per key — stale block-max bounds would otherwise serve).

The audit streams the index artifacts driver-side (they are orders of
magnitude smaller than the corpus); at extreme index sizes run the
segments pass as a Ray ``map_batches`` over the same per-row checks.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import load_stats
from .codec import decode_doc_ids, decode_positions, decode_tfs
from .schema import shard_of


@dataclass
class FsckReport:
    errors: list[str] = field(default_factory=list)
    checked_segment_rows: int = 0
    checked_docs: int = 0

    @property
    def ok(self) -> bool:
        return not self.errors

    def _err(self, msg: str) -> None:
        if len(self.errors) < 50:  # bounded report
            self.errors.append(msg)


def fsck_index(index_dir: str, check_positions: bool = True) -> FsckReport:
    rep = FsckReport()
    # ---- 1. stats ----
    try:
        stats = load_stats(index_dir)
    except FileNotFoundError:
        rep._err("stats.json missing")
        return rep
    for k in ("n_docs", "total_len", "avgdl", "num_shards", "block_size"):
        if k not in stats:
            rep._err(f"stats.json missing key {k!r}")
            return rep
    num_shards = int(stats["num_shards"])
    block_size = int(stats["block_size"])

    # ---- 2. docs table ----
    docs_dir = os.path.join(index_dir, "docs")
    if not os.path.isdir(docs_dir):
        rep._err("docs/ missing")
        return rep
    try:
        t = pq.read_table(docs_dir, columns=["doc_id", "doc_len", "shard"])
    except Exception as ex:
        rep._err(f"docs table unreadable: {ex}")
        return rep
    ids = np.asarray(t["doc_id"].combine_chunks()).astype(np.int64)
    lens = np.asarray(t["doc_len"].combine_chunks()).astype(np.int64)
    shards = np.asarray(t["shard"].combine_chunks()).astype(np.int64)
    rep.checked_docs = len(ids)
    order = np.argsort(ids, kind="stable")
    ids, lens, shards = ids[order], lens[order], shards[order]
    if len(ids) and (ids[1:] == ids[:-1]).any():
        rep._err(f"{int((ids[1:] == ids[:-1]).sum())} duplicate doc_id(s)")
    if (lens <= 0).any():
        rep._err(f"{int((lens <= 0).sum())} docs with doc_len <= 0")
    want_shard = shard_of(ids, num_shards).astype(np.int64)
    if (shards != want_shard).any():
        rep._err(f"{int((shards != want_shard).sum())} docs with wrong shard")

    # ---- 3. global stats vs alive rows ----
    from .append import load_tombstones

    tomb = load_tombstones(index_dir, stats)
    alive = np.ones(len(ids), dtype=bool)
    if len(tomb):
        j = np.minimum(np.searchsorted(tomb, ids), len(tomb) - 1)
        alive = tomb[j] != ids
    n_alive, len_alive = int(alive.sum()), int(lens[alive].sum())
    if int(stats["n_docs"]) != n_alive:
        rep._err(f"stats.n_docs {stats['n_docs']} != alive docs {n_alive}")
    if int(stats["total_len"]) != len_alive:
        rep._err(f"stats.total_len {stats['total_len']} != {len_alive}")
    want_avgdl = (len_alive / n_alive) if n_alive else 0.0
    if float(stats["avgdl"]) != want_avgdl:
        rep._err(f"stats.avgdl {stats['avgdl']} != {want_avgdl}")

    # ---- 6. sidecars referenced by stats exist ----
    for key in ("tombstones_file", "deleted_df_file"):
        name = stats.get(key)
        if name and not os.path.exists(os.path.join(index_dir, name)):
            rep._err(f"stats.{key} -> {name} missing on disk")

    # ---- 4 + 7. segments ----
    seg_dir = os.path.join(index_dir, "segments")
    if not os.path.isdir(seg_dir):
        rep._err("segments/ missing")
        return rep
    seg_cols = ["term", "shard", "df", "cf", "doc_ids", "tfs"]
    has_pos = bool(stats.get("store_positions")) and check_positions
    if has_pos:
        seg_cols.append("positions")
    td_counts: dict[str, list[int]] = {}
    seen_keys: set[tuple[str, int]] = set()
    dup_keys = 0
    for rb in pads.dataset(seg_dir).to_batches(columns=seg_cols):
        terms = rb.column(0).to_pylist()
        sh = rb.column(1).to_pylist()
        dfs = rb.column(2).to_pylist()
        cfs = rb.column(3).to_pylist()
        blobs = rb.column(4).to_pylist()
        tfbs = rb.column(5).to_pylist()
        pos_b = rb.column(6).to_pylist() if has_pos else [None] * len(terms)
        for term, shard, df, cf, blob, tfb, pb in zip(
                terms, sh, dfs, cfs, blobs, tfbs, pos_b):
            rep.checked_segment_rows += 1
            key = (term, int(shard))
            if key in seen_keys:
                dup_keys += 1
            seen_keys.add(key)
            p_ids = decode_doc_ids(blob, block_size)
            p_tfs = decode_tfs(tfb).astype(np.int64)
            if len(p_ids) != df or len(p_tfs) != df:
                rep._err(f"({term!r}, shard {shard}): df={df} but "
                         f"{len(p_ids)} ids / {len(p_tfs)} tfs decode")
                continue
            if int(p_tfs.sum()) != cf:
                rep._err(f"({term!r}, shard {shard}): cf={cf} != "
                         f"Σtf {int(p_tfs.sum())}")
            if len(p_ids) > 1 and not (np.diff(p_ids) > 0).all():
                rep._err(f"({term!r}, shard {shard}): doc ids not "
                         "strictly ascending")
            j = np.searchsorted(ids, p_ids)
            ok = (j < len(ids))
            jj = np.minimum(j, len(ids) - 1)
            known = ok & (ids[jj] == p_ids)
            if not known.all():
                rep._err(f"({term!r}, shard {shard}): "
                         f"{int((~known).sum())} posting doc(s) not in "
                         "the docs table")
            elif (shards[jj] != shard).any():
                rep._err(f"({term!r}, shard {shard}): postings for docs "
                         "of a different shard")
            if has_pos:
                try:
                    pos = decode_positions(pb, p_tfs)
                except Exception as ex:  # truncated / garbled blob
                    rep._err(f"({term!r}, shard {shard}): positions "
                             f"blob undecodable ({ex})")
                    pos = None
                if pos is not None:
                    if len(pos) != int(p_tfs.sum()):
                        rep._err(f"({term!r}, shard {shard}): positions "
                                 f"count {len(pos)} != Σtf")
                    else:
                        ends = np.cumsum(p_tfs)
                        starts = ends - p_tfs
                        d = np.diff(pos)
                        bad = d <= 0
                        bad[starts[1:] - 1] = False  # doc boundaries
                        if bad.any():
                            rep._err(f"({term!r}, shard {shard}): "
                                     "positions not ascending in-doc")
            td_counts.setdefault(term, [0, 0])
            td_counts[term][0] += df
            td_counts[term][1] += cf
    if dup_keys and not stats.get("appended"):
        rep._err(f"{dup_keys} duplicate (term, shard) segment row(s) on "
                 "a compacted index — pruning bounds are unsound")

    # ---- 5. term_dict ----
    td_dir = os.path.join(index_dir, "term_dict")
    if not os.path.isdir(td_dir):
        rep._err("term_dict/ missing")
        return rep
    td = pq.read_table(td_dir, columns=["term", "df", "cf"])
    got = dict(zip(td["term"].to_pylist(),
                   zip(td["df"].to_pylist(), td["cf"].to_pylist())))
    if len(got) != len(td_counts):
        rep._err(f"term_dict has {len(got)} terms, segments have "
                 f"{len(td_counts)}")
    else:
        for term, (df, cf) in td_counts.items():
            if got.get(term) != (df, cf):
                rep._err(f"term_dict mismatch for {term!r}: "
                         f"{got.get(term)} != ({df}, {cf})")
                break
    return rep
