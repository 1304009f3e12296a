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
fresh global stats and is exact under any avgdl). ``compact_index``
re-encodes merged (term, shard) rows under the fresh stats and clears
the flag — restoring pruning without a from-scratch rebuild (and bitwise
equal to one, tested).

QueryEngine instances hold stats/doclens/segment caches from load time —
re-instantiate engines (and sharded pools) after an append to see the
new documents.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data as rd

from .build import (
    IndexBuildConfig,
    SegmentEncoder,
    check_doc_id_collisions,
    make_docs_meta_fn,
    make_postings_fn,
)


def recover_segments(index_dir: str) -> bool:
    """Heal a compact_index swap interrupted between its two renames —
    for BOTH swapped directories (segments/, and docs/ when a
    tombstone-purging compaction rewrites the doc table): if the live
    dir is missing but its .old exists, rename it back (the
    pre-compaction copy is complete and correct). A leftover .compact
    is stale scratch either way — removed. Returns True if a recovery
    action was taken. Called on compaction entry and on QueryEngine
    open, so a crash in the swap window never leaves the index
    unreadable."""
    import shutil

    acted = False
    for sub in ("segments", "docs"):
        live = os.path.join(index_dir, sub)
        old = live + ".old"
        if not os.path.isdir(live) and os.path.isdir(old):
            os.rename(old, live)
            acted = True
        if os.path.isdir(live):
            # live dir present: any .old is a fully-superseded copy
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(live + ".compact", ignore_errors=True)
    return acted


_FAIL_AT: str | None = None  # test hook: crash injection inside commit


def _maybe_fail(point: str) -> None:
    if _FAIL_AT == point:
        raise RuntimeError(f"injected crash at {point}")


def recover_appends(index_dir: str) -> bool:
    """Heal an append interrupted mid-commit. The commit point is the
    stats.json write (it records ``last_append_id``): a pending journal
    whose id matches stats.json means the data commit finished — roll
    FORWARD (idempotent term_dict refresh, drop the journal); any other
    pending journal means it didn't — roll BACK by removing the
    journal's listed files from docs/ and segments/ plus the staged
    dirs, leaving the index exactly pre-append. Returns True if a
    recovery action was taken. Called on append entry and QueryEngine
    open (alongside recover_segments)."""
    import glob
    import shutil

    from .build import load_stats

    acted = False
    for jpath in sorted(glob.glob(
            os.path.join(index_dir, "append.pending-*.json"))):
        with open(jpath) as f:
            j = json.load(f)
        aid = j["append_id"]
        try:
            committed = load_stats(index_dir).get("last_append_id") == aid
        except FileNotFoundError:
            committed = False
        docs_dir = os.path.join(index_dir, "docs")
        segments_dir = os.path.join(index_dir, "segments")
        if committed:
            from .checkpoint import _write_term_dict

            term_dict_dir = os.path.join(index_dir, "term_dict")
            shutil.rmtree(term_dict_dir, ignore_errors=True)
            _write_term_dict(segments_dir, term_dict_dir)
        else:
            for name in j.get("docs_files", []):
                p = os.path.join(docs_dir, name)
                if os.path.exists(p):
                    os.remove(p)
            for name in j.get("segment_files", []):
                p = os.path.join(segments_dir, name)
                if os.path.exists(p):
                    os.remove(p)
        shutil.rmtree(os.path.join(index_dir, f"docs.staged-{aid}"),
                      ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, f"segments.staged-{aid}"),
                      ignore_errors=True)
        os.remove(jpath)
        acted = True
    return acted


def load_tombstones(index_dir: str, stats: dict | None = None) -> "object":
    """The active deleted-doc-id set (sorted int64 array; empty when no
    deletes are pending). stats.json names the active tombstone file —
    the single atomic commit point of delete_from_index."""
    import numpy as np

    if stats is None:
        from .build import load_stats

        stats = load_stats(index_dir)
    name = stats.get("tombstones_file")
    if not name:
        return np.empty(0, dtype=np.int64)
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(index_dir, name), columns=["doc_id"])
    return np.asarray(t["doc_id"].combine_chunks()).astype(np.int64)


def recover_purges(index_dir: str) -> bool:
    """Heal an interrupted purge_doc_ids. The journal is written AFTER
    every staged artifact exists, so recovery always rolls FORWARD:
    re-apply the remaining staged-file renames (os.replace is atomic;
    already-applied entries have no staged file left), re-write the
    journal's final stats, sweep sidecars the new stats no longer
    reference, drop the staged dir + journal. Journal-less
    purge.staged-* dirs are pre-intent scratch — swept. Returns True if
    a recovery action was taken. Called on every lifecycle entry point
    and on QueryEngine open."""
    import glob
    import shutil

    from .build import load_stats, write_stats

    acted = False
    journaled: set[str] = set()
    for jpath in sorted(glob.glob(
            os.path.join(index_dir, "purge.pending-*.json"))):
        with open(jpath) as f:
            j = json.load(f)
        journaled.add(f"purge.staged-{j['purge_id']}")
        for staged_rel, live_rel in j["renames"]:
            sp = os.path.join(index_dir, staged_rel)
            if os.path.exists(sp):  # already-applied entries have no
                os.replace(sp, os.path.join(index_dir, live_rel))
        for live_rel in j.get("removals", []):
            lp = os.path.join(index_dir, live_rel)
            if os.path.exists(lp):
                os.remove(lp)
        _apply_dir_swaps(index_dir, j.get("dir_swaps", []))
        write_stats(index_dir, j["stats"])
        _sweep_orphan_sidecars(index_dir, j["stats"])
        shutil.rmtree(os.path.join(
            index_dir, f"purge.staged-{j['purge_id']}"), ignore_errors=True)
        os.remove(jpath)
        acted = True
    for name in os.listdir(index_dir):
        if name.startswith("purge.staged-") and name not in journaled:
            shutil.rmtree(os.path.join(index_dir, name),
                          ignore_errors=True)
            acted = True
    return acted


def _apply_dir_swaps(index_dir: str, dir_swaps) -> None:
    """Replace live dirs with staged ones (idempotent: a missing staged
    dir means the swap already happened)."""
    import shutil

    for staged_rel, live_rel in dir_swaps:
        sp = os.path.join(index_dir, staged_rel)
        if os.path.isdir(sp):
            lp = os.path.join(index_dir, live_rel)
            shutil.rmtree(lp, ignore_errors=True)
            os.rename(sp, lp)


def _sweep_orphan_sidecars(index_dir: str, stats: dict) -> None:
    """Remove tombstones-* / deleted-df-* files the given stats no
    longer reference (superseded by a delete/purge commit)."""
    keep = {stats.get("tombstones_file"), stats.get("deleted_df_file")}
    for name in os.listdir(index_dir):
        if (name.startswith(("tombstones-", "deleted-df-"))
                and name not in keep):
            os.remove(os.path.join(index_dir, name))


def snapshot_index(index_dir: str, out_dir: str) -> dict:
    """Hardlink snapshot of a quiesced index — O(file count), zero data
    copied (copy2 fallback crossing filesystems). Because every
    lifecycle mutation is copy-on-write at file granularity (append
    adds files; delete adds sidecars + swaps stats; purge/compact
    REPLACE files via fresh staged ones — never edit in place), a
    snapshot stays internally consistent while the source continues to
    mutate: the A/B-serving and pre-mutation-backup primitive. Pending
    journals are healed FIRST so the snapshot never carries an
    in-flight mutation. Returns the snapshot's stats."""
    import shutil

    from .build import load_stats

    recover_segments(index_dir)
    recover_appends(index_dir)
    recover_purges(index_dir)
    stats = load_stats(index_dir)  # raises if not an index
    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"out_dir {out_dir!r} exists and is not empty")
    for root, _dirs, files in os.walk(index_dir):
        rel = os.path.relpath(root, index_dir)
        out = os.path.join(out_dir, rel) if rel != "." else out_dir
        os.makedirs(out, exist_ok=True)
        for f in files:
            src = os.path.join(root, f)
            try:
                os.link(src, os.path.join(out, f))
            except OSError:
                shutil.copy2(src, os.path.join(out, f))
    return stats


def set_index_alias(alias_dir: str, index_dir: str) -> str:
    """Point ``alias_dir`` at ``index_dir`` ATOMICALLY (tmp + rename of
    alias.json) — the zero-downtime reindex primitive: build or
    snapshot a new index anywhere, then flip the alias; readers opening
    through the alias (query.open_index) see either the old or the new
    index, never a mix. The target must be a complete index (stats.json
    present — the build/merge/compact commit point)."""
    import json

    from .build import load_stats

    load_stats(index_dir)  # raises unless index_dir is a complete index
    os.makedirs(alias_dir, exist_ok=True)
    final = os.path.join(alias_dir, "alias.json")
    # unique tmp per writer: two concurrent flips must never share an
    # inode, or one's os.replace publishes the other's half-written file
    tmp = f"{final}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"index_dir": os.path.abspath(index_dir)}, f)
    os.replace(tmp, final)
    return final


def resolve_index_alias(path: str) -> str:
    """``path`` itself if it is an index; otherwise follow ONE
    alias.json hop (aliases never chain — the target must be a real
    index, enforced by set_index_alias)."""
    import json

    if os.path.exists(os.path.join(path, "stats.json")):
        return path
    alias = os.path.join(path, "alias.json")
    if os.path.exists(alias):
        with open(alias) as f:
            return json.load(f)["index_dir"]
    raise FileNotFoundError(
        f"{path!r} is neither an index (stats.json) nor an alias "
        f"(alias.json)")


def _gather_spans(offs: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Flat indices covering rows' spans [offs[r], offs[r+1])."""
    from .codec import gather_ranges

    return gather_ranges(offs[rows], offs[rows + 1])


def _purge_segment_file(fpath: str, out_path: str, D: np.ndarray,
                        affected: list[int], block_size: int,
                        store_positions: bool, encoder, dl_lookup
                        ) -> tuple[str, dict[str, list[int]]]:
    """Rewrite ONE segment file without the purged ids. Returns
    (action, {term: [removed_df, removed_cf]}): action is "skip" (no
    purged posting in the file — live file untouched), "rename" (the
    staged rewrite at out_path replaces it), or "removal" (every row
    emptied). Untouched rows keep their original encoded bytes verbatim
    (table slices); affected rows are batch re-encoded with ONE decode
    pass + ONE encoder call ((term, shard) is unique within a file —
    build/append/compact each emit one row per group, though one FILE
    may coalesce several shards' groups, so per-term counts SUM across
    rows) and spliced back in original row order."""
    from .codec import (
        decode_doc_ids_batch,
        decode_positions,
        decode_tfs_batch,
        encode_position_lists,
    )

    # staged reads so untouched files cost ~nothing: (1) a
    # row-group-pruned detection read (shard + doc_ids; checkpoint
    # builds align row groups to shard spans) — most candidate rows
    # contain no purged doc; (2) the full read only for files that
    # actually rewrite. (The caller already pruned files whose shard
    # column is disjoint from the purge set.)
    det = pq.read_table(fpath, columns=["shard", "doc_ids"],
                        filters=[("shard", "in", list(affected))])
    if det.num_rows == 0:
        return "skip", {}
    ids_d, offs_d = decode_doc_ids_batch(det["doc_ids"].to_pylist(),
                                         block_size)
    jd = np.minimum(np.searchsorted(D, ids_d), len(D) - 1)
    if not (D[jd] == ids_d).any():
        return "skip", {}

    tb = pq.read_table(fpath)
    shards_np = np.asarray(tb["shard"].combine_chunks())
    cand = np.flatnonzero(np.isin(
        shards_np, np.asarray(affected, dtype=shards_np.dtype)))
    if len(cand) == det.num_rows:
        # the filtered detection read returned exactly the candidate
        # rows in file order — reuse its decode (the det pass is ~half
        # the file's decode cost)
        ids_f, offs = ids_d, offs_d
    else:
        bufs = tb["doc_ids"].take(pa.array(cand, pa.int64())).to_pylist()
        ids_f, offs = decode_doc_ids_batch(bufs, block_size)
    j = np.minimum(np.searchsorted(D, ids_f), len(D) - 1)
    hit_flat = (D[j] == ids_f)
    row_hits = np.add.reduceat(hit_flat, offs[:-1]) if len(ids_f) \
        else np.zeros(len(cand), dtype=np.int64)
    # reduceat on an empty row span yields the NEXT element; zero
    # rows can't exist in segments (df >= 1), but guard anyway
    row_hits = np.where(np.diff(offs) > 0, row_hits, 0)
    hit_in_cand = np.flatnonzero(row_hits)
    if len(hit_in_cand) == 0:
        return "skip", {}
    hit_rows = cand[hit_in_cand]
    flat_idx = _gather_spans(offs, hit_in_cand)
    ids_h = ids_f[flat_idx]
    keep = ~hit_flat[flat_idx]
    sizes_h = (offs[hit_in_cand + 1] - offs[hit_in_cand]).astype(np.int64)
    tfs_h, _ = decode_tfs_batch(
        tb["tfs"].take(pa.array(hit_rows, pa.int64())).to_pylist())
    terms_h = np.asarray(
        tb["term"].take(pa.array(hit_rows, pa.int64())).to_pylist(),
        dtype=object)
    shards_h = shards_np[hit_rows]
    row_starts = np.concatenate(([0], np.cumsum(sizes_h)[:-1]))
    removed_per_row = np.add.reduceat(~keep, row_starts)
    removed_cf_per_row = np.add.reduceat(
        np.where(keep, 0, tfs_h), row_starts)
    counts: dict[str, list[int]] = {}
    for t, c, cf in zip(terms_h, removed_per_row, removed_cf_per_row):
        if c:  # SUM across rows — one file can hold a term in >1 shard
            cur = counts.setdefault(str(t), [0, 0])
            cur[0] += int(c)
            cur[1] += int(cf)
    cols = {
        "term": pa.array(np.repeat(terms_h, sizes_h)[keep], pa.string()),
        "doc_id": pa.array(ids_h[keep], pa.int64()),
        "tf": pa.array(tfs_h[keep], pa.int64()),
        "shard": pa.array(np.repeat(shards_h, sizes_h)[keep]),
        "doc_len": pa.array(
            dl_lookup.lookup(ids_h[keep]).astype(np.int64), pa.int64()),
    }
    if store_positions:
        blobs_keep: list[bytes] = []
        pos_bufs = tb["positions"].take(
            pa.array(hit_rows, pa.int64())).to_pylist()
        ends_h = np.cumsum(sizes_h)
        for r, blob in enumerate(pos_bufs):
            tf_r = tfs_h[ends_h[r] - sizes_h[r]:ends_h[r]]
            flat = decode_positions(blob, tf_r)
            ends = np.cumsum(tf_r)
            blobs = encode_position_lists(flat, ends - tf_r, ends)
            k_r = keep[ends_h[r] - sizes_h[r]:ends_h[r]]
            blobs_keep.extend(bl for bl, k in zip(blobs, k_r) if k)
        cols["pos"] = pa.array(blobs_keep, pa.binary())
    enc = (encoder(pa.table(cols)).select(tb.column_names)
           .cast(tb.schema) if keep.any()
           else tb.schema.empty_table())
    enc_of = {(enc["term"][i].as_py(), enc["shard"][i].as_py()): i
              for i in range(enc.num_rows)}
    pieces, prev = [], 0
    for ri, i in enumerate(hit_rows.tolist()):
        if i > prev:
            pieces.append(tb.slice(prev, i - prev))
        ei = enc_of.get((terms_h[ri], int(shards_h[ri])))
        if ei is not None:
            pieces.append(enc.slice(ei, 1))
        prev = i + 1
    if prev < tb.num_rows:
        pieces.append(tb.slice(prev, tb.num_rows - prev))
    if not pieces:  # every row emptied: concat_tables([]) would raise
        return "removal", counts
    new_tb = pa.concat_tables(pieces)
    if new_tb.num_rows:
        from .schema import segment_write_kwargs

        # v4 codec policy: pos → zstd
        pq.write_table(new_tb, out_path,
                       **segment_write_kwargs(new_tb.schema))
        return "rename", counts
    return "removal", counts


def purge_doc_ids(index_dir: str, doc_ids) -> dict:
    """Physically remove a bounded set of TOMBSTONED ids without a full
    compaction — the surgical middle ground between delete_from_index
    (O(delete-set), logical) and compact_index (O(index), physical).
    Cost is O(size of the affected shards' files): only segment files
    whose rows contain a purged id and docs files holding a purged row
    are rewritten; every untouched row keeps its original encoded bytes
    verbatim. After the purge the ids are fully gone, so they can be
    RE-ADDED by a normal append (the upsert path: delete → purge →
    append replaces the previous delete → FULL compact).

    Affected segment rows are re-encoded from their surviving postings
    under the index's CURRENT stats — delete_from_index already set
    n_docs/total_len/avgdl to the rebuild-without-deleted values, so
    re-encoded rows are bitwise the rebuild's (positions re-split per
    doc, identity round-trip). ``appended`` stays True (untouched rows
    still carry bounds from the original avgdl).

    Sidecars shrink exactly: the purged ids leave the tombstone set and
    each rewritten row's removed-posting count is subtracted from the
    per-term deleted-df sidecar (computed from the same decode that
    drives the rewrite, so the correction can't drift from the bytes).

    Crash story (single writer): staged rewrites + fresh sidecars are
    written first, then a ``purge.pending-{id}.json`` journal records
    every rename and the final stats; only then do live files change.
    A crash before the journal leaves the index untouched (scratch
    swept); after it, recover_purges — run on every lifecycle entry and
    QueryEngine open — rolls the purge forward deterministically, so no
    reader ever sees purged segments under the old (over-counting)
    deleted-df sidecar."""
    import shutil
    import uuid

    from .build import load_stats, write_stats
    from .codec import decode_positions, encode_position_lists

    recover_segments(index_dir)
    recover_appends(index_dir)
    recover_purges(index_dir)
    stats = load_stats(index_dir)
    tomb = load_tombstones(index_dir, stats)
    D = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(D) == 0:
        return stats
    missing = np.setdiff1d(D, tomb, assume_unique=True)
    if len(missing):
        raise ValueError(
            f"purge_doc_ids only purges tombstoned ids; {len(missing)} "
            f"id(s) are not tombstoned (e.g. {missing[:3].tolist()}) — "
            "delete_from_index them first")
    docs_dir = os.path.join(index_dir, "docs")
    seg_dir = os.path.join(index_dir, "segments")
    block_size = int(stats["block_size"])
    store_positions = bool(stats.get("store_positions"))

    dt = pq.read_table(docs_dir, columns=["doc_id", "shard"],
                       filters=[("doc_id", "in", D.tolist())])
    affected_shards = set(dt["shard"].to_pylist())

    aid = uuid.uuid4().hex
    staged_root = f"purge.staged-{aid}"
    staged_dir = os.path.join(index_dir, staged_root)
    os.makedirs(os.path.join(staged_dir, "segments"), exist_ok=True)
    os.makedirs(os.path.join(staged_dir, "docs"), exist_ok=True)
    removed_counts: dict[str, list[int]] = {}  # term -> [df, cf] removed
    renames: list[list[str]] = []
    removals: list[str] = []

    # --- segment rewrite. Driver pre-filter: a file can hold a purged
    # posting only if its shard column intersects the affected shards —
    # one cheap column read per file (0.09 s for a 64-file/600 MB
    # index) prunes the work list to the handful of files a bounded
    # purge actually touches. Small work lists run inline (Ray task
    # launch costs more than the work: a 10-id purge measured 5.5 s of
    # pure fan-out overhead across 64 mostly-skip tasks); large ones
    # fan out one task per file group, compact-style.
    aff_sorted = sorted(int(s) for s in affected_shards)
    cand_files = []
    for f in sorted(os.listdir(seg_dir)):
        if not f.endswith(".parquet"):
            continue
        sh = np.asarray(pq.read_table(
            os.path.join(seg_dir, f), columns=["shard"])
            ["shard"].combine_chunks())
        if np.isin(sh, np.asarray(aff_sorted, dtype=sh.dtype)).any():
            cand_files.append(f)
    avgdl_f = float(stats["avgdl"])
    k1_f, b_f = float(stats["k1"]), float(stats["b"])

    def _run_files(fnames: list[str]) -> list[tuple[str, str, dict]]:
        from .query import _DocLens

        dl_lookup = _DocLens(docs_dir, aff_sorted)
        encoder = SegmentEncoder(avgdl=avgdl_f, k1=k1_f, b=b_f,
                                 block_size=block_size)
        out = []
        for fname in fnames:
            action, counts = _purge_segment_file(
                os.path.join(seg_dir, fname),
                os.path.join(staged_dir, "segments", fname),
                D, aff_sorted, block_size, store_positions,
                encoder, dl_lookup)
            out.append((fname, action, counts))
        return out

    # crossover: serial work is ~0.3 s/file while a Ray Data execution
    # carries ~2-3 s of fixed executor/polling overhead (measured: a
    # 10-file purge spent 3.4 s in executor sleeps) — fan out only when
    # the parallel saving clears that
    if len(cand_files) <= 16:
        results = _run_files(cand_files)
    else:
        def process_files(b: pa.Table) -> pa.Table:
            pa.set_cpu_count(1)
            rows = _run_files(b["fname"].to_pylist())
            return pa.table({
                "fname": pa.array([r[0] for r in rows], pa.string()),
                "action": pa.array([r[1] for r in rows], pa.string()),
                "counts": pa.array([json.dumps(r[2]) for r in rows],
                                   pa.string()),
            })

        rows = (rd.from_items([{"fname": f} for f in cand_files])
                .map_batches(process_files, batch_format="pyarrow",
                             batch_size=max(1, len(cand_files) // 16),
                             concurrency=min(16, len(cand_files)))
                .take_all())
        results = [(r["fname"], r["action"], json.loads(r["counts"]))
                   for r in rows]
    for fname, action, counts in sorted(results, key=lambda r: r[0]):
        for t, (c_df, c_cf) in counts.items():
            cur = removed_counts.setdefault(t, [0, 0])
            cur[0] += c_df
            cur[1] += c_cf
        if action == "rename":
            renames.append([f"{staged_root}/segments/{fname}",
                            f"segments/{fname}"])
        elif action == "removal":
            removals.append(f"segments/{fname}")

    for fname in sorted(os.listdir(docs_dir)):
        if not fname.endswith(".parquet"):
            continue
        fpath = os.path.join(docs_dir, fname)
        tb = pq.read_table(fpath)
        ids = np.asarray(tb["doc_id"].combine_chunks()).astype(np.int64)
        j = np.minimum(np.searchsorted(D, ids), len(D) - 1)
        keep = D[j] != ids
        if keep.all():
            continue
        new_tb = tb.filter(pa.array(keep))
        if new_tb.num_rows:
            pq.write_table(new_tb, os.path.join(staged_dir, "docs", fname))
            renames.append([f"{staged_root}/docs/{fname}",
                            f"docs/{fname}"])
        else:
            removals.append(f"docs/{fname}")

    # fresh sidecars (inert until the journaled stats switch)
    new_stats = dict(stats)
    new_tomb = np.setdiff1d(tomb, D, assume_unique=True)
    for key in ("tombstones_file", "deleted_df_file", "n_tombstones"):
        new_stats.pop(key, None)
    if len(new_tomb):
        tomb_name = f"tombstones-{aid}.parquet"
        pq.write_table(pa.table({"doc_id": pa.array(new_tomb, pa.int64())}),
                       os.path.join(index_dir, tomb_name))
        new_stats["tombstones_file"] = tomb_name
        new_stats["n_tombstones"] = len(new_tomb)
        if stats.get("deleted_df_file"):
            old_ddf = pq.read_table(
                os.path.join(index_dir, stats["deleted_df_file"]))
            ddf = dict(zip(old_ddf["term"].to_pylist(),
                           (int(x) for x in old_ddf["ddf"].to_pylist())))
            for term, (c_df, _c_cf) in removed_counts.items():
                left = ddf.get(term, 0) - c_df
                if left > 0:
                    ddf[term] = left
                else:
                    ddf.pop(term, None)
            ddf_name = f"deleted-df-{aid}.parquet"
            ts = sorted(ddf)
            pq.write_table(pa.table({
                "term": pa.array(ts, pa.string()),
                "ddf": pa.array([ddf[t] for t in ts], pa.int64()),
            }), os.path.join(index_dir, ddf_name))
            new_stats["deleted_df_file"] = ddf_name

    # term_dict update — INCREMENTAL (vocab-sized, keeps purge
    # O(affected files) where a segments-scan rebuild would be
    # O(index)): term_dict tracks PHYSICAL segment df/cf, and the
    # rewrite's exact removed (df, cf) per term is already in hand.
    # Staged as a full replacement dir so the journal can roll the
    # swap forward; without this, shard-subset engines (which read df
    # from term_dict) would score against stale counts.
    dir_swaps: list[list[str]] = []
    td_dir = os.path.join(index_dir, "term_dict")
    if removed_counts and os.path.isdir(td_dir):
        old_td = pq.read_table(td_dir)
        t_l = old_td["term"].to_pylist()
        df_l = old_td["df"].to_pylist()
        cf_l = old_td["cf"].to_pylist()
        new_rows = []
        for t, df_v, cf_v in zip(t_l, df_l, cf_l):
            rem = removed_counts.get(t)
            if rem is not None:
                df_v, cf_v = int(df_v) - rem[0], int(cf_v) - rem[1]
            if df_v > 0:  # fully-purged terms leave the dictionary
                new_rows.append((t, int(df_v), int(cf_v)))
        td_staged = os.path.join(staged_dir, "term_dict")
        os.makedirs(td_staged, exist_ok=True)
        pq.write_table(pa.table({
            "term": pa.array([r[0] for r in new_rows], pa.string()),
            "df": pa.array([r[1] for r in new_rows], pa.int64()),
            "cf": pa.array([r[2] for r in new_rows], pa.int64()),
        }), os.path.join(td_staged, "term_dict.parquet"))
        dir_swaps.append([f"{staged_root}/term_dict", "term_dict"])

    journal = os.path.join(index_dir, f"purge.pending-{aid}.json")
    with open(journal + ".tmp", "w") as f:
        json.dump({"purge_id": aid, "renames": renames,
                   "removals": removals, "dir_swaps": dir_swaps,
                   "stats": new_stats}, f)
    os.replace(journal + ".tmp", journal)  # INTENT — roll-forward from here

    _maybe_fail("purge_after_journal")
    for staged_rel, live_rel in renames:
        os.replace(os.path.join(index_dir, staged_rel),
                   os.path.join(index_dir, live_rel))
        _maybe_fail("purge_mid_renames")
    for live_rel in removals:
        lp = os.path.join(index_dir, live_rel)
        if os.path.exists(lp):
            os.remove(lp)
    _apply_dir_swaps(index_dir, dir_swaps)
    _maybe_fail("purge_after_dirswap")
    write_stats(index_dir, new_stats)  # COMMIT POINT
    _maybe_fail("purge_after_stats")
    _sweep_orphan_sidecars(index_dir, new_stats)
    shutil.rmtree(staged_dir, ignore_errors=True)
    os.remove(journal)
    return new_stats


def delete_from_index(index_dir: str, doc_ids) -> dict:
    """Tombstone deletion — the missing quarter of the lifecycle
    (build / append / DELETE / compact). O(delete-set) work now;
    physical purge happens at the next ``compact_index``.

    Commit is ONE atomic stats.json replace: the full (old ∪ new)
    deleted-id set is first written to a fresh ``tombstones-{id}``
    parquet, then stats.json switches to it — a crash anywhere shows
    either the old or the new delete set, never a torn state. Global
    stats (n_docs / total_len / avgdl) are recomputed from the
    actually-present deleted rows, and ``appended`` is set: pruning
    bounds are stale under the changed avgdl AND deleted docs must
    never surface, so every query routes to the exhaustive scorer,
    which masks tombstones (results bitwise equal to a rebuild without
    the deleted docs — tested). Ids not present in the index are
    ignored (deletes are idempotent). Re-adding a deleted id requires
    its physical row to be gone first — ``purge_doc_ids`` (surgical,
    O(affected files)) or ``compact_index`` (full) — because the append
    collision check sees the tombstoned row (by design)."""
    import uuid

    import numpy as np
    import pyarrow.parquet as pq

    from .build import load_stats, write_stats

    recover_segments(index_dir)
    recover_appends(index_dir)
    recover_purges(index_dir)
    stats = load_stats(index_dir)
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    old = load_tombstones(index_dir, stats)
    new_ids = np.setdiff1d(ids, old, assume_unique=True)
    if len(new_ids) == 0:
        return stats
    # only rows that actually exist tombstone (and adjust stats)
    docs_dir = os.path.join(index_dir, "docs")
    t = pq.read_table(docs_dir, columns=["doc_id", "doc_len"],
                      filters=[("doc_id", "in", new_ids.tolist())])
    found = np.asarray(t["doc_id"].combine_chunks()).astype(np.int64)
    if len(found) == 0:
        return stats
    removed_len = int(np.asarray(t["doc_len"].combine_chunks()).sum())
    allt = np.union1d(old, found)
    n_docs = int(stats["n_docs"]) - len(found)
    total_len = int(stats["total_len"]) - removed_len
    aid = uuid.uuid4().hex
    tomb_name = f"tombstones-{aid}.parquet"
    pq.write_table(pa.table({"doc_id": pa.array(allt, pa.int64())}),
                   os.path.join(index_dir, tomb_name))

    # per-term deleted-df sidecar: physical segment dfs still count
    # tombstoned docs, but exact idf needs df over ALIVE docs — and the
    # correction must be GLOBAL (a sharded worker can't see other
    # shards' postings). Count deleted docs per term once here: one
    # column-pruned segments scan (term + doc_ids only, postings stay
    # encoded until the per-row decode), vocab-bounded output.
    block_size = int(stats["block_size"])
    seg_dir = os.path.join(index_dir, "segments")
    counts = _deleted_df_counts(seg_dir, allt, block_size)
    ddf_name = f"deleted-df-{aid}.parquet"
    terms_sorted = sorted(counts)
    pq.write_table(pa.table({
        "term": pa.array(terms_sorted, pa.string()),
        "ddf": pa.array([counts[t] for t in terms_sorted], pa.int64()),
    }), os.path.join(index_dir, ddf_name))

    stats.update({
        "n_docs": n_docs, "total_len": total_len,
        "avgdl": (total_len / n_docs) if n_docs else 0.0,
        "appended": True,  # stale bounds + mandatory tombstone masking
        "tombstones_file": tomb_name, "n_tombstones": len(allt),
        "deleted_df_file": ddf_name,
    })
    write_stats(index_dir, stats)  # COMMIT POINT (atomic replace)
    for name in os.listdir(index_dir):  # sweep superseded sidecars
        if (name.startswith(("tombstones-", "deleted-df-"))
                and aid not in name):
            os.remove(os.path.join(index_dir, name))
    return stats


def delete_by_query(index_dir: str, expr: str) -> dict:
    """ES ``_delete_by_query`` analog: resolve a boolean-DSL expression
    (``AND`` / ``OR`` / ``NOT`` / parens / ``prefix*`` atoms — the
    search_boolean_dsl language) against the index's OWN postings, then
    tombstone the matched set via :func:`delete_from_index`.

    The match runs over alive docs only (tombstones are masked by the
    DSL evaluator), so re-running the same expression is a no-op — the
    op is idempotent, matching ES semantics where a second
    _delete_by_query finds nothing. No corpus rescan: one sorted-set
    postings evaluation resolves the set; the delete itself costs one
    column-pruned segments scan (delete_from_index's exact-idf ddf
    correction — scan-dominated, near-flat in matched-set size;
    measured in BENCH/qlifecycle_r4.json) + O(matched). Returns the
    updated stats (unchanged when nothing matches)."""
    from .build import load_stats
    from .query import QueryEngine

    eng = QueryEngine(index_dir)  # open runs the recovery passes
    ids = eng.search_boolean_dsl(expr)
    if len(ids) == 0:
        return load_stats(index_dir)
    return delete_from_index(index_dir, np.asarray(ids, dtype=np.int64))


def reindex_index(src_index: str, out_dir: str, content_col: str,
                  transform_batch=None, **cfg_overrides) -> dict:
    """ES ``_reindex`` analog: build a NEW index from an existing
    index's OWN doc store — no re-read of the original corpus. Requires
    the source to have stored the content column in its docs sidecar
    (pass it in ``meta_cols`` at build time — the ES ``_source``
    pattern); raises otherwise. The read is the ALIVE view: tombstoned
    docs are excluded via a broadcast sorted-membership mask, so the
    reindexed output equals a rebuild over the source's logical state —
    under whatever new layout/analysis ``cfg_overrides`` selects
    (num_shards, term_buckets, store_positions, tokenizer, ...).
    ``transform_batch`` is the ES _reindex "script": a vectorized
    pa.Table → pa.Table applied to the alive rows before the rebuild
    (rewrite the content, derive/drop stored columns en route).

    Scale shape: one streaming docs-sidecar scan feeding the standard
    fused build; the tombstone set is the only driver-held state."""
    import ray

    from .build import build_index, load_stats

    recover_segments(src_index)
    recover_appends(src_index)
    recover_purges(src_index)
    stats = load_stats(src_index)
    docs_dir = os.path.join(src_index, "docs")
    parts = sorted(f for f in os.listdir(docs_dir) if f.endswith(".parquet"))
    if not parts:
        raise ValueError(f"{src_index!r} has no docs part-files — "
                         "nothing to reindex")
    schema_names = pq.read_schema(os.path.join(docs_dir, parts[0])).names
    if content_col not in schema_names:
        raise ValueError(
            f"source index did not store {content_col!r} in its docs "
            "sidecar — build it with the content column in meta_cols "
            "(the _source pattern) to make it reindexable")
    # drop derived columns; the new build recomputes them
    cols = [c for c in schema_names
            if c not in ("doc_len", "shard", "content_sha256")]
    ds = rd.read_parquet(docs_dir, columns=cols)
    tomb = load_tombstones(src_index, stats)
    if len(tomb):
        tomb_ref = ray.put(np.asarray(tomb, dtype=np.int64))

        def alive(b: pa.Table) -> pa.Table:
            from .query import sorted_member_mask

            dead = ray.get(tomb_ref)
            ids = np.asarray(b["doc_id"].combine_chunks()).astype(np.int64)
            return b.filter(pa.array(~sorted_member_mask(dead, ids)))

        ds = ds.map_batches(alive, batch_format="pyarrow")
    if transform_batch is not None:
        ds = ds.map_batches(transform_batch, batch_format="pyarrow")
    # default: carry every stored column forward INCLUDING the content
    # column, so the reindexed index keeps the _source property (stays
    # reindexable); override meta_cols to drop it
    meta = tuple(c for c in cols if c != "doc_id")
    cfg_overrides.setdefault("meta_cols", meta)
    return build_index(ds, out_dir, content_col=content_col,
                       id_col="doc_id", **cfg_overrides)


def update_by_query(index_dir: str, expr: str, source, transform_batch,
                    **cfg_overrides) -> dict:
    """ES ``_update_by_query`` analog: resolve the boolean-DSL matched
    set against the index's own postings, re-read ONLY those docs from
    ``source`` (the original corpus — the index's docs sidecar stores
    metadata, not text), apply the vectorized ``transform_batch``
    (pa.Table → pa.Table over the index's content/id columns) and
    upsert the transformed delta (delete → surgical purge → append).

    The matched-id set rides one ``ray.put`` broadcast into a
    sorted-membership filter per batch (never re-shipped per batch);
    the corpus scan is the only full pass. Matched set must fit a
    worker's heap — for expression matching most of the corpus, a
    rebuild is the right tool. Returns the final stats; results equal a
    from-scratch rebuild of the transformed corpus (upsert contract,
    tested)."""
    import ray

    from .build import load_stats
    from .query import QueryEngine

    eng = QueryEngine(index_dir)
    ids = np.sort(eng.search_boolean_dsl(expr))
    if len(ids) == 0:
        return load_stats(index_dir)
    # resolve source ids EXACTLY as the build does — explicit id column
    # or the derived key_cols hash (indexes built without an id_col;
    # the recipe is persisted in stats, caller overrides win for
    # pre-key_cols indexes)
    from .build import _resolve_doc_ids

    pick_cfg = IndexBuildConfig()
    if eng.stats.get("content_col"):
        pick_cfg.content_col = eng.stats["content_col"]
    pick_cfg.id_col = eng.stats.get("id_col")
    if cfg_overrides.get("key_cols") is not None:
        pick_cfg.key_cols = tuple(cfg_overrides["key_cols"])
    elif eng.stats.get("key_cols") is not None:
        pick_cfg.key_cols = tuple(eng.stats["key_cols"])
    ids_ref = ray.put(ids)

    def pick(b: pa.Table) -> pa.Table:
        from .query import sorted_member_mask

        keys = ray.get(ids_ref)
        col = np.asarray(_resolve_doc_ids(b, pick_cfg), dtype=np.int64)
        return b.filter(pa.array(sorted_member_mask(keys, col)))

    src_ds = source if isinstance(source, rd.Dataset) \
        else rd.read_parquet(source)
    delta = (src_ds.map_batches(pick, batch_format="pyarrow")
             .map_batches(transform_batch, batch_format="pyarrow"))
    return upsert_to_index(delta, index_dir, **cfg_overrides)


def append_to_index(source, index_dir: str,
                    cfg: IndexBuildConfig | None = None,
                    content_col: str | None = None, id_col: str | None = None,
                    **cfg_overrides) -> dict:
    """Append ``source`` documents to an existing index. Returns updated
    stats. New doc ids must be disjoint from existing ones (checked).

    Crash-safe: both the docs rows AND the new segment files are staged
    outside the live directories while the expensive work (tokenize,
    collision audit, postings encode) runs; the only mutation window is
    the journaled commit (two batches of renames + the stats write),
    and ``recover_appends`` rolls an interrupted commit back — or
    forward once stats.json (the commit point) has landed."""
    from .build import load_stats

    prev = load_stats(index_dir)
    cfg = cfg or IndexBuildConfig()
    if content_col is not None:
        cfg.content_col = content_col
    if id_col is not None:
        cfg.id_col = id_col
    for k, v in cfg_overrides.items():
        setattr(cfg, k, v)
    # column mapping follows the existing index: appending with a
    # different id_col would silently derive a disjoint id space (the
    # collision check can't catch that), so inherit when the caller
    # didn't override and raise on an explicit mismatch
    explicit_content = (content_col is not None
                        or "content_col" in cfg_overrides)
    explicit_id = id_col is not None or "id_col" in cfg_overrides
    prev_content = prev.get("content_col")
    prev_id = prev.get("id_col")
    if prev_content:
        if explicit_content and cfg.content_col != prev_content:
            raise ValueError(
                f"append content_col={cfg.content_col!r} != index's "
                f"{prev_content!r} (stats.json)")
        cfg.content_col = prev_content
    if "id_col" in prev:
        if explicit_id and cfg.id_col != prev_id:
            raise ValueError(
                f"append id_col={cfg.id_col!r} != index's {prev_id!r} "
                f"(stats.json)")
        cfg.id_col = prev_id
    # shard layout must match the existing index
    cfg.num_shards = int(prev["num_shards"])
    cfg.block_size = int(prev["block_size"])
    cfg.k1, cfg.b = float(prev["k1"]), float(prev["b"])
    # a positional index stays positional: the delta's postings carry
    # per-doc position blobs so appended segments serve phrase/NEAR too
    cfg.store_positions = bool(prev.get("store_positions"))
    # appended docs rows carry the SAME sidecar columns (stored-_source
    # / reindexability survives appends); pre-meta_cols stats fall back
    # to whatever the caller's cfg already had. An EXPLICIT conflicting
    # override is an error, like content_col/id_col above — silently
    # writing different columns would corrupt the sidecar contract
    if prev.get("meta_cols") is not None:
        prev_meta = tuple(prev["meta_cols"])
        if ("meta_cols" in cfg_overrides
                and tuple(cfg_overrides["meta_cols"]) != prev_meta):
            raise ValueError(
                f"append meta_cols={tuple(cfg_overrides['meta_cols'])!r} "
                f"!= index's {prev_meta!r} (stats.json)")
        cfg.meta_cols = prev_meta

    docs_dir = os.path.join(index_dir, "docs")
    segments_dir = os.path.join(index_dir, "segments")

    if isinstance(source, rd.Dataset):
        src_ds = source
    else:
        src_ds = rd.read_parquet(source)

    # docs pass: STAGE outside docs/ first — the collision check below
    # may reject this append, and new rows must not pollute the live
    # docs table until it passes (a failed append leaves the index
    # exactly as it was)
    import shutil
    import uuid

    # heal any crashed prior append, then sweep journal-less staged
    # dirs (crash before the journal was written; single-writer
    # assumption: no other append is running against this index)
    recover_appends(index_dir)
    recover_purges(index_dir)
    for name in os.listdir(index_dir):
        if name.startswith(("docs.staged-", "segments.staged-")):
            shutil.rmtree(os.path.join(index_dir, name), ignore_errors=True)

    aid = uuid.uuid4().hex
    staged_dir = os.path.join(index_dir, f"docs.staged-{aid}")
    seg_staged = os.path.join(index_dir, f"segments.staged-{aid}")
    try:
        src_ds.map_batches(make_docs_meta_fn(cfg), batch_format="pyarrow",
                           batch_size=cfg.batch_size).write_parquet(staged_dir)

        # refresh stats over the UNION of old + staged docs
        union = pads.dataset([pads.dataset(docs_dir),
                              pads.dataset(staged_dir)])
        n_docs, total_len = 0, 0
        for rb in union.to_batches(columns=["doc_len"]):
            n_docs += rb.num_rows
            total_len += int(pc.sum(rb.column(0)).as_py() or 0)
        # paths (not the pads dataset) so the beyond-driver-scale
        # distributed audit path is reachable here too
        check_doc_id_collisions([docs_dir, staged_dir], n_docs)

        # tombstoned rows are physically present until compaction but
        # must not count toward global stats
        tomb = load_tombstones(index_dir, prev)
        if len(tomb):
            td = pq.read_table(docs_dir, columns=["doc_len"],
                               filters=[("doc_id", "in", tomb.tolist())])
            n_docs -= td.num_rows
            total_len -= int(pc.sum(td["doc_len"]).as_py() or 0)

        avgdl = (total_len / n_docs) if n_docs else 0.0
        stats = dict(prev)
        stats.update({"n_docs": n_docs, "total_len": total_len,
                      "avgdl": avgdl, "appended": True,
                      "last_append_id": aid})

        # postings pass for the NEW docs only → STAGED segment files
        # (the live segments/ dir is untouched until the commit below)
        encoder = SegmentEncoder(avgdl=avgdl, k1=cfg.k1, b=cfg.b,
                                 block_size=cfg.block_size)

        def encode_group(group: pa.Table) -> pa.Table:
            return encoder(group)

        from .build import _empty_segments_table
        from .schema import segment_write_kwargs

        (src_ds.map_batches(make_postings_fn(cfg), batch_format="pyarrow",
                            batch_size=cfg.batch_size)
         .groupby("gkey")
         .map_groups(encode_group, batch_format="pyarrow")
         .write_parquet(seg_staged, **segment_write_kwargs(
             _empty_segments_table(cfg.store_positions).schema)))
    except BaseException:
        shutil.rmtree(staged_dir, ignore_errors=True)
        shutil.rmtree(seg_staged, ignore_errors=True)
        raise

    # ---- journaled commit: record the exact final file names FIRST so
    # recover_appends can roll an interrupted commit back (or forward
    # once stats.json — the commit point — has landed) ----
    docs_files = sorted(os.listdir(staged_dir))
    segment_files = [f"append-{aid}-{n}" for n in sorted(
        os.listdir(seg_staged))]
    journal = os.path.join(index_dir, f"append.pending-{aid}.json")
    with open(journal + ".tmp", "w") as f:
        json.dump({"append_id": aid, "docs_files": docs_files,
                   "segment_files": segment_files}, f)
    os.replace(journal + ".tmp", journal)

    for name in docs_files:
        os.rename(os.path.join(staged_dir, name),
                  os.path.join(docs_dir, name))
    os.rmdir(staged_dir)
    _maybe_fail("mid_commit_docs")
    for src, dst in zip(sorted(os.listdir(seg_staged)), segment_files):
        os.rename(os.path.join(seg_staged, src),
                  os.path.join(segments_dir, dst))
    os.rmdir(seg_staged)
    _maybe_fail("mid_commit_segments")
    from .build import write_stats

    write_stats(index_dir, stats)  # COMMIT POINT (atomic replace)
    _maybe_fail("after_stats")

    # term_dict refresh (global df/cf over ALL segment rows)
    from .checkpoint import _write_term_dict

    term_dict_dir = os.path.join(index_dir, "term_dict")
    shutil.rmtree(term_dict_dir, ignore_errors=True)
    _write_term_dict(segments_dir, term_dict_dir)
    os.remove(journal)
    return stats


# above this segment-row count the deleted-df scan runs as a Ray
# map_batches pass (per-batch vocab-sized partials, driver merge);
# below it a driver-side Arrow stream wins (no session warm-up cost) —
# the same routing idea as checkpoint._TERM_DICT_RAY_THRESHOLD
_DDF_RAY_THRESHOLD = 2_000_000


def _deleted_df_counts(seg_dir: str, allt, block_size: int,
                       threshold: int | None = None) -> dict[str, int]:
    """Per-term count of tombstoned docs across all segment rows.
    Small indexes stream on the driver; large ones fan out as a
    map_batches pass whose output is (term, ddf) partials — one row
    per term PER BATCH, so the driver merge is vocab-bounded and no
    (term → count) shuffle happens (the hash-bucket-vs-native-groupby
    trap doesn't apply: there is no groupby at all)."""
    import numpy as np

    from .codec import decode_doc_ids

    if threshold is None:
        threshold = _DDF_RAY_THRESHOLD

    def batch_counts(rb) -> dict[str, int]:
        out: dict[str, int] = {}
        for term, blob in zip(rb.column(0).to_pylist(),
                              rb.column(1).to_pylist()):
            ids = decode_doc_ids(blob, block_size)
            j = np.minimum(np.searchsorted(allt, ids), len(allt) - 1)
            c = int((allt[j] == ids).sum())
            if c:
                out[term] = out.get(term, 0) + c
        return out

    dset = pads.dataset(seg_dir, format="parquet")
    counts: dict[str, int] = {}
    if dset.count_rows() < threshold:
        for rb in dset.to_batches(columns=["term", "doc_ids"]):
            for t, c in batch_counts(rb).items():
                counts[t] = counts.get(t, 0) + c
        return counts

    def partials(b: pa.Table) -> pa.Table:
        rb = b.combine_chunks().to_batches()[0] if b.num_rows else None
        part = batch_counts(rb) if rb is not None else {}
        terms = sorted(part)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "ddf": pa.array([part[t] for t in terms], pa.int64()),
        })

    rows = (rd.read_parquet(seg_dir, columns=["term", "doc_ids"])
            .map_batches(partials, batch_format="pyarrow")
            .take_all())  # vocab-bounded per batch
    for r in rows:
        counts[r["term"]] = counts.get(r["term"], 0) + int(r["ddf"])
    return counts


def upsert_to_index(source, index_dir: str,
                    cfg: IndexBuildConfig | None = None,
                    content_col: str | None = None,
                    id_col: str | None = None,
                    **cfg_overrides) -> dict:
    """Replace-or-insert the delta: tombstone any delta ids already in
    the index, compact to free them (the append collision check forbids
    re-adding a tombstoned id — its row still occupies the docs table),
    then append the delta. Cost = one delete + one compaction + one
    delta scan, so this is the MERGE-batch shape: accumulate updates
    and upsert in batches rather than per document. Returns the final
    stats. Results equal a from-scratch rebuild of the merged corpus
    (tested, bitwise)."""
    from .build import load_stats

    prev = load_stats(index_dir)
    cfg = cfg or IndexBuildConfig()
    if content_col is not None:
        cfg.content_col = content_col
    if id_col is not None:
        cfg.id_col = id_col
    for k, v in cfg_overrides.items():
        setattr(cfg, k, v)
    # resolve delta ids EXACTLY the way the append will (inherited cols)
    if prev.get("content_col"):
        cfg.content_col = prev["content_col"]
    if "id_col" in prev:
        cfg.id_col = prev["id_col"]
    cfg.num_shards = int(prev["num_shards"])

    from .build import _resolve_doc_ids

    if isinstance(source, rd.Dataset):
        src_ds = source
    else:
        src_ds = rd.read_parquet(source)

    def ids_only(b: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table({"doc_id": pa.array(
            np.asarray(_resolve_doc_ids(b, cfg)), pa.int64())})

    delta_ids = (src_ds.map_batches(ids_only, batch_format="pyarrow")
                 .to_pandas()["doc_id"].to_numpy())
    docs_dir = os.path.join(index_dir, "docs")
    existing = pq.read_table(
        docs_dir, columns=["doc_id"],
        filters=[("doc_id", "in", delta_ids.tolist())])
    if existing.num_rows:
        # logical delete, then SURGICAL purge of exactly those ids —
        # O(affected shard files), not the previous full compact_index
        # (O(index) to upsert one doc); the append below then re-adds
        # the new contents under fresh stats
        delete_from_index(index_dir, existing["doc_id"].to_pylist())
        purge_doc_ids(index_dir, existing["doc_id"].to_pylist())
    # forward the RESOLVED cfg: explicit fields the caller set on their
    # cfg object (batch_size, term_buckets, ...) must reach the append
    # leg too, not just the id-resolution above; the explicit col kwargs
    # still travel so append's own mismatch check sees caller intent
    return append_to_index(source, index_dir, cfg=cfg,
                           content_col=content_col, id_col=id_col,
                           **cfg_overrides)


def merge_indexes(sources: list[str], out_dir: str) -> dict:
    """Merge independently built indexes into a NEW index at ``out_dir``
    WITHOUT re-tokenizing — the scale ingestion pattern: build K
    shard-group indexes in parallel jobs (each sees 1/K of the corpus),
    then merging is a file-level union + stats refresh, O(index files),
    no pass over the text. Returns the merged stats.

    Requirements (checked): ≥2 sources sharing num_shards / block_size /
    k1 / b / store_positions / content_col / id_col; disjoint doc-id
    spaces (the build's collision audit runs over the merged PHYSICAL
    docs table — tombstoned rows included, so an id tombstoned in one
    source and live in another is rejected like any collision).

    Sources MAY carry pending tombstones: the merged index unions the
    tombstone sets and sums the per-term deleted-df sidecars (doc
    spaces are disjoint, so the per-source ddf counts are additive and
    the merged correction stays exact — source n_docs/total_len already
    exclude deleted rows, so the summed stats need no adjustment).
    Compacting the merged index purges them physically, bitwise equal
    to a rebuild without the deleted docs (test_merge).

    The merged index is marked ``appended``: each source's block-max
    bounds were encoded under its OWN avgdl, so pruning would be
    unsound under the merged stats — exhaustive scoring recomputes
    exactly (bitwise == a full rebuild's search results, pytest), and a
    follow-up ``compact_index`` re-encode restores pruning (compacted
    merge bitwise == rebuild, including positions).

    Crash story: ``out_dir`` must be fresh; stats.json is written LAST,
    so an interrupted merge leaves an index that cannot be opened
    (load_stats fails) — delete and re-run. Files are hard-linked when
    the filesystem allows (sources stay untouched either way)."""
    import shutil

    from .build import load_stats, write_stats

    if len(sources) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    stats_list = []
    tomb_arrays: list[np.ndarray] = []
    ddf_counts: dict[str, int] = {}
    for s in sources:
        recover_segments(s)
        recover_appends(s)
        recover_purges(s)
        st = load_stats(s)
        tmb = load_tombstones(s, st)
        if len(tmb):
            tomb_arrays.append(np.asarray(tmb, dtype=np.int64))
            if st.get("deleted_df_file"):
                dt = pq.read_table(os.path.join(s, st["deleted_df_file"]))
                for term, ddf in zip(dt["term"].to_pylist(),
                                     dt["ddf"].to_pylist()):
                    ddf_counts[term] = ddf_counts.get(term, 0) + int(ddf)
        stats_list.append(st)
    base = stats_list[0]
    # meta_cols must also agree: a union of docs sidecars with
    # different column sets would break stored-_source reads (reindex).
    # A missing key (pre-meta_cols stats) normalizes to the build
    # default — those indexes wrote exactly the default columns
    _default_meta = list(IndexBuildConfig().meta_cols)
    for key in ("num_shards", "block_size", "k1", "b", "content_col",
                "id_col", "store_positions", "meta_cols"):
        vals = {json.dumps(st.get(key) if key != "meta_cols"
                           else (st.get(key) or _default_meta))
                for st in stats_list}
        if len(vals) > 1:
            raise ValueError(
                f"merge_indexes: sources disagree on {key}: {sorted(vals)}")

    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise ValueError(f"out_dir {out_dir!r} exists and is not empty")
    docs_out = os.path.join(out_dir, "docs")
    seg_out = os.path.join(out_dir, "segments")
    os.makedirs(docs_out, exist_ok=True)
    os.makedirs(seg_out, exist_ok=True)

    def link_all(src_sub: str, dst: str, tag: str) -> None:
        for name in sorted(os.listdir(src_sub)):
            s_path = os.path.join(src_sub, name)
            d_path = os.path.join(dst, f"{tag}-{name}")
            try:
                os.link(s_path, d_path)
            except OSError:
                shutil.copy2(s_path, d_path)

    for i, s in enumerate(sources):
        link_all(os.path.join(s, "docs"), docs_out, f"merge{i}")
        link_all(os.path.join(s, "segments"), seg_out, f"merge{i}")

    n_docs = sum(int(st["n_docs"]) for st in stats_list)
    total_len = sum(int(st["total_len"]) for st in stats_list)
    check_doc_id_collisions(docs_out, n_docs)

    from .checkpoint import _write_term_dict

    _write_term_dict(seg_out, os.path.join(out_dir, "term_dict"))
    stats = dict(base)
    for drop in ("tombstones_file", "deleted_df_file", "last_append_id"):
        stats.pop(drop, None)
    stats.update({"n_docs": n_docs, "total_len": total_len,
                  "avgdl": (total_len / n_docs) if n_docs else 0.0,
                  "appended": True})
    if tomb_arrays:
        # union the sources' tombstone sets + sum their ddf sidecars
        # (disjoint doc spaces -> additive, exact) into fresh sidecars
        import uuid

        allt = np.unique(np.concatenate(tomb_arrays))
        aid = uuid.uuid4().hex
        tomb_name = f"tombstones-{aid}.parquet"
        pq.write_table(pa.table({"doc_id": pa.array(allt, pa.int64())}),
                       os.path.join(out_dir, tomb_name))
        ddf_name = f"deleted-df-{aid}.parquet"
        terms_sorted = sorted(ddf_counts)
        pq.write_table(pa.table({
            "term": pa.array(terms_sorted, pa.string()),
            "ddf": pa.array([ddf_counts[t] for t in terms_sorted],
                            pa.int64()),
        }), os.path.join(out_dir, ddf_name))
        stats.update({"tombstones_file": tomb_name,
                      "n_tombstones": len(allt),
                      "deleted_df_file": ddf_name})
    write_stats(out_dir, stats)  # COMMIT POINT — index readable from here
    from .query import write_seg_bucket_map

    write_seg_bucket_map(out_dir)  # post-commit polish: readers prune cold
    return stats


_COMPACT_DOCLENS_CACHE: dict[tuple[str, int], object] = {}


def _doclens_for_shard(docs_dir: str, shard: int, gen: int = 0):
    """Per-worker-process cache of shard-pruned doclens lookups (compact
    tasks see few shards each; cap keeps worker heap bounded). ``gen``
    (the sharding generation, = num_shards in use) keys the cache so a
    reshard's rewritten docs table never collides with entries cached
    under the previous shard layout in the same worker process."""
    key = (docs_dir, shard, gen)
    hit = _COMPACT_DOCLENS_CACHE.get(key)
    if hit is None:
        from .query import _DocLens

        if len(_COMPACT_DOCLENS_CACHE) >= 8:
            _COMPACT_DOCLENS_CACHE.pop(next(iter(_COMPACT_DOCLENS_CACHE)))
        hit = _DocLens(docs_dir, [shard])
        _COMPACT_DOCLENS_CACHE[key] = hit
    return hit


def compact_index(index_dir: str, term_buckets: int = 32,
                  num_shards: int | None = None) -> dict:
    """Segment-merge compaction: decode every (term, shard) posting row,
    re-group, and re-encode exactly ONE row per (term, shard) under the
    index's CURRENT global stats, then clear ``stats["appended"]`` —
    restoring wand/bmax pruning eligibility after appends (whose
    pre-append rows carry block-max bounds encoded against a stale
    avgdl). The compacted index is bitwise equal to a from-scratch
    rebuild of the same corpus (tested).

    ``num_shards``: RESHARD while compacting — the cluster-growth op: a
    64-shard index built for 8 nodes re-shards to 1024 for 128 nodes
    with one compaction's cost, no re-tokenize. Posting shards are
    reassigned per doc (``shard_of(doc_id, S_new)``), the docs table is
    rewritten FIRST (new shard column — the encode's doc_len lookups
    read it shard-pruned), and stats.num_shards lands with the final
    write. Resharded == built-at-S_new bitwise (tested). The
    single-process engine stays correct at every crash point (scoring
    never reads docs.shard); re-open ShardedQueryEngine pools after.

    Ray pipeline (the checkpoint build's staged-spill pattern, not a
    sort-groupby — the native groupby(gkey) sort measured SLOWER than a
    full rebuild at 2M docs/256 shards): segment-file tasks decode rows
    to postings (one batched varint decode per task) and write
    (shard, term)-sorted staged parquet with shard-aligned row groups;
    batched per-shard tasks then read their own row groups (predicate
    pushdown), join doc_len from the shard-pruned docs table (cached
    per worker), and encode ONE segment file per shard — the build's
    exact output layout. Temp dir → swap. ``term_buckets`` is accepted
    for API compatibility; task granularity is now files/shards per
    task. Output segment rows are bitwise identical to the previous
    pipeline's (encoder sorts internally; tested vs rebuild)."""
    import shutil

    import numpy as np
    import pandas as pd

    from .build import load_stats
    from .codec import (
        decode_doc_ids,
        decode_positions,
        decode_tfs,
        encode_position_lists,
    )
    from .schema import shard_of

    recover_appends(index_dir)
    recover_purges(index_dir)
    stats = load_stats(index_dir)
    store_positions = bool(stats.get("store_positions"))
    avgdl = float(stats["avgdl"])
    k1, b = float(stats["k1"]), float(stats["b"])
    block_size = int(stats["block_size"])
    s_old = int(stats["num_shards"])
    s_new = int(num_shards) if num_shards else s_old
    reshard = s_new != s_old
    segments_dir = os.path.join(index_dir, "segments")
    docs_dir = os.path.join(index_dir, "docs")
    # tombstone purge: compaction drops deleted docs' postings AND doc
    # rows physically; the sorted id set rides each explode closure
    # (delete sets are tiny next to the corpus; ray.put it at 10⁸+)
    tomb = load_tombstones(index_dir, stats)

    def _alive(ids: np.ndarray) -> np.ndarray:
        if len(tomb) == 0:
            return np.ones(len(ids), dtype=bool)
        j = np.searchsorted(tomb, ids)
        j = np.minimum(j, len(tomb) - 1)
        return tomb[j] != ids

    def explode(batch: pa.Table) -> pa.Table:
        terms_u = batch["term"].to_pylist()
        bucket_u = (pd.util.hash_array(np.asarray(terms_u, dtype=object))
                    % np.uint64(term_buckets)).astype(np.int64)
        # bulk-extract once: per-row ChunkedArray[i].as_py() costs ~0.2ms
        # of overhead each, which dominates when segment rows are small
        # (fine sharding × small vocab — measured 243 s → 31 s on the
        # 2M-doc/256-shard compact)
        shards_l = batch["shard"].to_pylist()
        docids_l = batch["doc_ids"].to_pylist()
        tfs_l = batch["tfs"].to_pylist()
        pos_l = batch["positions"].to_pylist() if store_positions else None
        t_out, d_out, tf_out, sh_out, gk_out = [], [], [], [], []
        pos_out: list[bytes] = []
        if not store_positions and batch.num_rows:
            # fully vectorized path: ONE batched varint decode for the
            # whole segments batch (per-row numpy fixed cost dominates
            # when rows are small — fine sharding × small vocab;
            # measured 30× on 50k tiny rows), then flat filters/repeats
            from .codec import decode_doc_ids_batch, decode_tfs_batch

            ids_f, offs = decode_doc_ids_batch(docids_l, block_size)
            tfs_f, _ = decode_tfs_batch(tfs_l)
            sizes = np.diff(offs)
            row_idx = np.repeat(np.arange(batch.num_rows), sizes)
            if len(tomb):
                keep = _alive(ids_f)
                ids_f, tfs_f, row_idx = ids_f[keep], tfs_f[keep], row_idx[keep]
            if reshard:
                sh = shard_of(ids_f, s_new).astype(np.int32)
            else:
                sh = np.asarray(shards_l, dtype=np.int32)[row_idx]
            gk = sh.astype(np.int64) * term_buckets + bucket_u[row_idx]
            return pa.table({
                "term": pa.array(
                    np.asarray(terms_u, dtype=object)[row_idx], pa.string()),
                "doc_id": ids_f.astype(np.int64),
                "tf": tfs_f.astype(np.int64),
                "shard": sh,
                "gkey": gk,
            })
        for i in range(batch.num_rows):
            shard = shards_l[i]
            ids = decode_doc_ids(docids_l[i], block_size)
            tfs = decode_tfs(tfs_l[i])
            blobs = None
            if store_positions:
                # segment blob → flat absolute positions → re-split into
                # per-doc blobs (identity round-trip: varint/gap encode is
                # deterministic), so the shuffle rows carry the same
                # ``pos`` column the positional build emits
                tfs64 = tfs.astype(np.int64)
                flat = decode_positions(pos_l[i], tfs64)
                ends_d = np.cumsum(tfs64)
                blobs = encode_position_lists(flat, ends_d - tfs64, ends_d)
            if len(tomb):
                keep = _alive(ids)
                ids, tfs = ids[keep], tfs[keep]
                if blobs is not None:
                    blobs = [bl for bl, k in zip(blobs, keep) if k]
            n = len(ids)
            if n == 0:
                continue
            t_out.append(np.full(n, terms_u[i], dtype=object))
            d_out.append(ids)
            tf_out.append(tfs)
            if reshard:
                # shard reassignment happens here, per posting — the
                # groupby below then merges postings from several old
                # rows into each new (term, shard) group
                sh = shard_of(ids, s_new).astype(np.int32)
            else:
                sh = np.full(n, shard, dtype=np.int32)
            sh_out.append(sh)
            gk_out.append(sh.astype(np.int64) * term_buckets + bucket_u[i])
            if blobs is not None:
                pos_out.extend(blobs)
        if not t_out:
            cols = {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "shard": pa.array([], pa.int32()),
                "gkey": pa.array([], pa.int64()),
            }
            if store_positions:
                cols["pos"] = pa.array([], pa.binary())
            return pa.table(cols)
        cols = {
            "term": pa.array(np.concatenate(t_out), pa.string()),
            "doc_id": np.concatenate(d_out).astype(np.int64),
            "tf": np.concatenate(tf_out).astype(np.int64),
            "shard": np.concatenate(sh_out),
            "gkey": np.concatenate(gk_out),
        }
        if store_positions:
            cols["pos"] = pa.array(pos_out, pa.binary())
        return pa.table(cols)

    encoder = SegmentEncoder(avgdl=avgdl, k1=k1, b=b, block_size=block_size)

    recover_segments(index_dir)  # heal any half-finished prior swap first

    if reshard:
        # docs table FIRST: the encode below reads doc_lens shard-pruned
        # by the NEW shard column (and the rewrite folds the tombstone
        # drop in). Crash between here and the final stats write leaves
        # a fully-correct single-process index (scoring never reads
        # docs.shard); re-running compact_index(num_shards=...) heals.
        docs_tmp = docs_dir + ".compact"
        shutil.rmtree(docs_tmp, ignore_errors=True)

        def rewrite_docs(bt: pa.Table) -> pa.Table:
            ids = np.asarray(bt["doc_id"].combine_chunks()).astype(np.int64)
            if len(tomb):
                keep = _alive(ids)
                bt = bt.filter(pa.array(keep))
                ids = ids[keep]
            i = bt.column_names.index("shard")
            return bt.set_column(i, "shard",
                                 pa.array(shard_of(ids, s_new), pa.int32()))

        (rd.read_parquet(docs_dir)
         .map_batches(rewrite_docs, batch_format="pyarrow")
         .write_parquet(docs_tmp))
        docs_old = docs_dir + ".old"
        shutil.rmtree(docs_old, ignore_errors=True)
        os.rename(docs_dir, docs_old)
        try:
            os.rename(docs_tmp, docs_dir)
        except OSError:
            os.rename(docs_old, docs_dir)
            raise
        shutil.rmtree(docs_old)

    # ---- staged-spill re-encode (the checkpoint build's shard-phase
    # pattern, NOT a sort-based groupby: the native groupby(gkey) sort
    # over the exploded postings measured 117 s vs the monolithic
    # build's 76 s at 2M docs/256 shards — explicit staging with
    # shard-aligned row groups + batched per-shard encode replaces it).
    # Phase 1: one task per group of segment files explodes rows to
    # postings, sorts by (shard, term) and writes a staged parquet file
    # whose row groups align to shard boundaries (pruned reads).
    # Phase 2: batched shard tasks (one combined scan each) join
    # doc_len from the shard-pruned docs table and encode one segment
    # file per shard — exactly the build's layout.
    from .state.manifest import atomic_write_parquet

    stage_dir = os.path.join(index_dir, "stage", "compact-postings")
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)
    seg_files = sorted(
        os.path.join(segments_dir, f) for f in os.listdir(segments_dir)
        if f.endswith(".parquet"))
    files_per_task = max(1, len(seg_files) // 64)
    units = [{"files": seg_files[i:i + files_per_task],
              "out": os.path.join(stage_dir, f"part-{i//files_per_task:05d}.parquet")}
             for i in range(0, len(seg_files), files_per_task)]

    def run_explode(b: pa.Table) -> pa.Table:
        pa.set_cpu_count(1)
        done = []
        for u in b.to_pylist():
            t = pq.read_table(u["files"], use_threads=False)
            postings = explode(t)
            if postings.num_rows:
                postings = postings.sort_by(
                    [("shard", "ascending"), ("term", "ascending")])
                import numpy as _np

                sc = _np.asarray(postings["shard"].combine_chunks())
                bounds = (_np.flatnonzero(_np.diff(sc)) + 1).tolist()
                atomic_write_parquet(postings, u["out"],
                                     row_group_boundaries=bounds)
            done.append(u["out"])
        return pa.table({"out": pa.array(done, pa.string())})

    (rd.from_items(units)
     .map_batches(run_explode, batch_size=1, batch_format="pyarrow",
                  concurrency=16)
     .take_all())

    tmp = segments_dir + ".compact"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    shard_units = [{"shard": k,
                    "seg_path": os.path.join(tmp, f"shard-{k:05d}.parquet")}
                   for k in range(s_new)]
    shards_per_task = max(1, s_new // 64)

    def run_encode(b: pa.Table) -> pa.Table:
        pa.set_cpu_count(1)
        import numpy as _np
        import pyarrow.dataset as _pads

        us = b.to_pylist()
        shards = [u["shard"] for u in us]
        dset = _pads.dataset(stage_dir, format="parquet")
        table = dset.scanner(filter=_pads.field("shard").isin(shards),
                             use_threads=False).to_table()
        sc = table["shard"].to_numpy() if table.num_rows else None
        outs = []
        for u in us:
            sub = (table.take(_np.flatnonzero(sc == u["shard"]))
                   if table.num_rows else table)
            if sub.num_rows:
                ids = _np.asarray(sub["doc_id"].combine_chunks()).astype(_np.int64)
                dls = _doclens_for_shard(docs_dir, u["shard"], s_new).lookup(ids)
                sub = sub.append_column("doc_len",
                                        pa.array(dls.astype(_np.int64)))
                seg_table = encoder(sub)
            else:
                from .build import _empty_segments_table

                seg_table = _empty_segments_table(store_positions)
            # term-sorted rows + small row groups → parquet term-range
            # stats prune cold reads (same as the checkpoint build)
            atomic_write_parquet(
                seg_table, u["seg_path"],
                row_group_boundaries=list(range(64, seg_table.num_rows,
                                                64)))
            outs.append(u["seg_path"])
        return pa.table({"out": pa.array(outs, pa.string())})

    empty_stage = not any(f.endswith(".parquet")
                          for f in os.listdir(stage_dir))
    if empty_stage:
        # corpus fully tombstoned / empty: emit empty shard files
        from .build import _empty_segments_table

        for u in shard_units:
            atomic_write_parquet(_empty_segments_table(store_positions),
                                 u["seg_path"])
    else:
        (rd.from_items(shard_units)
         .map_batches(run_encode, batch_size=shards_per_task,
                      batch_format="pyarrow", concurrency=16)
         .take_all())
    shutil.rmtree(stage_dir, ignore_errors=True)
    old = segments_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(segments_dir, old)
    try:
        os.rename(tmp, segments_dir)
    except OSError:
        os.rename(old, segments_dir)  # restore — index stays readable
        raise
    shutil.rmtree(old)

    from .build import write_stats

    if stats.pop("deleted_df_file", None) is not None:
        # The segments swap just purged tombstoned postings, so segment
        # dfs are already corrected — a stats.json still pointing at the
        # deleted-df sidecar would make every engine opened in this
        # window subtract the correction AGAIN (double subtraction →
        # inflated idf), and no recovery path re-runs compaction for us.
        # Drop the pointer atomically NOW; tombstones_file stays until
        # the docs swap below so doc-store masking keeps hiding rows the
        # docs table still physically holds (masking alive postings is a
        # no-op). A crash anywhere after this point leaves correct
        # scoring; re-running compact_index is idempotent.
        write_stats(index_dir, stats)

    if len(tomb) and not reshard:
        # rewrite the docs table without the tombstoned rows (same
        # .compact → .old swap; recover_segments heals docs/ too).
        # (a reshard already rewrote docs, tombstone drop folded in)
        # Ordering keeps every crash point consistent: segments are
        # already purged, but stats still carries tombstones_file until
        # the final write, so engines keep masking (a no-op once purged)
        docs_tmp = docs_dir + ".compact"
        shutil.rmtree(docs_tmp, ignore_errors=True)

        def drop_deleted(b: pa.Table) -> pa.Table:
            ids = np.asarray(b["doc_id"].combine_chunks()).astype(np.int64)
            return b.filter(pa.array(_alive(ids)))

        (rd.read_parquet(docs_dir)
         .map_batches(drop_deleted, batch_format="pyarrow")
         .write_parquet(docs_tmp))
        docs_old = docs_dir + ".old"
        shutil.rmtree(docs_old, ignore_errors=True)
        os.rename(docs_dir, docs_old)
        try:
            os.rename(docs_tmp, docs_dir)
        except OSError:
            os.rename(docs_old, docs_dir)
            raise
        shutil.rmtree(docs_old)

    from .checkpoint import _write_term_dict

    term_dict_dir = os.path.join(index_dir, "term_dict")
    shutil.rmtree(term_dict_dir, ignore_errors=True)
    _write_term_dict(segments_dir, term_dict_dir)

    stats["appended"] = False
    stats["num_shards"] = s_new  # reshard commit rides the final write
    tomb_file = stats.pop("tombstones_file", None)
    stats.pop("n_tombstones", None)
    write_stats(index_dir, stats)
    if tomb_file:  # purge complete: drop every delete artifact
        for name in os.listdir(index_dir):
            if name.startswith(("tombstones-", "deleted-df-")):
                os.remove(os.path.join(index_dir, name))
    from .query import write_seg_bucket_map

    write_seg_bucket_map(index_dir)  # compaction replaced every file
    return stats


def fold_bulk_ops(ops: list[dict], alive: set, id_col: str
                  ) -> tuple[list[dict], dict]:
    """The pure sequential fold behind bulk_apply (ES per-item result
    contract): given the initially-alive id set, walk the batch in
    order tracking per-id liveness, and return (per-item results,
    final per-id effect) where the effect is the doc dict to write or
    None for delete — the LAST successful action per id wins. Separated
    from the I/O so the contract is property-testable against a
    sequential one-op-at-a-time simulator."""
    items: list[dict] = []
    final: dict[int, dict | None] = {}  # id → doc (write) | None (del)

    def cur_alive(did: int) -> bool:
        if did in final:
            return final[did] is not None
        return did in alive

    for i, op in enumerate(ops):
        action = op["op"]
        did = int(op[id_col])
        if action == "create":
            if cur_alive(did):
                items.append({"item": i, "op": action, "id": did,
                              "result": "conflict"})
                continue
            final[did] = {k: v for k, v in op.items() if k != "op"}
            items.append({"item": i, "op": action, "id": did,
                          "result": "created"})
        elif action == "index":
            res = "updated" if cur_alive(did) else "created"
            final[did] = {k: v for k, v in op.items() if k != "op"}
            items.append({"item": i, "op": action, "id": did,
                          "result": res})
        elif action == "update":
            if not cur_alive(did):
                items.append({"item": i, "op": action, "id": did,
                              "result": "document_missing"})
                continue
            final[did] = {k: v for k, v in op.items() if k != "op"}
            items.append({"item": i, "op": action, "id": did,
                          "result": "updated"})
        elif action == "delete":
            res = "deleted" if cur_alive(did) else "not_found"
            final[did] = None
            items.append({"item": i, "op": action, "id": did,
                          "result": res})
        else:
            raise ValueError(f"unknown bulk op {action!r}")
    return items, final


def bulk_apply(index_dir: str, ops: list[dict]) -> dict:
    """ES ``_bulk`` analog: ONE mixed batch of actions —
    ``{"op": "index"|"create"|"update"|"delete", <id_col>: id, ...doc
    fields}`` — applied to a live index with the ES per-item result
    contract. Actions fold SEQUENTIALLY per id against the index's
    alive set ("create" after an in-batch "delete" of the same id
    succeeds; "create" on an alive id is a per-item ``conflict`` that
    does NOT abort the batch — the ES 409 item result; "update"
    requires the doc to exist and replaces it whole — stored fields
    are full documents here; "delete" of a missing id reports
    ``not_found`` and is a no-op). The net effect then applies as ONE
    delete_from_index + ONE upsert_to_index — the MERGE-batch shape: a
    bulk request is client-bounded by definition, so the per-item fold
    is driver-side, while the delete/purge/append legs stay the proven
    distributed paths. NOT atomic (neither is ES's _bulk): a crash
    between the delete and upsert legs leaves deletes applied and
    writes missing — RE-RUNNING the same batch converges to the
    crash-free final state (pytest-pinned; per-item results may
    differ, e.g. an already-applied delete reports not_found).
    Returns {"items": per-item results, "stats": final index
    stats}."""
    from .build import load_stats

    recover_segments(index_dir)
    recover_appends(index_dir)
    recover_purges(index_dir)
    stats = load_stats(index_dir)
    id_col = stats.get("id_col") or None
    if id_col is None:
        raise ValueError(
            "bulk_apply needs an explicit-id index (built with "
            "id_col=...): derived-id indexes would need every op to "
            "carry the key_cols — route those through "
            "delete_from_index / upsert_to_index directly")
    batch_ids = sorted({int(o[id_col]) for o in ops})
    docs_dir = os.path.join(index_dir, "docs")
    present = pq.read_table(docs_dir, columns=["doc_id"],
                            filters=[("doc_id", "in", batch_ids)])
    tombs = set(np.asarray(load_tombstones(index_dir, stats)).tolist())
    alive = set(np.asarray(present["doc_id"].combine_chunks())
                .astype(np.int64).tolist()) - tombs

    items, final = fold_bulk_ops(ops, alive, id_col)
    del_ids = [d for d, v in final.items() if v is None and d in alive]
    writes = [v for v in final.values() if v is not None]
    if del_ids:
        delete_from_index(index_dir, del_ids)
    if writes:
        upsert_to_index(rd.from_arrow(pa.Table.from_pylist(writes)),
                        index_dir)
    return {"items": items, "stats": load_stats(index_dir)}
