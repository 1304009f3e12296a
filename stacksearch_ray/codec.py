"""Posting-list compression: delta + varint, skip blocks, block-max metadata.

The reference's external-memory index spills sorted pickled blocks with a
sparse (offset, first_key) side index (/root/reference/index/hash_index.py:
112-139,165-195). Ours is the columnar, compressed analog: per (term, shard)
segment, doc ids are stored doc_id-sorted as LEB128 varints of within-block
deltas (the first value of each block is absolute, so any block decodes
independently), tfs as plain varints, with one skip entry per block of
``block_size`` postings carrying first_doc, byte offsets, and block-max
upper bounds for BM25 WAND pruning.

All encode/decode paths are NumPy-vectorized — no Python per-posting loops.

``block_max_score`` stores the idf-free part of the BM25 upper bound,
``max over block of (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl))``; the query
engine multiplies by the term's idf (global df is only known after the
per-shard merge, so idf cannot be baked in at encode time).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128
_GROUPS = 10  # max LEB128 bytes for a 64-bit value

BM25_K1 = 1.2
BM25_B = 0.75


def gather_ranges(begin: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Flat int64 indices covering [begin[i], end[i]) for every i, in
    order — the vectorized gather for slicing per-row spans out of a
    flat array without a Python loop (shared by the purge rewrite and
    the fielded-search token split)."""
    ln = (end - begin).astype(np.int64)
    tot = int(ln.sum())
    if tot == 0:
        return np.empty(0, np.int64)
    csum = np.concatenate(([0], np.cumsum(ln)[:-1]))
    return (np.repeat(begin.astype(np.int64), ln)
            + np.arange(tot, dtype=np.int64) - np.repeat(csum, ln))


def varint_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array. Returns (buffer, per-value byte counts)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    shifts = (np.arange(_GROUPS, dtype=np.uint64) * np.uint64(7))
    groups = ((v[:, None] >> shifts[None, :]) & np.uint64(0x7F)).astype(np.uint8)
    thresh = np.uint64(1) << shifts[1:]
    nbytes = 1 + (v[:, None] >= thresh[None, :]).sum(axis=1)
    j = np.arange(_GROUPS)
    mask = j[None, :] < nbytes[:, None]
    cont = j[None, :] < (nbytes[:, None] - 1)
    groups[cont] |= 0x80
    return groups[mask].tobytes(), nbytes.astype(np.int64)


def varint_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a LEB128 buffer into a uint64 array (vectorized reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    sizes = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, sizes)
    vals7 = (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    return np.add.reduceat(vals7, starts)


@dataclass
class EncodedSegment:
    df: int
    cf: int
    doc_ids: bytes
    tfs: bytes
    skip_first_doc: np.ndarray   # int64 per block
    skip_doc_offset: np.ndarray  # int32 byte offset into doc_ids per block
    skip_tf_offset: np.ndarray   # int32 byte offset into tfs per block
    block_max_tf: np.ndarray     # int64 per block
    block_max_score: np.ndarray  # float64 per block (idf-free upper bound)


def bm25_tf_part(tf: np.ndarray, doc_len: np.ndarray, avgdl: float,
                 k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    """(k1+1)*tf / (tf + k1*(1 - b + b*dl/avgdl)) as float64."""
    tf = tf.astype(np.float64)
    norm = k1 * (1.0 - b + b * (doc_len.astype(np.float64) / float(avgdl)))
    return (k1 + 1.0) * tf / (tf + norm)


def encode_segment(doc_ids: np.ndarray, tfs: np.ndarray, doc_lens: np.ndarray,
                   avgdl: float, k1: float = BM25_K1, b: float = BM25_B,
                   block_size: int = BLOCK_SIZE) -> EncodedSegment:
    """Encode one (term, shard) posting list. Inputs must be doc_id-sorted."""
    n = len(doc_ids)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    block_starts = np.arange(0, n, block_size, dtype=np.int64)
    # Within-block deltas; block-start positions hold absolute values.
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    deltas[block_starts] = doc_ids[block_starts].astype(np.uint64)
    id_buf, id_nbytes = varint_encode(deltas)
    tf_buf, tf_nbytes = varint_encode(tfs.astype(np.uint64))
    id_cum = np.concatenate(([0], np.cumsum(id_nbytes)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_nbytes)))
    # skip offsets are stored int32: a >2 GiB (term, shard) segment would
    # silently wrap and decode garbage — fail loudly instead (reachable
    # only with a misconfigured num_shards at very large scale; the fix
    # is more shards, which also bounds per-task memory)
    if id_cum[-1] >= 2**31 or tf_cum[-1] >= 2**31:
        raise ValueError(
            f"encoded segment exceeds int32 offset range "
            f"({int(id_cum[-1])}/{int(tf_cum[-1])} bytes, df={n}); "
            f"increase num_shards so per-(term,shard) postings shrink")
    scores = bm25_tf_part(tfs, doc_lens, avgdl, k1, b)
    if n:
        block_max_tf = np.maximum.reduceat(tfs, block_starts)
        block_max_score = np.maximum.reduceat(scores, block_starts)
        skip_first = doc_ids[block_starts]
    else:
        block_max_tf = np.zeros(0, dtype=np.int64)
        block_max_score = np.zeros(0, dtype=np.float64)
        skip_first = np.zeros(0, dtype=np.int64)
    return EncodedSegment(
        df=n,
        cf=int(tfs.sum()),
        doc_ids=id_buf,
        tfs=tf_buf,
        skip_first_doc=skip_first,
        skip_doc_offset=id_cum[block_starts].astype(np.int32),
        skip_tf_offset=tf_cum[block_starts].astype(np.int32),
        block_max_tf=block_max_tf.astype(np.int64),
        block_max_score=block_max_score.astype(np.float64),
    )


def decode_doc_ids(buf: bytes, block_size: int = BLOCK_SIZE) -> np.ndarray:
    """Decode a full doc_ids buffer back to absolute sorted int64 ids."""
    deltas = varint_decode(buf).astype(np.int64)
    n = len(deltas)
    if n == 0:
        return deltas
    cum = np.cumsum(deltas)
    block_starts = np.arange(0, n, block_size, dtype=np.int64)
    bases = np.empty(len(block_starts), dtype=np.int64)
    bases[0] = 0
    bases[1:] = cum[block_starts[1:] - 1]
    sizes = np.diff(np.concatenate((block_starts, [n])))
    return cum - np.repeat(bases, sizes)


def decode_tfs(buf: bytes) -> np.ndarray:
    return varint_decode(buf).astype(np.int64)


def varint_decode_batch(bufs: list[bytes]
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY standalone LEB128 buffers in ONE vectorized pass:
    concatenate, decode, split. Per-call numpy fixed cost (~40-90 µs)
    dominates when rows are small (fine sharding × small vocab), so
    compaction's per-segment-row decode uses this instead of one
    varint_decode call per row. Returns (values uint64, row_offsets
    int64 of length len(bufs)+1)."""
    n_rows = len(bufs)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n_rows)
    byte_offs = np.concatenate(([0], np.cumsum(lens)))
    b = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(len(ends), dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    sizes = ends - starts + 1
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, sizes)
    vals7 = ((b & np.uint8(0x7F)).astype(np.uint64)
             << (pos.astype(np.uint64) * np.uint64(7)))
    vals = np.add.reduceat(vals7, starts)
    # varints never span row buffers, so the count of value-terminators
    # below each row's byte boundary gives the row's value offset
    row_offsets = np.concatenate(
        ([0], np.searchsorted(ends, byte_offs[1:], side="left")))
    return vals, row_offsets


def decode_doc_ids_batch(bufs: list[bytes],
                         block_size: int = BLOCK_SIZE
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Batched ``decode_doc_ids``: (flat absolute ids, row_offsets).
    Every block start re-encodes the absolute id (the skip-block
    property), so the per-block base subtraction vectorizes across ALL
    rows at once: bases are the global-cumsum values just before each
    reset position. Row i's ids are flat[row_offsets[i]:
    row_offsets[i+1]], identical to decode_doc_ids(bufs[i])."""
    deltas, offs = varint_decode_batch(bufs)
    deltas = deltas.astype(np.int64)
    n = len(deltas)
    if n == 0:
        return deltas, offs
    cum = np.cumsum(deltas)
    sizes = np.diff(offs)
    nblocks = (sizes + block_size - 1) // block_size
    total_blocks = int(nblocks.sum())
    row_of_block = np.repeat(np.arange(len(sizes)), nblocks)
    blk_base = np.concatenate(([0], np.cumsum(nblocks)))[:-1]
    blk_in_row = np.arange(total_blocks) - np.repeat(blk_base, nblocks)
    reset_starts = offs[:-1][row_of_block] + blk_in_row * block_size
    row_ends = (offs[:-1] + sizes)[row_of_block]
    seg_sizes = np.minimum(reset_starts + block_size, row_ends) - reset_starts
    bases = np.where(reset_starts > 0,
                     cum[np.maximum(reset_starts - 1, 0)], 0)
    return cum - np.repeat(bases, seg_sizes), offs


def decode_tfs_batch(bufs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    vals, offs = varint_decode_batch(bufs)
    return vals.astype(np.int64), offs


def decode_block(seg_doc_ids: bytes, seg_tfs: bytes,
                 skip_doc_offset: np.ndarray, skip_tf_offset: np.ndarray,
                 block: int, n_postings: int,
                 block_size: int = BLOCK_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single skip block (ids absolute, tfs) without touching others."""
    n_blocks = len(skip_doc_offset)
    d_lo = int(skip_doc_offset[block])
    d_hi = int(skip_doc_offset[block + 1]) if block + 1 < n_blocks else len(seg_doc_ids)
    t_lo = int(skip_tf_offset[block])
    t_hi = int(skip_tf_offset[block + 1]) if block + 1 < n_blocks else len(seg_tfs)
    deltas = varint_decode(memoryview(seg_doc_ids)[d_lo:d_hi]).astype(np.int64)
    ids = np.cumsum(deltas)
    tfs = varint_decode(memoryview(seg_tfs)[t_lo:t_hi]).astype(np.int64)
    return ids, tfs


def encode_position_lists(pos_sorted: np.ndarray,
                          starts: np.ndarray,
                          ends: np.ndarray) -> list[bytes]:
    """Gap+varint encode per-group ascending position lists laid out
    contiguously in ``pos_sorted`` (group g = pos_sorted[starts[g]:
    ends[g]]). Each group's first value is ABSOLUTE so any group blob
    decodes independently; the whole stream is varint-encoded in ONE
    vectorized pass and split into per-group byte slices."""
    n = len(pos_sorted)
    if n == 0:
        return [b""] * len(starts)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = (pos_sorted[1:] - pos_sorted[:-1]).astype(np.uint64)
    gaps[starts] = pos_sorted[starts].astype(np.uint64)
    buf, nbytes = varint_encode(gaps)
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    return [bytes(buf[cum[s]:cum[e]]) for s, e in zip(starts, ends)]


def encode_position_lists_arrow(pos_sorted: np.ndarray,
                                starts: np.ndarray,
                                ends: np.ndarray) -> "pa.Array":
    """Zero-copy variant of ``encode_position_lists`` for CONTIGUOUS
    groups (``starts[0] == 0`` and ``starts[i+1] == ends[i]``, the
    layout np.unique produces): the varint stream is wrapped directly
    as a pyarrow BinaryArray through an offsets buffer — no per-group
    Python ``bytes`` (measured ~1/3 of the positional partition-phase
    overhead at 400k docs). Byte content is identical to the list
    variant (same varint stream, same split points)."""
    import pyarrow as pa

    n_groups = len(starts)
    if len(pos_sorted) == 0:
        return pa.array([b""] * n_groups, pa.binary())
    if n_groups == 0:
        return pa.array([], pa.binary())
    if starts[0] != 0 or (len(starts) > 1
                          and not np.array_equal(starts[1:], ends[:-1])):
        raise ValueError("encode_position_lists_arrow needs contiguous groups")
    n = len(pos_sorted)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[1:] = (pos_sorted[1:] - pos_sorted[:-1]).astype(np.uint64)
    gaps[starts] = pos_sorted[starts].astype(np.uint64)
    buf, nbytes = varint_encode(gaps)
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    total = int(cum[ends[-1]])
    if total >= 2**31:
        raise ValueError("position blob batch exceeds int32 offsets — "
                         "lower the build batch_size")
    offs = cum[np.concatenate((starts[:1], ends))].astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n_groups,
        [None, pa.py_buffer(np.ascontiguousarray(offs)),
         pa.py_buffer(np.ascontiguousarray(buf[:total]))])


def decode_positions(blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode a segment's concatenated position blob back to absolute
    positions (flat, aligned with the posting order: doc i's positions
    occupy the next tfs[i] slots). Pure vectorized: one varint decode +
    a segmented cumsum (offset subtraction at each doc start)."""
    gaps = varint_decode(blob).astype(np.int64)
    if len(gaps) == 0:
        return gaps
    starts = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    cs = np.cumsum(gaps)
    base = np.zeros(len(gaps), dtype=np.int64)
    # subtract the running total accumulated BEFORE each doc's first gap
    base[starts[1:]] = cs[starts[1:] - 1]
    np.maximum.accumulate(base, out=base)
    return cs - base
