"""Bloom-filter semi-join: keep the large side's rows whose key appears
in a key set, EXACTLY, while keeping the large side shuffle-free.

Scale shape (the reason this exists at 100 TB): the key side is reduced
to a FIXED-SIZE bit array — one streaming pass emits a per-block partial
bitmap (``m_bits/8`` bytes each, independent of key count), OR-merged
into one filter and broadcast once via ``ray.put``. The large side then
streams through a vectorized membership test (double hashing, k probes,
no Python loop). The bloom pass is a PRUNE — false positives possible,
never false negatives — so exactness comes from a verify stage over the
SURVIVORS only:

- ``verify="broadcast"``: the distinct keys fit one worker → broadcast
  the sorted unique key array and ``searchsorted`` (the bloom pass is
  then pure shuffle-volume insurance);
- ``verify="join"``: bucketed hash semi-join of survivors against the
  distinct keys — the shuffle carries only bloom survivors instead of
  every large-side row, which is the whole point of the pattern;
- ``verify="auto"``: routes by the key side's row count.

Membership semantics match SQL ``WHERE key IN (SELECT ...)`` for
non-null int64 keys (the engine's id convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

# two independent 64-bit hash streams for double hashing (Kirsch &
# Mitzenmacher 2006: g_i = h1 + i*h2 preserves the bloom FP bound)
_KEY1 = "0123456789123456"
_KEY2 = "fedcba9876543210"

# keys-side row count above which auto-verify switches from a broadcast
# exact set to the bucketed semi-join (the broadcast array is 8 B/key)
BROADCAST_KEY_LIMIT = 2_000_000


def _hashes(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) array of bit positions for each key (vectorized)."""
    h1 = pd.util.hash_array(keys, hash_key=_KEY1)
    h2 = pd.util.hash_array(keys, hash_key=_KEY2)
    # force h2 odd so strides cycle the full table even when m is a
    # power of two
    h2 = h2 | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits))


_TREE_FANIN = 8
_TREE_THRESHOLD = 64  # blocks; below this the driver OR is cheaper


@ray.remote
def _or_bitmap_blocks(m_bytes: int, *tables: pa.Table) -> pa.Table:
    out = np.zeros(m_bytes, dtype=np.uint8)
    for t in tables:
        # empty input blocks skip the partial UDF and keep the source
        # schema — they carry no bitmap
        if "bm" not in t.column_names:
            continue
        for buf in t["bm"].to_pylist():
            out |= np.frombuffer(buf, dtype=np.uint8)
    return pa.table({"bm": pa.array([out.tobytes()], pa.binary())})


def build_bloom(keys: Dataset, on: str, m_bits: int = 1 << 20,
                k: int = 4) -> np.ndarray:
    """One streaming pass over the key column → packed uint8 bitmap of
    ``m_bits`` bits. Per-block partials are ``m_bits/8`` bytes each and
    OR-merge associatively: few blocks merge on the driver; above
    ``_TREE_THRESHOLD`` blocks a fan-in-8 tree of Ray tasks reduces
    them, so driver work stays O(m/8) no matter how many blocks the
    key side ships."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")

    def partial(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[on].combine_chunks()).astype(np.int64)
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        if len(ks):
            pos = _hashes(ks, m_bits, k).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    parts = keys.map_batches(partial, batch_format="pyarrow")
    refs = list(parts.to_arrow_refs())
    while len(refs) > _TREE_THRESHOLD:
        refs = [_or_bitmap_blocks.remote(m_bits // 8,
                                         *refs[i:i + _TREE_FANIN])
                for i in range(0, len(refs), _TREE_FANIN)]
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for t in ray.get(refs):
        if "bm" not in t.column_names:
            continue  # empty block skipped the partial UDF
        for buf in t["bm"].to_pylist():
            out |= np.frombuffer(buf, dtype=np.uint8)
    return out


def _bloom_filter_stage(large: Dataset, on: str, bitmap: np.ndarray,
                        m_bits: int, k: int) -> Dataset:
    ref = ray.put(bitmap)

    def test(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch[on].combine_chunks()).astype(np.int64)
        if not len(ks):
            return batch
        bm = ray.get(ref)
        pos = _hashes(ks, m_bits, k)
        hit = np.ones(len(ks), dtype=bool)
        for j in range(k):
            p = pos[j]
            byte = bm[(p >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return batch.filter(pa.array(hit))

    return large.map_batches(test, batch_format="pyarrow")


def _distinct_keys(keys: Dataset, on: str) -> Dataset:
    """Distinct key values with map-side dedup: the shuffle carries at
    most one row per distinct key per batch."""
    def uniq(batch: pa.Table) -> pa.Table:
        ks = np.unique(np.asarray(batch[on].combine_chunks())
                       .astype(np.int64))
        return pa.table({on: pa.array(ks, pa.int64())})

    from ray.data.aggregate import Count

    return (keys.map_batches(uniq, batch_format="pyarrow")
            .groupby(on).aggregate(Count(alias_name="__n"))
            .drop_columns(["__n"]))


def bloom_semi_join(large: Dataset, keys: Dataset, on: str,
                    m_bits: int = 1 << 20, k: int = 4,
                    verify: str = "auto",
                    num_buckets: int = 32) -> Dataset:
    """Exact semi-join: ``large`` rows whose ``on`` value appears in
    ``keys``. Output columns = ``large``'s columns, unchanged."""
    if verify == "auto":
        verify = ("broadcast" if keys.count() <= BROADCAST_KEY_LIMIT
                  else "join")
    if verify == "broadcast":
        kdf = keys.select_columns([on]).to_pandas()
        # an empty Dataset's to_pandas() drops the schema entirely
        kvals = (kdf[on].to_numpy() if on in kdf.columns
                 else np.array([], dtype=np.int64))
        arr = np.unique(np.asarray(kvals).astype(np.int64))
        ref = ray.put(arr)

        def member(batch: pa.Table) -> pa.Table:
            ks = np.asarray(batch[on].combine_chunks()).astype(np.int64)
            a = ray.get(ref)
            idx = np.searchsorted(a, ks)
            idx[idx >= len(a)] = 0
            hit = (a[idx] == ks) if len(a) else np.zeros(len(ks), bool)
            return batch.filter(pa.array(hit))

        return large.map_batches(member, batch_format="pyarrow")
    if verify != "join":
        raise ValueError(f"unknown verify mode {verify!r}")
    bitmap = build_bloom(keys, on, m_bits, k)
    if not bitmap.any():
        # empty key side (its Dataset would also have no schema, which
        # the bucketed join can't unify) — semi-join result is empty
        return large.limit(0)
    pruned = _bloom_filter_stage(large, on, bitmap, m_bits, k)
    from .joins import hash_join

    return hash_join(pruned, _distinct_keys(keys, on), on=on,
                     how="inner", num_buckets=num_buckets)


def _bucketed_anti(large: Dataset, keys: Dataset, on: str,
                   num_buckets: int) -> Dataset:
    """Bucketed exact anti-join: large rows whose key has NO match in
    keys. Both sides shuffle by key hash; each bucket drops matches
    vectorized (np.isin against the bucket's key set)."""
    lsch = large.schema()
    unified = list(zip(lsch.names, lsch.types))
    out_cols = list(lsch.names)

    from .joins import _pd_dtype, _tag_and_bucket

    # key-side rows are null-padded to the unified schema, which
    # promotes the bucket frame's int columns to float — restore the
    # large side's dtypes on the way out (values are non-null there)
    exp_dtypes = {name: _pd_dtype(typ) for name, typ in unified}

    tagged = _tag_and_bucket(large, on, "l", num_buckets, unified).union(
        _tag_and_bucket(keys.select_columns([on]), on, "r", num_buckets,
                        unified))

    def drop_matches(g: "pd.DataFrame") -> "pd.DataFrame":
        l = g[g["__side"] == "l"]
        r_keys = g.loc[g["__side"] == "r", on].to_numpy()
        keep = ~np.isin(l[on].to_numpy(), r_keys)
        out = l.loc[keep, out_cols]
        casts = {c: exp_dtypes[c] for c in out_cols
                 if out[c].dtype != exp_dtypes[c]}
        return out.astype(casts) if casts else out

    return tagged.groupby("__bucket").map_groups(drop_matches,
                                                 batch_format="pandas")


def bloom_anti_join(large: Dataset, keys: Dataset, on: str,
                    m_bits: int = 1 << 20, k: int = 4,
                    verify: str = "auto",
                    num_buckets: int = 32) -> Dataset:
    """Exact anti-join (SQL ``NOT IN`` over non-null keys): ``large``
    rows whose ``on`` value does NOT appear in ``keys``.

    The bloom inverts cleanly: a row that MISSES the filter is
    *guaranteed* a non-member (no false negatives) and is kept without
    ever entering a shuffle; only bloom HITS — true members plus the
    small false-positive band — need the exact bucketed check. At 100 TB
    the verify shuffle carries ~|matches| rows, not |large|."""
    if verify == "auto":
        verify = ("broadcast" if keys.count() <= BROADCAST_KEY_LIMIT
                  else "join")
    if verify == "broadcast":
        kdf = keys.select_columns([on]).to_pandas()
        kvals = (kdf[on].to_numpy() if on in kdf.columns
                 else np.array([], dtype=np.int64))
        arr = np.unique(np.asarray(kvals).astype(np.int64))
        ref = ray.put(arr)

        def nonmember(batch: pa.Table) -> pa.Table:
            ks = np.asarray(batch[on].combine_chunks()).astype(np.int64)
            a = ray.get(ref)
            if not len(a):
                return batch
            idx = np.searchsorted(a, ks)
            idx[idx >= len(a)] = 0
            return batch.filter(pa.array(a[idx] != ks))

        return large.map_batches(nonmember, batch_format="pyarrow")
    if verify != "join":
        raise ValueError(f"unknown verify mode {verify!r}")
    bitmap = build_bloom(keys, on, m_bits, k)
    if not bitmap.any():
        return large  # empty key side: nothing excluded
    ref = ray.put(bitmap)

    def split(batch: pa.Table, want_hit: bool) -> pa.Table:
        ks = np.asarray(batch[on].combine_chunks()).astype(np.int64)
        if not len(ks):
            return batch
        bm = ray.get(ref)
        pos = _hashes(ks, m_bits, k)
        hit = np.ones(len(ks), dtype=bool)
        for j in range(k):
            p = pos[j]
            byte = bm[(p >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (p & np.uint64(7)).astype(np.uint8)) & 1 == 1
        return batch.filter(pa.array(hit if want_hit else ~hit))

    misses = large.map_batches(lambda b: split(b, False),
                               batch_format="pyarrow")
    hits = large.map_batches(lambda b: split(b, True),
                             batch_format="pyarrow")
    survivors = _bucketed_anti(hits, keys, on, num_buckets)
    return misses.union(survivors)
