"""Binary quantization (sign-bit) embedding compression + Hamming ANN.

A d-dim float vector compresses 32×/64-per-word to ``ceil(d/32)`` int64
words of sign bits (bit j of word w = 1 iff v[32w+j] >= 0.0 — the sign
test is float-EXACT, so Ray and the DuckDB mirror agree bit for bit,
unlike any dot-product surface). Hamming distance over the packed bits
is the standard integer proxy for angular distance on centered
embeddings (Charikar 2002 SimHash for dense vectors; faiss
IndexBinaryFlat): P[bit differs] = angle/π. Two-stage retrieval —
Hamming shortlist, exact cosine re-rank of the survivors — is the
production recipe at scale (shortlist scans 16 bytes/vector instead of
256, re-rank touches only ``candidates`` rows).

Words are 32-bit-valued int64s (never negative) so the SQL mirror can
build them with plain ``sum(1 << j)`` and compare with
``bit_count(xor(lo, hi))`` — no two's-complement edge at bit 63.

Scale shape: packing is a stateless vectorized ``map_batches``; the
shortlist is a per-batch integer partial top-k (k rows leave each
batch) merged on the driver — O(batches·k) driver state; the re-rank
reads only candidate rows (broadcast id set, sorted membership probe).
Reference capability analog: the trained-encoder → compact code →
index pipeline (``models/*Autoencoder.py`` → hash index); this is the
modern quantized variant of the same idea.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .similarity import _emb_matrix

# byte-wise popcount LUT (numpy 1.26 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(a: np.ndarray) -> np.ndarray:
    """Per-element popcount of an int64/uint64 array (byte-LUT sum)."""
    a = np.ascontiguousarray(a, dtype=np.int64)
    if a.size == 0:
        return np.zeros(a.shape, dtype=np.int64)
    b = a.view(np.uint8).reshape(*a.shape, 8)
    return _POP8[b].sum(axis=-1).astype(np.int64)


def pack_signs(mat: np.ndarray) -> np.ndarray:
    """(n, d) float matrix → (n, ceil(d/32)) int64 sign-bit words.

    Word w bit j = 1 iff mat[:, 32w+j] >= 0.0 (tail bits of a ragged
    last word are 0). Each word holds 32 bits so values stay in
    [0, 2^32) — representable as non-negative BIGINTs on the SQL side.
    """
    n, d = mat.shape
    n_words = (d + 31) // 32
    bits = (mat >= 0.0)
    out = np.zeros((n, n_words), dtype=np.int64)
    pow2 = (np.int64(1) << np.arange(32, dtype=np.int64))
    for w in range(n_words):
        chunk = bits[:, 32 * w:32 * (w + 1)]
        out[:, w] = chunk @ pow2[: chunk.shape[1]]
    return out


def hamming_distances(codes: np.ndarray, q_code: np.ndarray) -> np.ndarray:
    """Row-wise Hamming distance between (n, W) packed codes and a
    (W,) query code — popcount of the per-word XOR, summed."""
    x = np.bitwise_xor(codes, q_code[None, :])
    return popcount64(x).sum(axis=1)


def binary_quantize(ds: Dataset, emb_col: str = "embedding",
                    id_col: str = "vec_id") -> Dataset:
    """Dataset of (id, w0, w1, ...): the packed sign-bit codes.

    A stateless vectorized transform — at 100 TB this is the one full
    pass that materializes the 32×-smaller code table next to the
    vectors (the shortlist then never touches the float column)."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "w0": pa.array([], pa.int64())})
        codes = pack_signs(_emb_matrix(batch, emb_col))
        cols = {id_col: pa.array(ids, pa.int64())}
        for w in range(codes.shape[1]):
            cols[f"w{w}"] = pa.array(codes[:, w], pa.int64())
        return pa.table(cols)

    return ds.map_batches(pack, batch_format="pyarrow")


def hamming_knn(ds: Dataset, query_vec: np.ndarray, k: int = 10,
                emb_col: str = "embedding", id_col: str = "vec_id"
                ) -> pa.Table:
    """Top-k nearest by Hamming distance over sign-bit codes, packing
    on the fly. Returns (vec_id, hamming, rank) ranked (hamming asc,
    id asc) — an all-integer surface, exactly reproducible in SQL.

    Per-batch partial top-k with deterministic tie-break: ties at the
    k-th distance inside a batch are resolved by id asc, and the
    driver merge re-sorts the O(batches·k) survivors the same way, so
    the global cut is exact."""
    q_code = pack_signs(np.asarray(query_vec, dtype=np.float64)[None, :])[0]
    q_ref = ray.put(q_code)

    def partial(batch: pa.Table) -> pa.Table:
        qc = ray.get(q_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        codes = pack_signs(_emb_matrix(batch, emb_col))
        dist = hamming_distances(codes, qc)
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "hamming": pa.array(dist[order], pa.int64())})

    cand = ds.map_batches(partial, batch_format="pyarrow").take_all()
    # driver merge over ≤ batches·k candidate rows (bounded, not data-
    # sized): final (hamming asc, id asc) cut
    ids = np.array([r[id_col] for r in cand], dtype=np.int64)
    dist = np.array([r["hamming"] for r in cand], dtype=np.int64)
    order = np.lexsort((ids, dist))[:k]
    return pa.table({
        id_col: pa.array(ids[order], pa.int64()),
        "hamming": pa.array(dist[order], pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
    })


def hamming_shortlist_rerank(ds: Dataset, query_vec: np.ndarray,
                             k: int = 10, candidates: int = 50,
                             emb_col: str = "embedding",
                             id_col: str = "vec_id") -> pa.Table:
    """Two-stage retrieval: Hamming top-``candidates`` shortlist over
    the sign-bit codes, then EXACT cosine re-rank of the shortlist.
    Returns (vec_id, sim_micros, rank) — knn_brute_force's output
    contract, restricted to the shortlist rows (broadcast id set,
    sorted membership probe; the float column is read only for
    candidate rows)."""
    from ..query import sorted_member_mask
    from .similarity import knn_brute_force

    short = hamming_knn(ds, query_vec, k=candidates,
                        emb_col=emb_col, id_col=id_col)
    cand_ids = np.sort(np.asarray(short[id_col]).astype(np.int64))
    ids_ref = ray.put(cand_ids)

    def keep(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return batch
        m = sorted_member_mask(cids, ids)
        return batch.filter(pa.array(m))

    sub = ds.map_batches(keep, batch_format="pyarrow")
    q2 = np.asarray(query_vec, dtype=np.float64)[None, :]
    out = knn_brute_force(sub, q2, k=k, emb_col=emb_col, id_col=id_col,
                          max_rows=None)
    return out.drop_columns(["query_id"])
