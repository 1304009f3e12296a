"""Scalar quantization (SQ8) embedding compression + integer-L2 ANN.

The faiss ``IndexScalarQuantizer(QT_8bit)`` family: each dimension maps
linearly onto [0, 255] between the corpus's per-dimension min and max.
Everything here runs in INTEGER space — values enter as the repo's
canonical micros ints (floor(v·1e6+0.5), micros.py), the code is
``(vm - mn) * 255 // (mx - mn)`` (plain floor division), and the
shortlist metric is the exact integer squared L2 distance between code
vectors — so, like the sign-bit BQ sibling (bq.py), the candidate stage
is float-hazard-free and the DuckDB mirror reproduces it bitwise
(unlike any float-dot ANN surface). Two-stage retrieval (SQ shortlist →
exact cosine re-rank of survivors) is the production recipe: the
shortlist scans d bytes/vector instead of 8d, the re-rank touches only
candidate rows.

Scale shape: training is ONE pass of per-dimension (min, max) partials
(a d-row table per batch, driver folds O(batches·d) scalars); encoding
is a stateless vectorized ``map_batches``; the shortlist is a per-batch
integer partial top-k merged on the driver. At 100 TB the code table is
materialized once (8× smaller than float64 columns) and served from its
own files.

Reference capability analog: the trained-encoder → compact code → index
pipeline (``models/*Autoencoder.py`` → hash index), quantized variant —
same lineage as bq.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..micros import to_micros
from .similarity import _emb_matrix


def _emb_micros(batch: pa.Table, emb_col: str) -> np.ndarray:
    """(n, d) int64 micros matrix — the convention every SQ quantity
    derives from."""
    return to_micros(_emb_matrix(batch, emb_col))


def sq8_train(ds: Dataset, emb_col: str = "embedding") -> tuple[np.ndarray,
                                                                np.ndarray]:
    """Per-dimension (min, max) micros over the corpus — the SQ8
    quantizer. One streaming pass of d-row per-batch partials; the
    driver folds O(batches · d) scalars (never the vectors)."""
    def part(batch: pa.Table) -> pa.Table:
        m = _emb_micros(batch, emb_col)
        if m.shape[0] == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        return pa.table({
            "dim": np.arange(m.shape[1], dtype=np.int64),
            "mn": m.min(axis=0).astype(np.int64),
            "mx": m.max(axis=0).astype(np.int64),
        })

    t = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    g = t.groupby("dim", sort=True)
    return (g["mn"].min().to_numpy(np.int64),
            g["mx"].max().to_numpy(np.int64))


def sq8_encode(m_micros: np.ndarray, mn: np.ndarray, mx: np.ndarray,
               clamp: bool = False) -> np.ndarray:
    """Micros matrix → uint8-valued int64 codes: (vm - mn) * 255 //
    span, 0 where span == 0. ``clamp`` clips out-of-range values to
    [mn, mx] first (query-side; corpus values are in range by
    construction)."""
    v = np.clip(m_micros, mn, mx) if clamp else m_micros
    span = mx - mn
    safe = np.maximum(span, 1)
    code = (v - mn) * 255 // safe
    return np.where(span > 0, code, 0).astype(np.int64)


def sq8_knn(ds: Dataset, query_vec: np.ndarray, k: int = 10, *,
            mn: np.ndarray, mx: np.ndarray,
            emb_col: str = "embedding", id_col: str = "vec_id"
            ) -> pa.Table:
    """Top-k nearest by integer squared-L2 over SQ8 codes, encoding on
    the fly against the broadcast (mn, mx) quantizer. Returns
    (vec_id, d2, rank) ranked (d2 asc, id asc) — all-integer, exactly
    reproducible in SQL. Per-batch partial top-k with deterministic
    tie-break; the driver merge re-sorts O(batches·k) survivors."""
    qm = to_micros(np.asarray(query_vec, dtype=np.float64))[None, :]
    q_code = sq8_encode(qm, mn, mx, clamp=True)[0]
    ref = ray.put((mn, mx, q_code))

    def partial(batch: pa.Table) -> pa.Table:
        bmn, bmx, qc = ray.get(ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        codes = sq8_encode(_emb_micros(batch, emb_col), bmn, bmx)
        diff = codes - qc[None, :]
        d2 = (diff * diff).sum(axis=1)
        order = np.lexsort((ids, d2))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "d2": pa.array(d2[order], pa.int64())})

    t = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((t[id_col].to_numpy(), t["d2"].to_numpy()))[:k]
    out = t.iloc[order]
    return pa.table({
        id_col: pa.array(out[id_col].to_numpy(np.int64)),
        "d2": pa.array(out["d2"].to_numpy(np.int64)),
        "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
    })


def mrl_knn(ds: Dataset, query_vec: np.ndarray, k: int = 10, *,
            dims: int, id_col: str = "vec_id",
            emb_col: str = "embedding") -> pa.Table:
    """Matryoshka / truncated-dimension shortlist (MRL adaptive
    retrieval): rank by the EXACT integer dot product of the first
    ``dims`` micros components (Σ vmᵢ·qmᵢ — int64-exact at embedding
    scale, so unlike a float dot this surface is bitwise-oracled).
    Returns (vec_id, dot, rank) ranked (dot desc, id asc). The scale
    story: an MRL-trained model front-loads signal into the prefix
    dims, so the shortlist reads dims/d of every vector — the
    column-pruned first stage of adaptive retrieval."""
    qm = to_micros(np.asarray(query_vec, dtype=np.float64))[:dims]
    ref = ray.put(qm)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64())})
        vm = _emb_micros(batch, emb_col)[:, :dims]
        dot = vm @ q
        order = np.lexsort((ids, -dot))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "dot": pa.array(dot[order], pa.int64())})

    t = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((t[id_col].to_numpy(), -t["dot"].to_numpy()))[:k]
    out = t.iloc[order]
    return pa.table({
        id_col: pa.array(out[id_col].to_numpy(np.int64)),
        "dot": pa.array(out["dot"].to_numpy(np.int64)),
        "rank": pa.array(np.arange(1, len(out) + 1, dtype=np.int64)),
    })


def mrl_shortlist_rerank(ds: Dataset, query_vec: np.ndarray,
                         k: int = 10, candidates: int = 50, *,
                         dims: int, emb_col: str = "embedding",
                         id_col: str = "vec_id") -> pa.Table:
    """Two-stage MRL retrieval: truncated-dim integer-dot shortlist →
    EXACT full-dimension cosine re-rank of only those rows."""
    from ..query import sorted_member_mask
    from .similarity import knn_brute_force

    short = mrl_knn(ds, query_vec, k=candidates, dims=dims,
                    emb_col=emb_col, id_col=id_col)
    cand_ids = np.sort(np.asarray(short[id_col]).astype(np.int64))
    ids_ref = ray.put(cand_ids)

    def keep(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return batch
        return batch.filter(pa.array(sorted_member_mask(cids, ids)))

    sub = ds.map_batches(keep, batch_format="pyarrow")
    q2 = np.asarray(query_vec, dtype=np.float64)[None, :]
    out = knn_brute_force(sub, q2, k=k, emb_col=emb_col, id_col=id_col,
                          max_rows=None)
    return out.drop_columns(["query_id"])


def sq8_shortlist_rerank(ds: Dataset, query_vec: np.ndarray,
                         k: int = 10, candidates: int = 50, *,
                         mn: np.ndarray, mx: np.ndarray,
                         emb_col: str = "embedding",
                         id_col: str = "vec_id") -> pa.Table:
    """Two-stage SQ8 retrieval: integer-L2 top-``candidates`` shortlist
    → EXACT cosine re-rank of only those rows (broadcast id set, sorted
    membership probe — knn_brute_force's output contract)."""
    from ..query import sorted_member_mask
    from .similarity import knn_brute_force

    short = sq8_knn(ds, query_vec, k=candidates, mn=mn, mx=mx,
                    emb_col=emb_col, id_col=id_col)
    cand_ids = np.sort(np.asarray(short[id_col]).astype(np.int64))
    ids_ref = ray.put(cand_ids)

    def keep(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return batch
        return batch.filter(pa.array(sorted_member_mask(cids, ids)))

    sub = ds.map_batches(keep, batch_format="pyarrow")
    q2 = np.asarray(query_vec, dtype=np.float64)[None, :]
    out = knn_brute_force(sub, q2, k=k, emb_col=emb_col, id_col=id_col,
                          max_rows=None)
    return out.drop_columns(["query_id"])
