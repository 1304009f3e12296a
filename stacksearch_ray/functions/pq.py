"""Product quantization (PQ) approximate nearest neighbor — the
vector-COMPRESSION scale path (Jégou, Douze & Schmid, TPAMI 2011),
complementing the coarse-quantizer IVF (ivf.py) and hyperplane LSH
(similarity.py): the embedding dim splits into M subspaces, each with
its own small k-means codebook; a vector stores only M one-byte codes
(64 float64 → 4 bytes here), and a query scores candidates through an
asymmetric-distance lookup table (ADC) without touching the original
floats. At 100 TB the codes table is ~1/128 the raw vectors — the
difference between spilling and RAM-resident rescoring.

Determinism contract: codebooks come from the micros-exact k-means
mirror (ivf.kmeans_numpy — integer partial sums commute, bitwise equal
to the distributed trainer); assignment is argmin L2 with first-min
ties, the same expression the DuckDB oracle replays via list_distance
+ row_number; ADC LUT entries are micros-rounded in PYTHON and handed
to the oracle as integer literals, so the cross-engine float surface
is the assignment only (the proven knn_ivf pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..micros import to_micros
from .ivf import assign_centroids, kmeans_numpy


def train_pq_codebooks(x: np.ndarray, m: int = 4, k: int = 8,
                       iters: int = 4, seed: int = 17) -> list[np.ndarray]:
    """Per-subspace codebooks: subspace s is the column block
    [s·d/m, (s+1)·d/m) trained with the micros-exact k-means at
    seed+s (independent draws per subspace)."""
    x = np.asarray(x, dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [kmeans_numpy(x[:, s * sub:(s + 1) * sub], k=k, iters=iters,
                         seed=seed + s) for s in range(m)]


def encode_pq(x: np.ndarray, codebooks: list[np.ndarray]) -> np.ndarray:
    """(n, M) int64 codes: per subspace, nearest codebook row (argmin
    L2, first-min ties) — vectorized via the shared assign kernel."""
    x = np.asarray(x, dtype=np.float64)
    sub = codebooks[0].shape[1]
    return np.stack([assign_centroids(x[:, s * sub:(s + 1) * sub], cb)
                     for s, cb in enumerate(codebooks)], axis=1)


def adc_lut_micros(q: np.ndarray, codebooks: list[np.ndarray]
                   ) -> np.ndarray:
    """(M, K) int64 micros of the query-to-centroid SQUARED L2 per
    subspace — per-entry round-then-sum (the repo's micros rule), so
    both engines rank by identical int64 ADC distances."""
    q = np.asarray(q, dtype=np.float64)
    sub = codebooks[0].shape[1]
    out = []
    for s, cb in enumerate(codebooks):
        diff = cb - q[s * sub:(s + 1) * sub][None, :]
        out.append([to_micros(float(v)) for v in (diff * diff).sum(axis=1)])
    return np.asarray(out, dtype=np.int64)


def encode_pq_ds(ds: Dataset, codebooks: list[np.ndarray],
                 emb_col: str = "embedding", id_col: str = "vec_id"
                 ) -> Dataset:
    """Distributed encode: map_batches over the vectors (codebooks
    broadcast in the closure — k·d floats, trivially small), emitting
    (vec_id, code_0..code_{M-1}) — the compressed representation that
    replaces the raw vectors downstream."""
    def enc(b: pa.Table) -> pa.Table:
        x = np.asarray(b[emb_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        codes = encode_pq(x, codebooks)
        cols = {id_col: pa.array(ids, pa.int64())}
        for s in range(codes.shape[1]):
            cols[f"code_{s}"] = pa.array(codes[:, s], pa.int64())
        return pa.table(cols)

    return ds.map_batches(enc, batch_format="pyarrow")


def ivfpq_topk(ds: Dataset, coarse: np.ndarray,
               codebooks: list[np.ndarray], q: np.ndarray, k: int = 10,
               nprobe: int = 2, emb_col: str = "embedding",
               id_col: str = "vec_id") -> pa.Table:
    """IVF-PQ composite (the FAISS-style scale architecture): the
    coarse k-means cells prune candidates to the query's ``nprobe``
    nearest partitions, PQ codes + an int64 ADC lookup score ONLY the
    survivors. Here the probe filter runs inside the encode pass over
    the raw stream; at 100 TB the corpus lives centroid-partitioned on
    disk (ivf.IVFIndex layout) with the codes as a per-partition
    sidecar, so the probe prunes at the READ and ADC touches M bytes
    per candidate. (Codebooks here quantize raw vectors, not coarse
    residuals — the residual refinement changes the codebooks, not
    this flow.) Probes and LUT are Python-side, so the oracle's float
    surface stays the two argmin assignments."""
    q = np.asarray(q, dtype=np.float64)
    order = np.argsort(((coarse - q[None, :]) ** 2).sum(axis=1),
                       kind="stable")[:nprobe]
    probes = np.sort(order.astype(np.int64))
    lut = adc_lut_micros(q, codebooks)
    m = lut.shape[0]

    def part(b: pa.Table) -> pa.Table:
        x = np.asarray(b[emb_col].to_pylist(), dtype=np.float64)
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dist_micros": pa.array([], pa.int64())})
        cid = assign_centroids(x, coarse)
        keep = np.isin(cid, probes)
        ids, x = ids[keep], x[keep]
        codes = encode_pq(x, codebooks)
        dist = np.zeros(len(ids), dtype=np.int64)
        for s in range(m):
            dist += lut[s][codes[:, s]]
        o = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[o], pa.int64()),
                         "dist_micros": pa.array(dist[o], pa.int64())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist_micros", id_col]).head(k)
    return pa.table({
        id_col: pa.array(parts[id_col].tolist(), pa.int64()),
        "dist_micros": pa.array(parts["dist_micros"].tolist(), pa.int64()),
        "rank": pa.array(list(range(1, len(parts) + 1)), pa.int64()),
    })


def pq_rerank_exact(ds: Dataset, candidates: np.ndarray, q: np.ndarray,
                    k: int = 10, emb_col: str = "embedding",
                    id_col: str = "vec_id") -> pa.Table:
    """Stage-2 exact re-rank (the T2 candidate+verify shape for
    vectors): read ONLY the candidate ids' raw embeddings (predicate
    pushdown — |candidates| rows leave storage, not the corpus), score
    exact cosine, return top-k by (sim desc, vec_id asc) with
    sim_micros. The ADC stage bounds |candidates|, so this touches
    100·512 B where the corpus holds 10⁹ vectors."""
    q = np.asarray(q, dtype=np.float64)
    cand = np.sort(np.asarray(candidates, dtype=np.int64))

    def score(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        from ..query import sorted_member_mask

        keep = sorted_member_mask(cand, ids)
        ids = ids[keep]
        x = np.asarray(b[emb_col].to_pylist(), dtype=np.float64)[keep]
        if len(ids) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sim_micros": pa.array([], pa.int64())})
        nq = float(np.sqrt((q * q).sum()))
        nx = np.sqrt((x * x).sum(axis=1))
        sim = np.where(nx > 0, (x @ q) / np.where(nx > 0, nx * nq, 1.0),
                       0.0)
        sm = np.floor(sim * 1e6 + 0.5).astype(np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "sim_micros": pa.array(sm, pa.int64())})

    t = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    t = t.sort_values(["sim_micros", id_col],
                      ascending=[False, True]).head(k)
    return pa.table({
        id_col: pa.array(t[id_col].tolist(), pa.int64()),
        "sim_micros": pa.array(t["sim_micros"].tolist(), pa.int64()),
        "rank": pa.array(list(range(1, len(t) + 1)), pa.int64()),
    })


def pq_topk(codes_ds: Dataset, lut: np.ndarray, k: int = 10,
            id_col: str = "vec_id") -> pa.Table:
    """ADC top-k over the codes table: per batch, distance = Σ_m
    LUT[m][code_m] (int64 gather-sum, no floats), keep the batch-local
    top-k, then one driver merge of the tiny partials — cost is one
    pass over CODES (M bytes/vector at scale), never the raw vectors."""
    m = lut.shape[0]

    def part(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        dist = np.zeros(len(ids), dtype=np.int64)
        for s in range(m):
            dist += lut[s][np.asarray(b[f"code_{s}"].combine_chunks())]
        order = np.lexsort((ids, dist))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "dist_micros": pa.array(dist[order], pa.int64())})

    parts = codes_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist_micros", id_col]).head(k)
    return pa.table({
        id_col: pa.array(parts[id_col].tolist(), pa.int64()),
        "dist_micros": pa.array(parts["dist_micros"].tolist(), pa.int64()),
        "rank": pa.array(list(range(1, len(parts) + 1)), pa.int64()),
    })
