"""Similarity search over an embedding column (``list<float>``).

- knn_brute_force: exact cosine top-k — per-batch numpy matmul against a
  broadcast (ray.put) query matrix, per-batch partial top-k, small global
  merge. The baseline.
- knn_lsh: random-hyperplane LSH-bucketed ANN — the scale path: probe
  only buckets matching the query signature (± multiprobe), exact
  rescoring inside probed buckets.
- cosine_pairs: embedding-cosine near-duplicate pairs (sim ≥ threshold),
  blocked exact all-pairs — blocks live in the object store and stream
  through compare tasks (no driver materialize, no full broadcast).
- cosine_pairs_lsh: the candidate-pruned variant for high thresholds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..micros import to_micros


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col].combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    if isinstance(col, pa.FixedSizeListArray) or pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return flat.reshape(-1, dim)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offsets[1] - offsets[0])
    return flat.reshape(-1, dim)


def knn_brute_force(ds: Dataset, queries: np.ndarray, k: int = 10,
                    emb_col: str = "embedding", id_col: str = "vec_id",
                    max_rows: int | None = 5_000_000) -> pa.Table:
    """Exact cosine top-k for each query row. Returns
    (query_id, vec_id, sim_micros, rank) — float64 cosine, int64 micros.

    Partial top-k per batch keeps the driver merge at
    O(num_batches · q · k), independent of corpus size — but compute is
    a full O(n·q) corpus scan per call: inputs above ``max_rows`` raise
    toward ``knn_lsh`` / ``knn_ivf`` (the guard counts the input, which
    executes its lineage once; pass ``max_rows=None`` to skip)."""
    if max_rows is not None:
        n = ds.count()
        if n > max_rows:
            raise ValueError(
                f"knn_brute_force scans the full corpus per call; input has "
                f"{n} rows > max_rows={max_rows}. Use knn_lsh / knn_ivf at "
                f"scale, or pass max_rows=None to force.")
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        emb = _normalize(_emb_matrix(batch, emb_col))
        sims = emb @ qm.T  # (n, q)
        # deterministic per-batch cut: ties at the k-th sim must keep
        # the smaller vec_id (the driver merge's ORDER BY sim DESC,
        # vec_id ASC cannot resurrect a row dropped here); argpartition
        # + tie widening keeps the cut O(n) per query
        from .topk import topk_desc_tiebreak

        qi_out, vi_out, sim_out = [], [], []
        for qi in range(qm.shape[0]):
            sel = topk_desc_tiebreak(ids, sims[:, qi], k)
            qi_out.append(np.full(len(sel), qi, dtype=np.int64))
            vi_out.append(ids[sel])
            sim_out.append(sims[sel, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(qi_out)),
            "vec_id": pa.array(np.concatenate(vi_out)),
            "sim": pa.array(np.concatenate(sim_out)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = {"query_id": [], "vec_id": [], "sim_micros": [], "rank": []}
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend([int(qid)] * len(g))
        out["vec_id"].extend(g["vec_id"].astype(int))
        out["sim_micros"].extend(to_micros(g["sim"].to_numpy()))
        out["rank"].extend(range(1, len(g) + 1))
    return pa.table({k2: pa.array(v, pa.int64()) for k2, v in out.items()})


def knn_lsh(ds: Dataset, queries: np.ndarray, k: int = 10,
            emb_col: str = "embedding", id_col: str = "vec_id",
            n_planes: int = 8, seed: int = 11, multiprobe: int = 1) -> pa.Table:
    """ANN via random-hyperplane signatures: corpus bucketed by sign
    pattern; each query probes its bucket plus all buckets within
    ``multiprobe`` bit flips, exact cosine inside probed buckets.
    Approximate — verified by recall-vs-brute-force in tests."""
    rng = np.random.default_rng(seed)
    dim = np.asarray(queries).shape[1]
    planes = rng.standard_normal((n_planes, dim))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_sig = (q @ planes.T) > 0
    pow2 = 1 << np.arange(n_planes)
    q_buckets: list[set[int]] = []
    for row in q_sig:
        base = int((row * pow2).sum())
        probes = {base}
        if multiprobe >= 1:
            probes |= {base ^ (1 << i) for i in range(n_planes)}
        if multiprobe >= 2:
            probes |= {base ^ (1 << i) ^ (1 << j)
                       for i in range(n_planes) for j in range(i + 1, n_planes)}
        q_buckets.append(probes)
    ref = ray.put((q, q_buckets, planes))

    def partial(batch: pa.Table) -> pa.Table:
        qm, buckets, pl = ray.get(ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        sig = (emb @ pl.T) > 0
        bucket = (sig * pow2).sum(axis=1).astype(np.int64)
        qi_out, vi_out, sim_out = [], [], []
        for qi, probes in enumerate(buckets):
            mask = np.isin(bucket, list(probes))
            if not mask.any():
                continue
            sims = emb[mask] @ qm[qi]
            kk = min(k, sims.shape[0])
            top = np.argpartition(-sims, kk - 1)[:kk]
            qi_out.extend([qi] * kk)
            vi_out.extend(ids[mask][top])
            sim_out.extend(sims[top])
        return pa.table({
            "query_id": pa.array(qi_out, pa.int64()),
            "vec_id": pa.array(vi_out, pa.int64()),
            "sim": pa.array(sim_out, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = {"query_id": [], "vec_id": [], "sim_micros": [], "rank": []}
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        out["query_id"].extend([int(qid)] * len(g))
        out["vec_id"].extend(g["vec_id"].astype(int))
        out["sim_micros"].extend(to_micros(g["sim"].to_numpy()))
        out["rank"].extend(range(1, len(g) + 1))
    return pa.table({k2: pa.array(v, pa.int64()) for k2, v in out.items()})


def cosine_pairs_lsh(ds: Dataset, threshold: float = 0.9,
                     emb_col: str = "embedding", id_col: str = "vec_id",
                     n_planes: int = 10, n_tables: int = 8,
                     seed: int = 17) -> pa.Table:
    """Near-duplicate pairs at scale: L independent random-hyperplane
    tables; candidate pairs form inside each (table, bucket) group and
    are verified with exact cosine — no O(n²) compare, no broadcast of
    the full matrix. Collision probability per table ≈ (1 - θ/π)^k, so
    for cos ≥ 0.9 (θ ≤ 26°) with k=10, L=8: ~78% per table → ~99.99%
    overall recall; tested ≥ the brute-force oracle's clear-margin pairs.

    Shuffle payload carries the (normalized) vectors L× — at very large
    n, carry only (table, bucket, vec_id) and hash-join embeddings back
    per bucket instead (functions/joins.py). Only meaningful for HIGH
    thresholds: collision probability decays fast with angle, so use
    the exact path for loose thresholds.
    """
    rng = np.random.default_rng(seed)
    sample = ds.take(1)
    dim = len(sample[0][emb_col])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pow2 = 1 << np.arange(n_planes)
    planes_ref = ray.put(planes)

    def buckets(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        emb = _normalize(_emb_matrix(batch, emb_col))
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        out_id, out_tbl, out_bkt, out_emb = [], [], [], []
        for ti in range(n_tables):
            sig = (emb @ pl[ti].T) > 0
            bkt = (sig * pow2).sum(axis=1).astype(np.int64)
            out_id.append(ids)
            out_tbl.append(np.full(len(ids), ti, dtype=np.int32))
            out_bkt.append(bkt)
            out_emb.append(emb)
        embs = np.concatenate(out_emb)
        return pa.table({
            "vec_id": np.concatenate(out_id),
            "table": np.concatenate(out_tbl),
            "bucket": np.concatenate(out_bkt),
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(embs.reshape(-1), pa.float64()), dim),
        })

    import pandas as pd

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id")
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "sim_micros": pd.Series(dtype=np.int64)})
        ids = g["vec_id"].to_numpy().astype(np.int64)
        mat = np.stack(g["emb"].to_numpy()).astype(np.float64)
        sims = mat @ mat.T
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = sims[ai, bi] >= threshold
        return pd.DataFrame({
            "a": ids[ai][keep],
            "b": ids[bi][keep],
            "sim_micros": to_micros(sims[ai, bi][keep])})

    pairs = (ds.map_batches(buckets, batch_format="pyarrow")
             .groupby(["table", "bucket"])
             .map_groups(pairs_in_bucket, batch_format="pandas")
             .to_pandas().drop_duplicates(["a", "b"])
             .sort_values(["a", "b"]).reset_index(drop=True))
    return pa.Table.from_pandas(pairs, preserve_index=False)


def cosine_pairs(ds: Dataset, threshold: float = 0.95,
                 emb_col: str = "embedding", id_col: str = "vec_id",
                 block_size: int = 4096,
                 max_rows: int | None = 200_000) -> pa.Table:
    """Exact near-duplicate pairs (a < b, cosine ≥ threshold) via BLOCKED
    all-pairs: normalized blocks are materialized into the object store
    (``to_arrow_refs`` — never the driver heap), and each compare task
    streams peer blocks one at a time, so peak memory per task is
    O(batch × block), independent of corpus size. Compute is inherently
    O(n²/2) for an *exact* loose-threshold pair join; for HIGH thresholds
    (≥ ~0.8) use ``cosine_pairs_lsh`` which prunes candidates to
    colliding buckets. Upper-triangle block pruning skips peer blocks
    whose max id can't exceed the batch's min id. Inputs above
    ``max_rows`` raise toward ``cosine_pairs_lsh`` (the guard counts
    the input, which executes its lineage once; ``max_rows=None``
    skips it)."""
    if max_rows is not None:
        n = ds.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs is the exact O(n²) pair join; input has "
                f"{n} rows > max_rows={max_rows}. Use cosine_pairs_lsh at "
                f"scale, or pass max_rows=None to force.")

    def norm_project(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "emb": pa.array([], pa.list_(pa.float64()))})
        emb = _normalize(_emb_matrix(b, emb_col))
        return pa.table({
            "vec_id": ids,
            "emb": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), emb.shape[1]),
        })

    norm = ds.map_batches(norm_project, batch_format="pyarrow",
                          batch_size=block_size).materialize()
    refs = norm.to_arrow_refs()

    def compare(batch: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        bids = np.asarray(batch["vec_id"].combine_chunks()).astype(np.int64)
        if len(bids) == 0:
            return empty
        bmat = _emb_matrix(batch, "emb")
        bmin = int(bids.min())
        a_out, b_out, s_out = [], [], []
        for r in refs:
            blk = ray.get(r)
            oids = np.asarray(blk["vec_id"].combine_chunks()).astype(np.int64)
            if len(oids) == 0 or int(oids.max()) <= bmin:
                continue  # no peer id can exceed any batch id
            omat = _emb_matrix(blk, "emb")
            sims = bmat @ omat.T
            mask = (oids[None, :] > bids[:, None]) & (sims >= threshold)
            ai, bi = np.nonzero(mask)
            if len(ai):
                a_out.append(bids[ai])
                b_out.append(oids[bi])
                s_out.append(sims[ai, bi])
        if not a_out:
            return empty
        return pa.table({"a": np.concatenate(a_out),
                         "b": np.concatenate(b_out),
                         "sim": np.concatenate(s_out)})

    pdf = (norm.map_batches(compare, batch_format="pyarrow")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    return pa.table({
        "a": pa.array(pdf["a"], pa.int64()),
        "b": pa.array(pdf["b"], pa.int64()),
        "sim_micros": pa.array(to_micros(pdf["sim"].to_numpy()), pa.int64()),
    })


def semdedup_keep_mask(x: np.ndarray, tau_micros: int,
                       block: int = 1024) -> np.ndarray:
    """SemDeDup keep-first mask over ONE cluster's vectors (rows are
    vec_id-ascending): row i is dropped iff some LOWER row j < i has
    micros-rounded cosine ≥ ``tau_micros``. Blocked matmul — each pass
    scores ``block`` rows against every earlier row, so peak memory is
    block·i floats instead of the m² full matrix (the per-cell bound
    that matters when a hot cluster holds 10⁵+ vectors at 100 TB).
    Each entry uses the SAME expression as the unblocked form — raw-row
    dot over the norm product — and the gate compares int64 micros
    (micros.py rule), absorbing any sub-micro float jitter between
    blocked and unblocked evaluation."""
    from ..micros import to_micros

    m = len(x)
    keep = np.ones(m, dtype=bool)
    if m <= 1:
        return keep
    n = np.sqrt((x * x).sum(axis=1))
    n[n == 0] = 1.0
    for i0 in range(1, m, block):
        i1 = min(i0 + block, m)
        # rows i0:i1 against ALL earlier rows 0:i1 (strictly lower by
        # the tril mask below) — dot/outer(norms), the unblocked
        # matrix's per-entry expression
        sims = to_micros((x[i0:i1] @ x[:i1].T)
                         / np.outer(n[i0:i1], n[:i1]))
        lower = np.tril(np.ones((i1 - i0, i1), dtype=bool),
                        k=i0 - 1)
        keep[i0:i1] = ~((sims >= tau_micros) & lower).any(axis=1)
    return keep
