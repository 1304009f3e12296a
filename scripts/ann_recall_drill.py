"""ANN candidate-family recall drill: recall@10 of each shortlist
family (Hamming/BQ, SQ8 integer-L2, MRL truncated-dot, IVF nprobe, LSH
hyperplane) against exact cosine, same table, same candidate budget —
the quality side of the five-family retrieval story (the bitwise
oracles prove CORRECTNESS of each family's math; this measures their
RECALL so a user can pick one).

    python scripts/ann_recall_drill.py  # writes BENCH/ann_recall_r4.json
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
CAND = 50
K = 10
N_QUERIES = 20


def main() -> None:
    import pyarrow.parquet as pq

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from stacksearch_ray.functions.bq import hamming_knn
    from stacksearch_ray.functions.similarity import knn_brute_force
    from stacksearch_ray.functions.sq import mrl_knn, sq8_knn, sq8_train

    emb_path = os.path.join(SF, "embeddings.parquet")
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"]).astype(np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(emb_path, columns=["vec_id", "embedding"])
    mn, mx = sq8_train(ds)

    # exact ground truth (vectorized, local — the table is small)
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                            1e-30)
    q_idx = np.arange(0, len(ids), max(1, len(ids) // N_QUERIES)
                      )[:N_QUERIES]
    recalls: dict[str, list[float]] = {"bq": [], "sq8": [], "mrl": []}
    for qi in q_idx:
        sims = norm @ norm[qi]
        exact = set(ids[np.lexsort((ids, -sims))[:K]].tolist())
        q = mat[qi]
        got = {
            "bq": hamming_knn(ds, q, k=CAND),
            "sq8": sq8_knn(ds, q, k=CAND, mn=mn, mx=mx),
            "mrl": mrl_knn(ds, q, k=CAND, dims=16),
        }
        for fam, tbl in got.items():
            cand = set(tbl["vec_id"].to_pylist())
            recalls[fam].append(len(cand & exact) / K)

    out = {"metric": f"ANN shortlist recall@{K} (candidates={CAND})",
           "sf": SF, "n_queries": len(q_idx), "n_vectors": int(len(ids))}
    for fam, r in recalls.items():
        out[f"recall_{fam}"] = round(float(np.mean(r)), 3)

    # LSH (bucket-probed exact cosine, k=CAND) — different budget
    # shape: candidates = probed buckets' contents
    from stacksearch_ray.functions.similarity import knn_lsh

    lsh = knn_lsh(ds, mat[q_idx], k=CAND, multiprobe=1).to_pandas()
    lsh_rec = []
    for qi_pos, qi in enumerate(q_idx):
        sims = norm @ norm[qi]
        exact = set(ids[np.lexsort((ids, -sims))[:K]].tolist())
        cand = set(lsh[lsh["query_id"] == qi_pos]["vec_id"].tolist())
        lsh_rec.append(len(cand & exact) / K)
    out["recall_lsh"] = round(float(np.mean(lsh_rec)), 3)

    # IVF (nprobe=2 of 8 cells) — candidate budget = probed cells'
    # population, reported alongside
    from stacksearch_ray.functions.ivf import (assign_centroids,
                                               centroid_d2, kmeans_numpy)

    cents = kmeans_numpy(mat, k=8, iters=4, seed=17)
    cell = assign_centroids(mat, cents)
    ivf_rec, ivf_cand = [], []
    for qi in q_idx:
        sims = norm @ norm[qi]
        exact = set(ids[np.lexsort((ids, -sims))[:K]].tolist())
        probe = np.argsort(centroid_d2(mat[qi][None, :], cents)[0])[:2]
        cand = set(ids[np.isin(cell, probe)].tolist())
        ivf_rec.append(len(cand & exact) / K)
        ivf_cand.append(len(cand))
    out["recall_ivf_nprobe2"] = round(float(np.mean(ivf_rec)), 3)
    out["ivf_mean_candidates"] = round(float(np.mean(ivf_cand)), 1)

    # HNSW (sixth family): nprobe-bounded partitioned graphs at the
    # same candidate budget — the REALISTIC 100-TB config (the
    # knn_hnsw driver entry probes every partition, which is exact by
    # construction and would report 1.0 trivially)
    from stacksearch_ray.functions.hnsw import hnsw_partitioned_knn

    h = hnsw_partitioned_knn(ds, mat[q_idx], k=CAND, n_clusters=4,
                             nprobe=2, ef=64).to_pandas()
    hn_rec = []
    for qi_pos, qi in enumerate(q_idx):
        sims = norm @ norm[qi]
        exact = set(ids[np.lexsort((ids, -sims))[:K]].tolist())
        cand = set(h[h["query_id"] == qi_pos]["vec_id"].tolist())
        hn_rec.append(len(cand & exact) / K)
    out["recall_hnsw_nprobe2"] = round(float(np.mean(hn_rec)), 3)

    print(json.dumps(out))
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    with open(os.path.join(bench, "ann_recall_r5.json"), "w") as f:
        json.dump(out, f)
    ray.shutdown()


if __name__ == "__main__":
    main()
