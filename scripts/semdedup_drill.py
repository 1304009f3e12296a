"""SemDeDup at scale: N synthetic 64-dim vectors with planted near-dup
families, an IVF coarse quantizer at two k values, and the distributed
per-cell blocked keep pass (functions.similarity.semdedup_keep_mask).

Measures the knob the 100-TB story depends on: per-cell pairwise work is
quadratic in cell size, so raising k (more, smaller cells) trades one
cheap k-means pass for a superlinear drop in dedup cost. Reports
end-to-end vectors/s per k plus cell-size stats.

Usage: RAY_GRAFT_CPUS=16 python scripts/semdedup_drill.py [N]
Writes one JSON line; BENCH/semdedup_drill_r4.json is the committed run.
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
DIM = 64
PROTOS = 4096          # near-dup family prototypes
TAU_MICROS = 900_000   # cosine ≥ 0.90 = near-dup
SCRATCH = "/tmp/semdedup_drill"


def gen_batch(b: pa.Table) -> pa.Table:
    ids = np.asarray(b["id"]).astype(np.int64)
    rng = np.random.default_rng(int(ids[0]) + 101)
    proto_rng = np.random.default_rng(11)
    protos = proto_rng.standard_normal((PROTOS, DIM))
    base = protos[ids % PROTOS]
    # every 4th vector is a tight perturbation of its prototype → a
    # planted near-dup family member; the rest are far from everything
    eps = np.where(ids % 4 == 0, 0.02, 0.9)[:, None]
    x = base + eps * rng.standard_normal((len(ids), DIM))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(x.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
    })


def main() -> None:
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.functions.ivf import IVFIndex
    from stacksearch_ray.functions.similarity import (_emb_matrix,
                                                      semdedup_keep_mask)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    src = os.path.join(SCRATCH, "emb")
    t0 = time.perf_counter()
    (rd.range(N, override_num_blocks=64)
     .map_batches(gen_batch, batch_format="pyarrow", batch_size=16384)
     .write_parquet(src))
    gen_s = time.perf_counter() - t0

    def per_cell(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["vec_id"].combine_chunks()).astype(np.int64)
        order = np.argsort(ids)
        x = _emb_matrix(g, "embedding")[order]
        keep = semdedup_keep_mask(x, TAU_MICROS)
        return pa.table({
            "cell_rows": pa.array([len(ids)], pa.int64()),
            "kept": pa.array([int(keep.sum())], pa.int64()),
        })

    out = {"n": N, "dim": DIM, "tau_micros": TAU_MICROS, "cpus": cpus,
           "gen_sec": round(gen_s, 2), "runs": {}}
    for k in (64, 256):
        idx_dir = os.path.join(SCRATCH, f"ivf_k{k}")
        t0 = time.perf_counter()
        IVFIndex.build(rd.read_parquet(src), idx_dir, k=k, iters=2,
                       seed=17)
        build_s = time.perf_counter() - t0
        # path A: Dataset groupby (re-shuffles the already-partitioned
        # lists — the anti-pattern the task-per-cell path removes)
        t0 = time.perf_counter()
        stats = (rd.read_parquet(os.path.join(idx_dir, "lists"))
                 .groupby("cid")
                 .map_groups(per_cell, batch_format="pyarrow")
                 .to_pandas())  # ≤ k rows
        groupby_s = time.perf_counter() - t0
        # path B: IVFIndex.semdedup — one Ray task per on-disk cell,
        # NO shuffle (the production path semdedup_corpus uses)
        idx = IVFIndex(idx_dir)
        t0 = time.perf_counter()
        kept_b = idx.semdedup(TAU_MICROS).to_pandas()["keep"].sum()
        cell_s = time.perf_counter() - t0
        assert int(kept_b) == int(stats["kept"].sum())  # same answer
        out["runs"][f"k{k}"] = {
            "quantizer_build_sec": round(build_s, 2),
            "groupby_sec": round(groupby_s, 2),
            "task_per_cell_sec": round(cell_s, 2),
            "vectors_per_s": round(N / cell_s, 1),
            "cells": int(len(stats)),
            "max_cell": int(stats["cell_rows"].max()),
            "mean_cell": int(stats["cell_rows"].mean()),
            "kept": int(stats["kept"].sum()),
            "dropped": int(N - stats["kept"].sum()),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
