"""SemDeDup hot-cell skew drill: the VERDICT-r4 "what's wrong #1"
closure evidence. Three measured points over 64-dim vectors with an
IVF coarse quantizer at k=256:

1. balanced N — prototype-spread vectors, cells ~N/k rows (the
   existing semdedup_drill shape); the auto-split cap never triggers.
2. skewed N, WITH auto-split (max_cell_rows=8192) — 50% of the
   vectors form one dense off-center blob that the coarse quantizer
   puts in ONE cell; the cell auto-splits via in-task data-seeded
   k-means into child tasks (ivf.IVFIndex.semdedup).
3. skewed N_SMALL, WITHOUT auto-split — the unbounded quadratic
   stall, measured at a smaller N so the drill terminates.

Pass = skewed-with-split wall within ~2x of balanced wall at the same
N (the hot cell no longer stalls the pass), while the no-split point
documents the stall the cap removes.

Usage: RAY_GRAFT_CPUS=16 python scripts/semdedup_skew_drill.py [N]
Writes one JSON line; BENCH/semdedup_skew_r5.json is the committed run.
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_SMALL = 400_000
DIM = 64
K_COARSE = 256
PROTOS = 4096
TAU_MICROS = 900_000
CAP = 8192
SCRATCH = "/tmp/semdedup_skew_drill"


def _protos(seed: int, center: np.ndarray | None = None,
            spread: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    p = spread * rng.standard_normal((PROTOS, DIM))
    return p if center is None else center + p


def balanced_batch(b: pa.Table) -> pa.Table:
    ids = np.asarray(b["id"]).astype(np.int64)
    rng = np.random.default_rng(int(ids[0]) + 101)
    protos = _protos(11)
    base = protos[ids % PROTOS]
    eps = np.where(ids % 4 == 0, 0.02, 0.9)[:, None]
    x = base + eps * rng.standard_normal((len(ids), DIM))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(x.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
    })


def skewed_batch(b: pa.Table) -> pa.Table:
    """Even ids: one dense blob around a far-off center (norm >> the
    standard-normal init scale, so exactly ONE coarse centroid captures
    it -> a cell holding 50% of the corpus). Odd ids: the balanced
    spread. The blob keeps in-blob prototype structure so the in-task
    splitter has geometry to split on -- the realistic hot-cell shape
    (an over-dense subdomain, not one exact point)."""
    ids = np.asarray(b["id"]).astype(np.int64)
    rng = np.random.default_rng(int(ids[0]) + 202)
    center_rng = np.random.default_rng(7)
    center = 6.0 * center_rng.standard_normal(DIM)
    hot_protos = _protos(13, center=center, spread=0.3)
    cold_protos = _protos(11)
    hot = ids % 2 == 0
    base = np.where(hot[:, None], hot_protos[ids % PROTOS],
                    cold_protos[ids % PROTOS])
    eps = np.where(hot, 0.02, np.where(ids % 4 == 1, 0.02, 0.9))[:, None]
    x = base + eps * rng.standard_normal((len(ids), DIM))
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(x.astype(np.float32).tolist(),
                              pa.list_(pa.float32())),
    })


def run_pass(tag: str, src: str, n: int, max_cell_rows: int) -> dict:
    import ray
    import ray.data as rd

    from stacksearch_ray.functions.ivf import IVFIndex

    idx_dir = os.path.join(SCRATCH, f"ivf_{tag}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    idx = IVFIndex.build(rd.read_parquet(src), idx_dir, k=K_COARSE,
                         iters=4, seed=17)
    build_s = time.perf_counter() - t0
    # cell-size distribution from the hive layout (footer counts only)
    import pyarrow.parquet as pq

    sizes = []
    lists_dir = os.path.join(idx_dir, "lists")
    for d in sorted(os.listdir(lists_dir)):
        full = os.path.join(lists_dir, d)
        rows = sum(pq.read_metadata(os.path.join(full, f)).num_rows
                   for f in os.listdir(full) if f.endswith(".parquet"))
        sizes.append(rows)
    sizes = np.array(sizes)
    t0 = time.perf_counter()
    out = idx.semdedup(TAU_MICROS, max_cell_rows=max_cell_rows)
    kept = int(out.sum("keep"))
    dedup_s = time.perf_counter() - t0
    return {
        "n": n, "build_s": round(build_s, 3),
        "dedup_s": round(dedup_s, 3),
        "vec_per_s": round(n / dedup_s, 1),
        "kept": kept,
        "max_cell": int(sizes.max()), "cells": int(len(sizes)),
        "max_cell_frac": round(float(sizes.max()) / n, 3),
        "cap": max_cell_rows,
    }


def main() -> None:
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)

    res = {"metric": "semdedup skew drill", "dim": DIM,
           "k_coarse": K_COARSE, "tau_micros": TAU_MICROS}

    for tag, fn, n in (("balanced", balanced_batch, N),
                       ("skewed", skewed_batch, N),
                       ("skewed_small", skewed_batch, N_SMALL)):
        src = os.path.join(SCRATCH, f"emb_{tag}")
        (rd.range(n, override_num_blocks=64)
         .map_batches(fn, batch_format="pyarrow", batch_size=16384)
         .write_parquet(src))
        if tag == "balanced":
            res["balanced"] = run_pass(tag, src, n, 65536)
        elif tag == "skewed":
            res["skewed_split"] = run_pass(tag, src, n, CAP)
        else:
            res["small_nosplit"] = run_pass(tag + "_ns", src, n,
                                            1_000_000_000)
            res["small_split"] = run_pass(tag + "_sp", src, n, CAP)

    res["split_vs_balanced_wall_ratio"] = round(
        res["skewed_split"]["dedup_s"] / res["balanced"]["dedup_s"], 3)
    res["small_stall_ratio"] = round(
        res["small_nosplit"]["dedup_s"] / res["small_split"]["dedup_s"], 3)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
