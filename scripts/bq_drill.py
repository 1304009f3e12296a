"""Binary-quantization ANN at scale: 1M × 64-dim vectors.

Measures the three stages of the BQ serving story on a corpus 2000×
the sf0.1 embeddings table:
  1. code-table materialization (binary_quantize → parquet, the
     one-off 32×-compression pass),
  2. Hamming top-k over the raw float table (pack-on-the-fly — the
     no-code-table baseline),
  3. Hamming top-C shortlist + exact cosine re-rank (two-stage).

    python scripts/bq_drill.py [--rows 1000000] [--cpus 16]

Writes BENCH/bq_drill_r4.json style output to stdout (one JSON line).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 100_000


def ensure_vectors(root: str, rows: int) -> str:
    """Deterministic chunked vector table (seed = chunk index)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(root, f"bq_vecs_{rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for ci, start in enumerate(range(0, rows, CHUNK)):
        n = min(CHUNK, rows - start)
        rng = np.random.default_rng(1000 + ci)
        mat = rng.standard_normal((n, 64)).astype(np.float32)
        t = pa.table({
            "vec_id": pa.array(np.arange(start, start + n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 64),
        })
        pq.write_table(t, os.path.join(out, f"part-{ci:04d}.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import numpy as np

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.functions.bq import (binary_quantize, hamming_knn,
                                              hamming_shortlist_rerank)

    vec_dir = ensure_vectors("/tmp", args.rows)
    rd.read_parquet(vec_dir).count()  # warm metadata + page cache
    import pyarrow.parquet as pq

    q = np.asarray(
        pq.read_table(os.path.join(vec_dir, "part-0000.parquet"))
        ["embedding"][0].as_py(), dtype=np.float64)

    timings: dict[str, float] = {}

    codes_dir = f"/tmp/bq_codes_{os.getpid()}"
    shutil.rmtree(codes_dir, ignore_errors=True)
    t0 = time.time()
    binary_quantize(rd.read_parquet(vec_dir)).write_parquet(codes_dir)
    timings["quantize_materialize_sec"] = time.time() - t0

    t0 = time.time()
    top = hamming_knn(rd.read_parquet(vec_dir), q, k=10)
    timings["hamming_knn_sec"] = time.time() - t0
    assert top["vec_id"][0].as_py() == 0  # the query vector itself

    t0 = time.time()
    rr = hamming_shortlist_rerank(rd.read_parquet(vec_dir), q,
                                  k=10, candidates=100)
    timings["shortlist_rerank_sec"] = time.time() - t0
    assert rr["vec_id"][0].as_py() == 0

    code_bytes = sum(os.path.getsize(os.path.join(codes_dir, f))
                     for f in os.listdir(codes_dir))
    vec_bytes = sum(os.path.getsize(os.path.join(vec_dir, f))
                    for f in os.listdir(vec_dir) if f.endswith(".parquet"))
    shutil.rmtree(codes_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps({
        "metric": "binary-quantization ANN drill",
        "rows": args.rows,
        "num_cpus": args.cpus,
        "timings": {k: round(v, 3) for k, v in timings.items()},
        "vectors_per_s_hamming": round(args.rows
                                       / timings["hamming_knn_sec"]),
        "code_table_bytes": code_bytes,
        "vector_table_bytes": vec_bytes,
        "compression_x": round(vec_bytes / code_bytes, 1),
    }))


if __name__ == "__main__":
    main()
