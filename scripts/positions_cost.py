"""Positional-sidecar cost accounting (VERDICT r3 item #7).

Builds the 400k-doc bench corpus twice — store_positions=False vs True —
and records build wall time and on-disk index size for each, so the
price of the v2 positional sidecar (phrase/NEAR served from the index
alone) is on record in BASELINE.md.

    python scripts/positions_cost.py     # writes BENCH/positions_cost_r4.json
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_BENCH_ROWS", "400000"))
CORPUS = f"/tmp/ssr_bench_corpus_{ROWS}_f31250"


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.corpus import write_corpus

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=31_250, lines=(10, 80))
        open(marker, "w").write("ok")

    # untimed warmup: spawn the worker pool + warm the page cache so the
    # first timed build isn't charged ~1.5s/worker of import cost
    warm_idx = "/tmp/ssr_poscost_warmup"
    shutil.rmtree(warm_idx, ignore_errors=True)
    import glob

    build_index_resumable(sorted(glob.glob(f"{CORPUS}/*.parquet"))[:13],
                          warm_idx, num_shards=64, files_per_partition=1,
                          concurrency=16)
    shutil.rmtree(warm_idx, ignore_errors=True)

    out = {"metric": "positional-sidecar cost (store_positions on/off)",
           "rows": ROWS}
    for label, flag in [("plain", False), ("positional", True)]:
        idx = f"/tmp/ssr_poscost_idx_{label}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index_resumable(CORPUS, idx, num_shards=64,
                              files_per_partition=1, concurrency=16,
                              store_positions=flag)
        out[f"{label}_build_s"] = round(time.time() - t0, 2)
        out[f"{label}_index_mb"] = round(du(idx) / 1e6, 1)
        shutil.rmtree(idx, ignore_errors=True)

    out["build_overhead_pct"] = round(
        100 * (out["positional_build_s"] / out["plain_build_s"] - 1), 1)
    out["size_overhead_pct"] = round(
        100 * (out["positional_index_mb"] / out["plain_index_mb"] - 1), 1)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "positions_cost_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
