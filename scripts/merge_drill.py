"""Merge-at-scale drill: quantify the parallel-ingest pattern.

Builds two 1M-doc indexes over disjoint halves of the 2M-doc corpus,
merges them (merge_indexes: file union + stats + term_dict, no
re-tokenize), compacts, and compares against a monolithic 2M build —
the numbers behind SCALE.md's "K parallel builds + one merge" story.

    python scripts/merge_drill.py     # writes BENCH/merge_drill_r4.json
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_DRILL_ROWS", "2000000"))
CORPUS = f"/tmp/ssr_sweep_corpus_{ROWS}"  # shared with shard_sweep
SHARDS = 256


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from stacksearch_ray.append import compact_index, merge_indexes
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.corpus import write_corpus
    from stacksearch_ray.query import QueryEngine

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=31_250, lines=(10, 80))
        open(marker, "w").write("ok")
    parts = sorted(glob.glob(f"{CORPUS}/*.parquet"))
    half = len(parts) // 2

    out = {"metric": "merge-at-scale drill (2x 1M-doc builds + merge vs monolithic 2M)",
           "rows": ROWS, "num_shards": SHARDS}
    dirs = {n: f"/tmp/ssr_drill_{n}" for n in ("a", "b", "m", "mono")}
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)

    t0 = time.time()
    build_index_resumable(parts[:half], dirs["a"], num_shards=SHARDS,
                          files_per_partition=1, concurrency=16)
    out["build_half_a_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    build_index_resumable(parts[half:], dirs["b"], num_shards=SHARDS,
                          files_per_partition=1, concurrency=16)
    out["build_half_b_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    merge_indexes([dirs["a"], dirs["b"]], dirs["m"])
    out["merge_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    compact_index(dirs["m"])
    out["compact_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    build_index_resumable(CORPUS, dirs["mono"], num_shards=SHARDS,
                          files_per_partition=1, concurrency=16)
    out["monolithic_s"] = round(time.time() - t0, 2)

    # merged-without-compact serves immediately and matches monolithic
    q = "def return var_1 helper_3"
    m = QueryEngine(dirs["m"]).search(q, 10)
    mono = QueryEngine(dirs["mono"]).search(q, 10)
    out["post_compact_results_match"] = (m == mono)
    # on a K-node parallel ingest the halves run CONCURRENTLY: critical
    # path = max(half) + merge (+ optional compact for pruning)
    out["parallel_critical_path_s"] = round(
        max(out["build_half_a_s"], out["build_half_b_s"]) + out["merge_s"], 2)

    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "merge_drill_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
