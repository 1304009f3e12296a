"""Shard-count sweep (VERDICT r3 item #8).

SCALE.md claims S ≈ 60k shards at 100 TB stays cheap because the
per-shard segment-encode cost is flat in S (each shard task reads only
its own row-group span of the staged postings). Evidence: build the
2M-doc corpus at 256 vs 1024 shards and show the shard phase doesn't
grow with S.

Phase split: the first build call stops one partition short
(BuildInterrupted) to time the partition phase; the resume call then
runs the last partition + stats + ALL shard tasks + term_dict, so its
wall time is (one partition unit + shard phase) — the comparison
between S values isolates the S-dependent part.

    python scripts/shard_sweep.py     # writes BENCH/shard_sweep_r4.json
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_SWEEP_ROWS", "2000000"))
CORPUS = f"/tmp/ssr_sweep_corpus_{ROWS}"
SHARD_COUNTS = [256, 1024]


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from stacksearch_ray.checkpoint import BuildInterrupted, build_index_resumable
    from stacksearch_ray.corpus import write_corpus

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=31_250, lines=(10, 80))
        open(marker, "w").write("ok")
    n_parts = len([f for f in os.listdir(CORPUS) if f.endswith(".parquet")])

    out = {"metric": "shard-count sweep (2M-doc build, 256 vs 1024 shards)",
           "rows": ROWS, "n_partitions": n_parts, "sweep": []}
    for s in SHARD_COUNTS:
        idx = f"/tmp/ssr_sweep_idx_s{s}"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        try:
            build_index_resumable(CORPUS, idx, num_shards=s,
                                  files_per_partition=1, concurrency=16,
                                  stop_after_partitions=n_parts - 1)
        except BuildInterrupted:
            pass
        t_parts = time.time() - t0
        t0 = time.time()
        build_index_resumable(CORPUS, idx, num_shards=s,
                              files_per_partition=1, concurrency=16)
        t_rest = time.time() - t0
        row = {"num_shards": s,
               "partition_phase_s": round(t_parts, 2),
               "shard_phase_plus_one_part_s": round(t_rest, 2),
               "total_s": round(t_parts + t_rest, 2),
               "docs_per_s": round(ROWS / (t_parts + t_rest), 1)}
        out["sweep"].append(row)
        print(json.dumps(row), file=sys.stderr)
        shutil.rmtree(idx, ignore_errors=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "shard_sweep_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
