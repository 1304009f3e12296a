"""10M-doc build + serve drill — the largest single-node scale point.

Extends the scaling-evidence ladder (400k bench / 2M sweep+merge
drills) by 5×: chunked corpus generation (1M-row chunks, per-chunk
seed + row_offset → globally collision-free doc ids, ~1 GB peak
instead of one ~15 GB table), the resumable checkpointed build at
1024 shards, then the serving surface: cold open + first query,
warm p50/p99, sharded fan-out p50.

    python scripts/scale_drill_10m.py     # writes BENCH/scale_drill_10m_r5.json

Env: GRAFT_DRILL_ROWS (default 10_000_000), GRAFT_DRILL_SHARDS (1024).
Run on a QUIET host — this is a measurement script.
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_DRILL_ROWS", "10000000"))
SHARDS = int(os.environ.get("GRAFT_DRILL_SHARDS", "1024"))
CHUNK = 1_000_000
ROWS_PER_FILE = 78_125  # 13 ragged files per 1M chunk -> 130 at 10M
CORPUS = f"/tmp/ssr_drill10m_corpus_{ROWS}"
INDEX = f"/tmp/ssr_drill10m_idx_{ROWS}"
QUERIES = ["def return var_1 helper_3", "var_7 helper_11 field_13",
           "import class field_7", "for if var_100 helper_50"]


def _write_chunked_corpus() -> float:
    import pyarrow.parquet as pq

    from stacksearch_ray.corpus import generate_corpus

    marker = os.path.join(CORPUS, "_DONE")
    if os.path.exists(marker):
        return 0.0
    shutil.rmtree(CORPUS, ignore_errors=True)
    os.makedirs(CORPUS)
    t0 = time.time()
    fidx = 0
    for off in range(0, ROWS, CHUNK):
        n = min(CHUNK, ROWS - off)
        # per-chunk seed varies the TEXT; row_offset keeps identities
        # (and thus doc ids) globally unique
        tbl = generate_corpus(n, seed=1234 + off // CHUNK,
                              lines=(5, 25), row_offset=off)
        for s in range(0, n, ROWS_PER_FILE):
            part = tbl.slice(s, ROWS_PER_FILE)
            pq.write_table(part, os.path.join(
                CORPUS, f"part-{fidx:05d}.parquet"))
            fidx += 1
        del tbl
    open(marker, "w").write("ok")
    return time.time() - t0


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    out: dict = {"metric": "10M-doc build + serve drill", "rows": ROWS,
                 "num_shards": SHARDS}
    out["gen_sec"] = round(_write_chunked_corpus(), 2)
    out["corpus_bytes"] = _du(CORPUS)

    shutil.rmtree(INDEX, ignore_errors=True)
    t0 = time.time()
    build_index_resumable(CORPUS, INDEX, num_shards=SHARDS,
                          files_per_partition=4, concurrency=16)
    out["build_sec"] = round(time.time() - t0, 2)
    out["docs_per_sec"] = round(ROWS / (time.time() - t0), 1)
    out["index_bytes"] = _du(INDEX)

    # cold open + first query (fresh engine, OS cache warm from build)
    t0 = time.time()
    eng = QueryEngine(INDEX)
    out["open_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    eng.search(QUERIES[0], 10)
    out["first_query_sec"] = round(time.time() - t0, 3)

    for q in QUERIES:
        eng.search(q, 10)
    lat = []
    for _ in range(25):
        for q in QUERIES:
            t0 = time.time()
            eng.search(q, 10)
            lat.append(time.time() - t0)
    lat.sort()
    out["warm_p50_ms"] = round(1000 * statistics.median(lat), 2)
    out["warm_p99_ms"] = round(1000 * lat[int(0.99 * len(lat))], 2)

    sharded = ShardedQueryEngine(INDEX, num_workers=8)
    sharded.warm(QUERIES)
    lat = []
    for _ in range(25):
        for q in QUERIES:
            t0 = time.time()
            sharded.search(q, 10)
            lat.append(time.time() - t0)
    out["sharded_p50_ms"] = round(1000 * statistics.median(lat), 2)

    ray.shutdown()
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "scale_drill_10m_r5.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
