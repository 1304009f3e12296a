"""Query-serving fan-out sweep (VERDICT r3 item #6).

Measures ShardedQueryEngine latency on a 1M-doc index across worker
counts, including points past the host's ~16-concurrent-worker thrash
threshold, plus tail latency (p99) under concurrent client load —
the north-star is a serving engine, so p95/p99 under load is a
first-class number.

    python scripts/serving_fanout.py          # writes BENCH/serving_fanout_r4.json

Protocol: one ray session (num_cpus=32 — workers are 1-CPU actors);
index built once at concurrency 16 (the documented host cap) and
reused; per worker count a fresh actor pool is spawned, warmed, then
(a) 200 sequential searches give isolated p50/p95/p99 and (b) 400
requests from 8 client threads give under-load p50/p95/p99 + qps.
Actors are killed between sweep points so pools never overlap.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_FANOUT_ROWS", "1000000"))
CORPUS = f"/tmp/ssr_fanout_corpus_{ROWS}"
INDEX = f"/tmp/ssr_fanout_idx_{ROWS}"
WORKER_COUNTS = [4, 8, 12, 16, 24]
N_SEQ = 200
N_LOAD = 400
CLIENT_THREADS = 8

QUERIES = ["def return var_1 helper_3", "var_7 helper_11 field_13",
           "class import field_2 var_19", "def var_3 return helper_7"]


def pctl(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.corpus import write_corpus
    from stacksearch_ray.query import ShardedQueryEngine

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=31_250, lines=(10, 80))
        open(marker, "w").write("ok")
    if not os.path.exists(os.path.join(INDEX, "stats.json")):
        t0 = time.time()
        build_index_resumable(CORPUS, INDEX, num_shards=128,
                              files_per_partition=1, concurrency=16)
        print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)

    results = []
    for nw in WORKER_COUNTS:
        eng = ShardedQueryEngine(INDEX, num_workers=nw)
        eng.search_many(QUERIES * 4, k=10)  # warm every worker's cache

        seq = []
        for i in range(N_SEQ):
            t0 = time.perf_counter()
            eng.search(QUERIES[i % len(QUERIES)], k=10)
            seq.append(time.perf_counter() - t0)

        lat = []
        t_load0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=CLIENT_THREADS) as ex:
            def one(i: int) -> float:
                t0 = time.perf_counter()
                eng.search(QUERIES[i % len(QUERIES)], k=10)
                return time.perf_counter() - t0
            lat = list(ex.map(one, range(N_LOAD)))
        load_wall = time.perf_counter() - t_load0

        # batched-load mode: the throughput-optimal serving shape — one
        # search_many RPC per worker per 50-query batch (per-query
        # fan-out overhead amortized; in-flight tasks = workers, not
        # threads × workers, so the host cap is never exceeded)
        t0 = time.perf_counter()
        for i in range(0, N_LOAD, 50):
            eng.search_many([QUERIES[j % len(QUERIES)]
                             for j in range(i, i + 50)], k=10)
        batched_qps = N_LOAD / (time.perf_counter() - t0)

        row = {
            "workers": nw,
            "batched_qps": round(batched_qps, 1),
            "seq_p50_ms": round(statistics.median(seq) * 1e3, 2),
            "seq_p95_ms": round(pctl(seq, 0.95) * 1e3, 2),
            "seq_p99_ms": round(pctl(seq, 0.99) * 1e3, 2),
            "load_p50_ms": round(statistics.median(lat) * 1e3, 2),
            "load_p95_ms": round(pctl(lat, 0.95) * 1e3, 2),
            "load_p99_ms": round(pctl(lat, 0.99) * 1e3, 2),
            "load_qps": round(N_LOAD / load_wall, 1),
        }
        results.append(row)
        print(json.dumps(row), file=sys.stderr)
        for w in eng.workers:
            ray.kill(w)

    out = {"metric": "sharded-serving fan-out sweep (1M-doc/128-shard index)",
           "rows": ROWS, "n_seq": N_SEQ, "n_load": N_LOAD,
           "client_threads": CLIENT_THREADS, "sweep": results}
    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "serving_fanout_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
