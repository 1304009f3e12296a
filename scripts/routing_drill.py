"""Term-based shard routing drill (federation-tier shard selection).

Measures what ShardedQueryEngine.enable_term_routing buys on a 1M-doc /
128-shard index at 16 workers: rare-term queries should touch only the
workers whose shard subsets can hold the term (bitmap routing), hot-term
queries still fan out everywhere. Also asserts routed results are
bitwise identical to unrouted on every probe.

    python scripts/routing_drill.py   # writes BENCH/routing_drill_r4.json

Shares the corpus/index cache with serving_fanout.py.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_FANOUT_ROWS", "1000000"))
CORPUS = f"/tmp/ssr_fanout_corpus_{ROWS}"
INDEX = f"/tmp/ssr_fanout_idx_{ROWS}"
N_WORKERS = 16
N_SEQ = 100


def pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from stacksearch_ray.checkpoint import build_index_resumable
    from stacksearch_ray.corpus import write_corpus
    from stacksearch_ray.query import QueryEngine, ShardedQueryEngine

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=31_250, lines=(10, 80))
        open(marker, "w").write("ok")
    if not os.path.exists(os.path.join(INDEX, "stats.json")):
        t0 = time.time()
        build_index_resumable(CORPUS, INDEX, num_shards=128,
                              files_per_partition=1, concurrency=16)
        print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)

    # pick probes straight from the term dictionary: rare = df ≤ 8
    # (deterministic: df asc, term asc), hot = the 4 largest dfs
    import pyarrow.parquet as pq

    td = (pq.read_table(os.path.join(INDEX, "term_dict"),
                        columns=["term", "df"]).to_pandas()
          .sort_values(["df", "term"]))
    dfs = dict(zip(td["term"], td["df"]))
    rare = td[td["df"].between(1, 8)]["term"].tolist()[:12]
    hot = td["term"].tolist()[-4:]
    print(f"rare probes: {[(t, dfs[t]) for t in rare]}", file=sys.stderr)
    print(f"hot probes: {[(t, int(dfs[t])) for t in hot]}", file=sys.stderr)
    if not rare:
        raise SystemExit("no rare terms found — corpus shape changed?")

    out = {"rows": ROWS, "num_workers": N_WORKERS, "shards": 128}

    eng = ShardedQueryEngine(INDEX, num_workers=N_WORKERS)
    t0 = time.perf_counter()
    eng.enable_term_routing()
    out["routing_init_s"] = round(time.perf_counter() - t0, 3)

    # routed fan-out degree on the rare probes
    fan = [len(eng._routed_workers([t])) for t in rare]
    out["rare_fanout_workers"] = {"mean": round(statistics.mean(fan), 2),
                                  "max": max(fan), "total": N_WORKERS}

    # identity: routed == unrouted on every probe (rare, hot, mixed)
    unrouted = ShardedQueryEngine(INDEX, num_workers=N_WORKERS)
    unrouted.search_many(hot, k=10)  # warm
    eng.search_many(hot, k=10)
    mixed = rare + hot + [f"{rare[0]} {hot[0]}", "zzz_missing_term"]
    for q in mixed:
        a, b = eng.search(q, 10), unrouted.search(q, 10)
        assert a == b, q
    out["identity_ok"] = True

    def bench(engine, queries, label):
        for q in queries:  # warm the touched workers' caches
            engine.search(q, 10)
        lat = []
        for i in range(N_SEQ):
            q = queries[i % len(queries)]
            t0 = time.perf_counter()
            engine.search(q, 10)
            lat.append(time.perf_counter() - t0)
        out[label] = {"p50_ms": round(pctl(lat, 0.5) * 1e3, 2),
                      "p95_ms": round(pctl(lat, 0.95) * 1e3, 2)}

    bench(eng, rare, "rare_routed")
    bench(unrouted, rare, "rare_unrouted")
    bench(eng, hot, "hot_routed")
    bench(unrouted, hot, "hot_unrouted")

    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join("BENCH", "routing_drill_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
