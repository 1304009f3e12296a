"""Scorer shoot-out on a zipf-term / lognormal-length corpus — the shape
where block maxima genuinely vary and pruning can pay off.

Generates (once, cached under /tmp) a corpus with a heavily skewed term
distribution, builds the index, then times exhaustive / wand / bmax /
auto on a query mix (hot, rare, hot+rare) and asserts all scorers return
bitwise-identical rankings. Results feed the BASELINE.md shoot-out table.

    python scripts/scorer_shootout.py [--n-docs 200000] [--repeats 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


QUERIES = {
    "hot2": "t00000 t00001",
    "hot+rare": "t00000 t09000",
    "rare2": "t09000 t11000",
    "hot3+rare": "t00000 t00002 t00005 t12000",
    "mid2": "t00300 t00500",
}


def gen_corpus(path: str, n_docs: int, seed: int = 42,
               vocab_size: int = 50_000) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([f"t{i:05d}" for i in range(vocab_size)], dtype=object)
    lens = np.clip(rng.lognormal(4.0, 0.9, n_docs).astype(np.int64), 5, 3000)
    tot = int(lens.sum())
    ranks = np.minimum(rng.zipf(1.3, tot), vocab_size) - 1
    toks = vocab[ranks]
    starts = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(toks[starts[i]:starts[i + 1]])
             for i in range(n_docs)]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), path)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-docs", type=int, default=200_000)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.build import build_index
    from stacksearch_ray.query import QueryEngine
    from stacksearch_ray.schema import INDEX_FORMAT_VERSION

    root = f"/tmp/zipf_shootout/n{args.n_docs}"
    corpus = os.path.join(root, "docs.parquet")
    index_dir = os.path.join(root, f"index_v{INDEX_FORMAT_VERSION}")
    if not os.path.exists(corpus):
        print("generating corpus ...", file=sys.stderr)
        gen_corpus(corpus, args.n_docs)
    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        print("building index ...", file=sys.stderr)
        build_index(corpus, index_dir, content_col="text", id_col="doc_id")

    eng = QueryEngine(index_dir)
    results: dict[str, dict[str, float]] = {}
    for qname, q in QUERIES.items():
        ref = None
        row: dict[str, float] = {}
        for method in ("exhaustive", "bmax"):  # "wand" is a bmax alias now
            # warm (decode caches shared across methods — measure compute)
            eng.search(q, args.k, method=method)
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                res = eng.search(q, args.k, method=method)
                times.append(time.perf_counter() - t0)
            if ref is None:
                ref = res
            assert res == ref, f"rank mismatch: {qname} {method}"
            row[method] = sorted(times)[len(times) // 2] * 1e3
        results[qname] = row
        print(f"{qname:12s} " + "  ".join(
            f"{m}={row[m]:8.2f}ms" for m in row))
    print(json.dumps({"n_docs": args.n_docs, "p50_ms": results}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
