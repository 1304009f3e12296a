"""Open-vocabulary md5 drill: the VERDICT-r4 "what's wrong #2"
closure evidence. On a 100 TB corpus with URL/hash-like tokens the
per-process md5 cache stops helping (every token unique) and the old
per-token hashlib loop became the stage. _md5_uniques now batches
cache-miss tokens through an in-process DuckDB ``md5_number_lower``
call (bit-identical by definition — it IS the oracle convention;
verified elementwise in tests) at C++ speed.

Two corpora, same shape (N docs x ~TOK tokens):
- zipf: closed ~30k-type vocabulary -> the cache warms, misses rare
  (the conformance-scale regime).
- open: every token globally unique ("u{doc}x{pos}h{doc*pos}") ->
  zero cache hits, the regime the loop used to stall in.

Reported: minhash-signature throughput (the md5-riding stage) on both,
plus the direct md5_low64 unique-token rate at 10M uniques. Pass =
open-vocab signature rate within 2x of the zipf rate.

Usage: RAY_GRAFT_CPUS=16 python scripts/md5_vocab_drill.py [N_DOCS]
Writes one JSON line; BENCH/md5_vocab_r5.json is the committed run.
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
TOK = 50
SCRATCH = "/tmp/md5_vocab_drill"


def gen(mode: str):
    def batch_fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["id"]).astype(np.int64)
        texts = []
        for d in ids:
            if mode == "zipf":
                rng = np.random.default_rng(int(d) + 7)
                # ~30k types, zipf-ish exponent: heavy head
                toks = (rng.zipf(1.3, TOK) % 30_000).astype(str)
                texts.append(" ".join("w" + t for t in toks))
            else:
                texts.append(" ".join(
                    f"u{d}x{p}h{(int(d) * 31 + p) % 999983}"
                    for p in range(TOK)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})
    return batch_fn


def main() -> None:
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.functions.dedup import (md5_low64_arrow,
                                                 minhash_signatures)

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    res = {"metric": "open-vocab md5 drill", "n_docs": N_DOCS,
           "tok_per_doc": TOK}

    for mode in ("zipf", "open"):
        src = os.path.join(SCRATCH, mode)
        (rd.range(N_DOCS, override_num_blocks=32)
         .map_batches(gen(mode), batch_format="pyarrow",
                      batch_size=8192)
         .write_parquet(src))
        t0 = time.perf_counter()
        # hash_fn="md5" = the SQL-oracled signature chain — the path
        # that rides _md5_uniques (default "pd" never touches md5)
        n = (minhash_signatures(rd.read_parquet(src), hash_fn="md5")
             .count())
        dt = time.perf_counter() - t0
        res[mode] = {"rows": n, "sig_s": round(dt, 3),
                     "docs_per_s": round(n / dt, 1),
                     "tokens_per_s": round(n * TOK / dt, 1)}

    res["open_vs_zipf_rate"] = round(
        res["zipf"]["docs_per_s"] / res["open"]["docs_per_s"], 3)

    # direct single-process rate: 10M unique tokens through md5_low64
    n_u = 10_000_000
    toks = pa.array(f"u{i}q{i * i % 999983}" for i in range(n_u))
    t0 = time.perf_counter()
    h = md5_low64_arrow(toks)
    dt = time.perf_counter() - t0
    res["direct_10m_uniques"] = {"s": round(dt, 3),
                                 "tokens_per_s": round(n_u / dt, 1),
                                 "checksum": int(h[:1000].sum())}
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
