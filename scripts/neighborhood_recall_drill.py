"""Sorted-neighborhood fallback recall accounting (VERDICT-r4 next #5).

edit_distance_pairs / jaro_winkler_sim_pairs bound over-full
(lang, len-bucket) blocks by pairing each prefix-sorted row with its
next W neighbors (m·W pairs instead of m²/2). This drill puts the
quality price of that knob on record: one 100k-row block (too big for
the exact triangle — 5·10⁹ pairs — which is exactly why the fallback
exists) with PLANTED ground truth:

- 100k-PLANTED random pairwise-far base strings (64 chars, alphabet 26
  -> any two bases differ way beyond max_dist);
- PLANTED of them get a near-dup twin at lev <= 2, with edit positions
  drawn UNIFORMLY over the prefix — including position 0, the
  sorted-neighborhood worst case (an early edit sorts the twin far
  away). True pair set = the planted twins, nothing else.

Reported per neighbor_window W in {4, 8, 16}: recall of planted pairs,
wall seconds, and pair-budget m·W. The uniform-edit-position recall is
the PESSIMISTIC bound; real near-dup corpora (suffix-drift dups,
boilerplate edits) sort adjacent far more often.

Usage: RAY_GRAFT_CPUS=16 python scripts/neighborhood_recall_drill.py [N]
Writes one JSON line; BENCH/neighborhood_recall_r5.json is committed.
"""

import json
import os
import string
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
PLANTED = N // 5
PREFIX = 64
MAX_DIST = 2
ALPHA = np.frombuffer(string.ascii_lowercase.encode(), dtype=np.uint8)


def build_block() -> tuple[pa.Table, set]:
    rng = np.random.default_rng(42)
    n_base = N - PLANTED
    base = rng.choice(ALPHA, size=(n_base, PREFIX))
    rows = [base]
    ids = [np.arange(n_base, dtype=np.int64)]
    truth = set()
    twin_src = rng.choice(n_base, size=PLANTED, replace=False)
    twins = base[twin_src].copy()
    n_edits = rng.integers(1, MAX_DIST + 1, size=PLANTED)
    for i in range(PLANTED):
        pos = rng.choice(PREFIX, size=n_edits[i], replace=False)
        twins[i, pos] = rng.choice(ALPHA, size=n_edits[i])
        truth.add((int(twin_src[i]), int(n_base + i)))
    rows.append(twins)
    ids.append(np.arange(n_base, N, dtype=np.int64))
    all_rows = np.concatenate(rows)
    all_ids = np.concatenate(ids)
    texts = [r.tobytes().decode() for r in all_rows]
    t = pa.table({
        "doc_id": pa.array(all_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * N, pa.string()),
        "n_chars": pa.array(np.full(N, PREFIX, np.int64)),
    })
    return t, truth


def main() -> None:
    import ray
    import ray.data as rd

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from stacksearch_ray.functions.curation import edit_distance_pairs

    t, truth = build_block()
    res = {"metric": "sorted-neighborhood recall", "n": N,
           "planted_pairs": len(truth), "max_dist": MAX_DIST,
           "prefix_len": PREFIX, "windows": {}}
    for w in (4, 8, 16):
        ds = rd.from_arrow(t)
        t0 = time.perf_counter()
        out = edit_distance_pairs(ds, max_dist=MAX_DIST,
                                  prefix_len=PREFIX,
                                  max_block_rows=8192,
                                  neighbor_window=w).to_pandas()
        dt = time.perf_counter() - t0
        found = set(zip(out["doc_id_a"].astype(int),
                        out["doc_id_b"].astype(int)))
        hit = len(found & truth)
        res["windows"][f"W{w}"] = {
            "recall": round(hit / len(truth), 4),
            "pairs_found": len(found), "true_hits": hit,
            "wall_s": round(dt, 3),
            "pair_budget": N * w,
        }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
