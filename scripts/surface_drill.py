"""Surface perf-artifact drill (VERDICT-r4 next #4): every driver
entry must appear in at least one of (a) the driver CORRECTNESS
union, (b) a BENCH/*.json artifact, (c) a named pytest. This drill
closes (b) for the residue: it computes the uncovered set with the
same scan the audit uses, runs each uncovered entry at sf0.01 (the
driver's grading scale), and records per-entry wall seconds + row
counts — a perf artifact per entry, plus a basic sanity gate
(non-empty result, runs to completion).

Usage:
    python scripts/surface_drill.py            # uncovered set only
    python scripts/surface_drill.py --all      # every entry
    python scripts/surface_drill.py name ...   # explicit names
Writes BENCH/surface_drill_r5.json.
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")


def uncovered_entries(names: list[str]) -> list[str]:
    corr = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json")):
        corr |= set(json.load(open(f)).keys())
    bench_keys = set()
    for f in (glob.glob(os.path.join(REPO, "BENCH_r0*.json"))
              + glob.glob(os.path.join(REPO, "BENCH", "*.json"))):
        if os.path.basename(f) == "surface_drill_r5.json":
            continue  # the artifact this drill writes must not mask
        txt = open(f).read()
        bench_keys |= {n for n in names if f'"{n}"' in txt}
    test_words = set(subprocess.run(
        ["grep", "-rho", r"[a-z0-9_]*", os.path.join(REPO, "tests")],
        capture_output=True, text=True).stdout.split())
    return [n for n in names
            if n not in corr and n not in bench_keys
            and n not in test_words]


def main() -> None:
    import ray

    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qmap = E.queries()
    names = list(qmap)
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if args:
        targets = args
    elif "--all" in sys.argv:
        targets = names
    else:
        targets = uncovered_entries(names)
    out = {"metric": "surface perf drill", "sf": SF_DIR,
           "n_entries": len(targets), "entries": {}, "failures": []}
    t_all = time.perf_counter()
    for n in targets:
        t0 = time.perf_counter()
        try:
            res = qmap[n](SF_DIR)
            if hasattr(res, "num_rows"):      # pyarrow.Table
                rows = res.num_rows
            elif hasattr(res, "count"):       # ray.data.Dataset
                rows = res.count()            # (its __len__ raises)
            else:                             # pandas.DataFrame
                rows = len(res)
            out["entries"][n] = {"s": round(time.perf_counter() - t0, 3),
                                 "rows": int(rows)}
        except Exception as e:  # keep going; record the failure
            out["failures"].append({"entry": n, "err": repr(e)[:200]})
    out["total_s"] = round(time.perf_counter() - t_all, 2)
    path = os.path.join(REPO, "BENCH", "surface_drill_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "n_entries", "total_s", "failures")}))
    slowest = sorted(out["entries"].items(), key=lambda kv: -kv[1]["s"])[:10]
    print("slowest:", json.dumps(dict(slowest)))
    ray.shutdown()


if __name__ == "__main__":
    main()
