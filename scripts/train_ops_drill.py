"""Training-transform throughput drill: chunk_dataset / fim_dataset
over the 400k-doc bench corpus (heavier docs than the conformance
table) — the evidence the session-9 training ops are streaming,
map-side and fast, not just correct at 500 rows.

    python scripts/train_ops_drill.py   # writes BENCH/train_ops_r4.json
"""
from __future__ import annotations

import glob
import json
import os
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(os.environ.get("GRAFT_DRILL_ROWS", "400000"))
CORPUS = f"/tmp/ssr_bench_corpus_{ROWS}_f6250"  # shared with bench.py


def main() -> None:
    import pyarrow as pa

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from stacksearch_ray.corpus import write_corpus
    from stacksearch_ray.functions.training_export import (chunk_dataset,
                                                           fim_dataset)

    marker = os.path.join(CORPUS, "_DONE")
    if not os.path.exists(marker):
        write_corpus(CORPUS, ROWS, rows_per_file=6_250, lines=(10, 80))
        open(marker, "w").write("ok")
    parts = sorted(glob.glob(f"{CORPUS}/*.parquet"))

    def count_consume(ds) -> tuple[int, int]:
        """Rows + total tokens, fully streamed (no materialization)."""
        import numpy as np

        def agg(b: pa.Table) -> pa.Table:
            return pa.table({
                "rows": pa.array([b.num_rows], pa.int64()),
                "toks": pa.array([int(np.asarray(
                    b["n_tokens"].combine_chunks()).sum())], pa.int64())
                if "n_tokens" in b.column_names else
                pa.array([0], pa.int64()),
            })

        # ONE lineage execution: both sums in a single aggregate (two
        # .sum() calls would re-run the whole transform and double the
        # published timing)
        from ray.data.aggregate import Sum

        r = ds.map_batches(agg, batch_format="pyarrow").aggregate(
            Sum("rows", alias_name="rows"), Sum("toks", alias_name="toks"))
        return int(r["rows"] or 0), int(r["toks"] or 0)

    out: dict = {"metric": "training-transform throughput at 400k docs",
                 "rows": ROWS}

    src = rd.read_parquet(parts, columns=["repo", "path", "commit",
                                          "content"])

    def with_ids(b: pa.Table) -> pa.Table:
        from stacksearch_ray.schema import doc_ids_batch

        ids = doc_ids_batch(b["repo"].combine_chunks(),
                            b["path"].combine_chunks(),
                            b["commit"].combine_chunks())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": b["content"].combine_chunks()})

    base = src.map_batches(with_ids, batch_format="pyarrow")

    t0 = time.perf_counter()
    n_chunks, n_toks = count_consume(
        chunk_dataset(base, width=512, stride=384))
    dt = time.perf_counter() - t0
    out["chunk_s"] = round(dt, 2)
    out["chunk_rows_out"] = n_chunks
    out["chunk_docs_per_s"] = round(ROWS / dt, 1)
    out["chunk_tokens_out"] = n_toks

    t0 = time.perf_counter()
    n_fim, _ = count_consume(fim_dataset(base))
    dt = time.perf_counter() - t0
    out["fim_s"] = round(dt, 2)
    out["fim_rows_out"] = n_fim
    out["fim_docs_per_s"] = round(ROWS / dt, 1)

    print(json.dumps(out))
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    with open(os.path.join(bench_dir, "train_ops_r4.json"), "w") as f:
        json.dump(out, f)
    ray.shutdown()


if __name__ == "__main__":
    main()
