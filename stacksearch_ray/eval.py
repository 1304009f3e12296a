"""Evaluation harness — the Ray analog of the reference's multi-index
recall comparison (/root/reference/results.py:161-216,229-268):

for each (query, expected_doc) pair, search with the exact query AND a
perturbed variant (``to_drop`` tokens removed at seeded positions,
results.py:182-184), across one or more engine configurations, then
aggregate hit@k per configuration with a groupby-Sum
(results.py:204-216,267).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from .query import QueryEngine
from .text import clean_query


def perturb_query(query: str, to_drop: int = 1, seed: int = 0) -> str:
    """Drop ``to_drop`` tokens at seeded positions (results.py:182-184
    semantics: perturbation happens in token space, post-cleaning)."""
    toks = clean_query(query)
    if len(toks) <= to_drop:
        return query
    rng = np.random.default_rng(seed)
    drop = set(rng.choice(len(toks), size=to_drop, replace=False).tolist())
    return " ".join(t for i, t in enumerate(toks) if i not in drop)


class _EvalActor:
    """Actor-pool stage: engines loaded once, (query, expected) pairs
    scored per batch."""

    def __init__(self, configs: dict[str, dict], k: int, to_drop: int, seed: int):
        self.engines = {name: QueryEngine(c["index_dir"])
                        for name, c in configs.items()}
        self.opts = configs
        self.k = k
        self.to_drop = to_drop
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {c: [] for c in ("config", "query", "variant", "expected_id", "hit")}
        for q, exp in zip(batch["query"].to_pylist(),
                          batch["expected_id"].to_pylist()):
            variants = {"exact": q,
                        "perturbed": perturb_query(q, self.to_drop, self.seed)}
            for name, eng in self.engines.items():
                opts = self.opts[name]
                for vname, vq in variants.items():
                    res = eng.search(vq, self.k,
                                     method=opts.get("method", "auto"),
                                     scorer=opts.get("scorer", "bm25"))
                    ids = [d for d, _ in res]
                    out["config"].append(name)
                    out["query"].append(q)
                    out["variant"].append(vname)
                    out["expected_id"].append(exp)
                    out["hit"].append(int(exp in ids))
        return pa.table({
            "config": pa.array(out["config"], pa.string()),
            "query": pa.array(out["query"], pa.string()),
            "variant": pa.array(out["variant"], pa.string()),
            "expected_id": pa.array(out["expected_id"], pa.int64()),
            "hit": pa.array(out["hit"], pa.int64()),
        })


def evaluate(configs: dict[str, dict], pairs: list[tuple[str, int]],
             k: int = 10, to_drop: int = 1, seed: int = 0,
             concurrency: int = 2) -> tuple[Dataset, Dataset]:
    """Run the eval matrix. ``configs``: name → {"index_dir", "method"?,
    "scorer"?}. ``pairs``: (query, expected_doc_id).

    Returns (hits, summary): per-(config, query, variant) hit rows, and
    recall@k per (config, variant) via groupby-aggregate — the hit-matrix
    + df.agg(sum) shape of results.py:204-216,267."""
    qds = rd.from_items([{"query": q, "expected_id": e} for q, e in pairs])
    hits = qds.map_batches(
        _EvalActor, batch_format="pyarrow", batch_size=max(1, len(pairs) // 4),
        concurrency=concurrency,
        fn_constructor_kwargs={"configs": configs, "k": k,
                               "to_drop": to_drop, "seed": seed})
    summary = (hits.groupby(["config", "variant"])
               .aggregate(Sum("hit", alias_name="hits"),
                          Count(alias_name="n")))
    return hits, summary
