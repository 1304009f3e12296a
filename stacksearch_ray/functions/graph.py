"""Iterative graph algorithms on Ray Datasets: PageRank.

The state (the rank vector) stays a Dataset end to end — same contract
as joins.propagate_min_labels_ds: driver-side state is O(1) scalars
(node count, iteration counter), never a node-sized table. Each
iteration is TWO exchanges — join ranks onto edges by src, then one
aggregate by dst whose input is the contribution partials UNIONED with
a zero row per node (so isolated/sink nodes survive without a third
left-join exchange) — and the new rank vector is materialized so the
next iteration reads blocks instead of re-executing lineage.

All arithmetic is int64 micros with floor divisions
(``pr // outdeg``, ``(850000 · s) // 1000000``), so the fixpoint
trajectory is exactly reproducible in SQL (DuckDB ``//``) — a
conformance-hashable iterative algorithm. Classic float PageRank
would differ across engines in the last ulp of every sum.

At 100 TB: the per-iteration exchanges shuffle (key, int64) pairs
only; edges are joined by hash bucket (no broadcast of the rank
vector). The one non-streamed step is materializing the node-sized
rank Dataset between iterations — blocks in the object store, spilled
by Ray if needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from .joins import hash_join

DAMP_NUM = 850_000      # 0.85 in micros
SCALE = 1_000_000


def _rename(ds: Dataset, mapping: dict[str, str]) -> Dataset:
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])
    return ds.map_batches(f, batch_format="pyarrow")


def pagerank_micros(edges: Dataset, iterations: int = 3,
                    num_buckets: int = 32,
                    seeds: "list[int] | None" = None) -> Dataset:
    """PageRank over a directed edge Dataset (``src``, ``dst`` int64,
    pre-deduplicated) → (``node``, ``pr_micros``). Damping 0.85;
    dangling mass is dropped (both engines identically). Returns after
    ``iterations`` synchronous steps from the uniform start
    ``SCALE // n``.

    With ``seeds``, this is PERSONALIZED PageRank: the teleport mass
    (0.15·SCALE per step) concentrates on the seed set (integer-split
    across seeds, 0 elsewhere) and the walk starts there — the
    related-node discovery primitive (related parts via co-purchase,
    similar docs via a near-dup graph). Integer-micros arithmetic is
    unchanged, so the personalized trajectory stays engine-exact.
    """
    edges = edges.materialize()  # reused 3× below (outdeg, join, nodes)
    outdeg = (edges.groupby("src").count()
              .map_batches(lambda t: pa.table({
                  "src": t["src"], "od": t["count()"].cast(pa.int64())}),
                  batch_format="pyarrow"))
    edges_w = hash_join(edges, outdeg, on="src",
                        num_buckets=num_buckets).materialize()

    nodes = (edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays([
            t["src"].combine_chunks().cast(pa.int64()),
            t["dst"].combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow")
        .groupby("node").count()
        .map_batches(lambda t: pa.table({"node": t["node"]}),
                     batch_format="pyarrow")
        .materialize())
    n = nodes.count()
    if seeds is None:
        base_u = 150_000 // n  # 0.15 · SCALE spread uniformly
        pr0_u = SCALE // n

        def base_vec(node_arr: np.ndarray) -> np.ndarray:
            return np.full(len(node_arr), base_u, np.int64)

        def pr0_vec(node_arr: np.ndarray) -> np.ndarray:
            return np.full(len(node_arr), pr0_u, np.int64)
    else:
        sd = np.unique(np.asarray(list(seeds), dtype=np.int64))
        base_s = 150_000 // len(sd)
        pr0_s = SCALE // len(sd)

        def _is_seed(node_arr: np.ndarray) -> np.ndarray:
            j = np.minimum(np.searchsorted(sd, node_arr), len(sd) - 1)
            return sd[j] == node_arr

        def base_vec(node_arr: np.ndarray) -> np.ndarray:
            return np.where(_is_seed(node_arr), base_s, 0).astype(np.int64)

        def pr0_vec(node_arr: np.ndarray) -> np.ndarray:
            return np.where(_is_seed(node_arr), pr0_s, 0).astype(np.int64)

    pr = nodes.map_batches(
        lambda t: t.append_column(
            "pr_micros", pa.array(pr0_vec(
                np.asarray(t["node"].combine_chunks()).astype(np.int64)))),
        batch_format="pyarrow").materialize()

    zeros = nodes.map_batches(
        lambda t: t.append_column(
            "c", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        p = np.asarray(t["pr_micros"].combine_chunks()).astype(np.int64)
        od = np.asarray(t["od"].combine_chunks()).astype(np.int64)
        dst = np.asarray(t["dst"].combine_chunks()).astype(np.int64)
        c = p // od
        # map-side combine: one partial row per dst per batch
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, c)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "c": pa.array(sums, pa.int64())})

    def step(t: pa.Table) -> pa.Table:
        c = np.asarray(t["c"].combine_chunks()).astype(np.int64)
        node_arr = np.asarray(t["node"].combine_chunks()).astype(np.int64)
        new = base_vec(node_arr) + (DAMP_NUM * c) // SCALE
        return pa.table({
            "node": pa.array(node_arr, pa.int64()),
            "pr_micros": pa.array(new, pa.int64())})

    for _ in range(iterations):
        joined = hash_join(edges_w, _rename(pr, {"node": "src"}),
                           on="src", num_buckets=num_buckets)
        parts = joined.map_batches(contrib, batch_format="pyarrow")
        s = (zeros.union(parts)
             .groupby("node").aggregate(Sum("c", alias_name="c")))
        pr = s.map_batches(step, batch_format="pyarrow").materialize()
    return pr
