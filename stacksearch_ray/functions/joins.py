"""Join primitives (SURVEY.md §2.5 at scale).

- broadcast_join: small dimension side shipped once via ray.put, merged
  per batch — no shuffle. THE default for dim tables / lookup maps.
- hash_join: both sides large — explicit partitioned hash join: tag each
  side, bucket by key hash, groupby(bucket) and merge matching buckets
  pairwise in pandas. Portable across Ray versions; on Ray ≥ 2.49 the
  native ``Dataset.join`` (hash-partitioned) exists and is used when
  ``native=True``.

Skew note: a hot join key lands one bucket by default; pass ``salt=k``
to split every key bucket k ways (left rows round-robin, right rows
replicated — the same hot-key trick the index build uses for hot terms),
bounding per-group size at hot_rows/k + replicated small side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def broadcast_join(large: Dataset, small_df: pd.DataFrame, on: str,
                   how: str = "inner") -> Dataset:
    """Merge a broadcast pandas dimension table into every batch."""
    ref = ray.put(small_df)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return large.map_batches(merge, batch_format="pandas")


def _pd_dtype(typ: pa.DataType):
    """Arrow type → pandas dtype for stable block schemas; object for
    nested/unmappable types (pandas' container dtype for them)."""
    try:
        return typ.to_pandas_dtype()
    except (NotImplementedError, AttributeError):
        return np.dtype(object)


def _tag_and_bucket(ds: Dataset, on: str, side: str, num_buckets: int,
                    unified: "list[tuple[str, pa.DataType]]",
                    salt: int = 1) -> Dataset:
    """Bucket by key hash and null-pad to the unified two-side schema —
    Ray's sort-based groupby requires identical schemas across blocks.

    ``salt`` > 1 is the hot-key guard: each LEFT row lands in ONE of
    ``salt`` sub-buckets of its key bucket (round-robin within the
    batch), while every RIGHT row is REPLICATED into all ``salt``
    sub-buckets — a key holding half the left rows is split ``salt``
    ways instead of landing on a single group."""
    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[on].combine_chunks()
        if pa.types.is_integer(keys.type):
            h = pd.util.hash_array(np.asarray(keys).astype(np.int64))
        else:
            h = pd.util.hash_array(np.asarray(keys.to_pylist(), dtype=object))
        bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        n = len(batch)
        cols: dict[str, pa.Array] = {}
        for name, typ in unified:
            if name in batch.column_names:
                cols[name] = batch[name].combine_chunks()
            else:
                if not isinstance(typ, pa.DataType):
                    try:
                        typ = pa.from_numpy_dtype(np.dtype(typ))
                    except (pa.ArrowNotImplementedError, TypeError):
                        typ = pa.null()
                cols[name] = pa.nulls(n, type=typ)
        if salt > 1:
            if side == "l":
                sub = np.arange(n, dtype=np.int64) % salt
                bucket = bucket * salt + sub
            else:
                idx = np.repeat(np.arange(n, dtype=np.int64), salt)
                sub = np.tile(np.arange(salt, dtype=np.int64), n)
                bucket = bucket[idx] * salt + sub
                cols = {name: pc.take(arr, pa.array(idx))
                        for name, arr in cols.items()}
                n = len(idx)
        cols["__bucket"] = pa.array(bucket)
        cols["__side"] = pa.array([side] * n)
        return pa.table(cols)

    return ds.map_batches(tag, batch_format="pyarrow")


def hash_join(left: Dataset, right: Dataset, on: str, how: str = "inner",
              num_buckets: int = 32, suffixes: tuple[str, str] = ("", "_r"),
              salt: int = 1, native: bool = False) -> Dataset:
    """Partitioned hash join via groupby(bucket) + per-bucket pandas merge.

    ``salt`` > 1 splits each key bucket into salt sub-buckets with the
    small (right) side replicated — use when a hot key would overwhelm
    one group (inner joins only). ``native=True`` delegates to Ray's
    hash-shuffle ``Dataset.join`` (Ray ≥ 2.46) — same semantics, engine
    shuffle machinery."""
    if native:
        return left.join(right, join_type=how, num_partitions=num_buckets,
                         on=(on,), left_suffix=suffixes[0],
                         right_suffix=suffixes[1])
    if salt > 1 and how != "inner":
        raise ValueError("salted hash_join supports how='inner' only "
                         "(replicated right rows would duplicate outer "
                         "non-matches)")
    lsch, rsch = left.schema(), right.schema()
    left_cols = list(lsch.names)
    right_cols = list(rsch.names)
    unified: list[tuple[str, pa.DataType]] = []
    seen = set()
    for sch in (lsch, rsch):
        for name, typ in zip(sch.names, sch.types):
            if name not in seen:
                unified.append((name, typ))
                seen.add(name)
    tagged = _tag_and_bucket(left, on, "l", num_buckets, unified, salt).union(
        _tag_and_bucket(right, on, "r", num_buckets, unified, salt))

    # expected output dtypes, including suffix-renamed collision columns
    # (a one-sided/empty bucket must emit the SAME block schema as a
    # populated one — Ray's shuffle requires uniform block types)
    out_dtypes: dict[str, object] = {}
    l_map = dict(zip(lsch.names, lsch.types))
    r_map = dict(zip(rsch.names, rsch.types))
    for c in left_cols:
        name = c if (c == on or c not in r_map) else c + suffixes[0]
        out_dtypes[name] = _pd_dtype(l_map[c])
    for c in right_cols:
        if c == on:
            continue
        name = c if c not in l_map else c + suffixes[1]
        out_dtypes[name] = _pd_dtype(r_map[c])

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].reindex(columns=left_cols)
        r = g[g["__side"] == "r"].reindex(columns=right_cols)
        out = l.merge(r, on=on, how=how, suffixes=suffixes)
        if how == "inner":
            # empty-side merges promote ints to float; inner joins can't
            # contain NaN, so restore the source dtypes for stable block
            # schemas (Ray's sort shuffle requires uniform types)
            casts = {c: out_dtypes[c] for c in out.columns
                     if c in out_dtypes and out[c].dtype != out_dtypes[c]}
            if casts:
                out = out.astype(casts)
        return out

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def asof_join(left: Dataset, right: Dataset, by: str = "user_id",
              on: str = "ts", num_buckets: int = 32,
              suffix: str = "_r") -> Dataset:
    """Most-recent-at-or-before join (the as-of join the Dataset API
    lacks): for each left row, the right row with the same ``by`` key
    and the greatest ``on`` value ≤ the left row's (inner semantics —
    left rows with no match drop). Expressed as ONE hash shuffle: both
    sides tagged + bucketed by key, per-bucket the right side is sorted
    once and every left row binary-searches it. Partitioning assumption:
    one key bucket fits a worker (same contract as groupby.map_groups);
    salt hot keys upstream if a single ``by`` value dominates."""
    lsch, rsch = left.schema(), right.schema()
    left_cols = list(lsch.names)
    right_cols = list(rsch.names)
    unified: list[tuple[str, pa.DataType]] = []
    seen: set[str] = set()
    for sch in (lsch, rsch):
        for name, typ in zip(sch.names, sch.types):
            if name not in seen:
                unified.append((name, typ))
                seen.add(name)
    tagged = _tag_and_bucket(left, by, "l", num_buckets, unified).union(
        _tag_and_bucket(right, by, "r", num_buckets, unified))

    # output layout: every left col, then every right col except the key
    # (suffixed on collision) — right's ``on`` rides along as on+suffix
    out_cols = left_cols + [c + (suffix if c in left_cols else "")
                            for c in right_cols if c != by]
    l_map = dict(zip(lsch.names, lsch.types))
    r_map = dict(zip(rsch.names, rsch.types))
    out_dtypes = {c: _pd_dtype(l_map[c]) for c in left_cols}
    for c in right_cols:
        if c != by:
            out_dtypes[c + (suffix if c in left_cols else "")] = \
                _pd_dtype(r_map[c])

    def typed_empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                             for c in out_cols})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].reindex(columns=left_cols)
        r = g[g["__side"] == "r"].reindex(columns=right_cols)
        if l.empty or r.empty:
            return typed_empty()
        # one vectorized merge_asof per bucket (C mergesort over all
        # keys at once — no per-key Python loop): backward direction
        # with exact matches = greatest right ``on`` ≤ left ``on``;
        # ties on (by, on) resolve to the last stable-sorted right row,
        # matching the previous searchsorted(side="right")-1 semantics
        r = r.assign(__r_on=r[on])
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(on, kind="mergesort")
        out = pd.merge_asof(l, r, on=on, by=by, suffixes=("", suffix),
                            direction="backward", allow_exact_matches=True)
        out = out[out["__r_on"].notna()]  # inner semantics: no-match drops
        if out.empty:
            return typed_empty()
        out = out.rename(columns={"__r_on": on + suffix})
        out = out.reindex(columns=out_cols)
        casts = {c: out_dtypes[c] for c in out_cols
                 if out[c].dtype != out_dtypes[c]}
        return out.astype(casts) if casts else out

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def range_join(left: Dataset, right: Dataset, by: str, on: str,
               lower: int, upper: int, num_buckets: int = 32,
               suffix: str = "_r") -> Dataset:
    """Interval/range join (the Dataset API lacks one): emit a row for
    EVERY (left, right) pair with equal ``by`` keys and
    ``left.on - right.on`` in ``[lower, upper]`` (inclusive, int64 —
    µs timestamps). One-to-many, unlike :func:`asof_join`'s
    most-recent-one. Inner semantics: unmatched rows drop.

    Scale shape: ONE hash shuffle on ``by`` (same contract as
    asof_join), then per bucket a banded equality merge instead of a
    per-user cartesian: time bands of width W = upper - lower mean a
    left row's match window [on-upper, on-lower] spans at most two
    bands, so each left row is replicated into ≤2 (user, band) keys
    and each right row into exactly one — the pandas merge is pure
    equality on (by, band) and the final range filter is vectorized.
    Per-pair cost is O(1); no key's rows are crossed beyond genuine
    band co-residency. Hot-``by``-key note: a single key's rows still
    co-locate one bucket; the band split inside the merge keeps the
    blow-up bounded by true match density, not key frequency.
    """
    if upper < lower:
        raise ValueError("range_join requires lower <= upper")
    width = max(int(upper) - int(lower), 1)
    lsch, rsch = left.schema(), right.schema()
    left_cols = list(lsch.names)
    right_cols = list(rsch.names)
    unified: list[tuple[str, pa.DataType]] = []
    seen: set[str] = set()
    for sch in (lsch, rsch):
        for name, typ in zip(sch.names, sch.types):
            if name not in seen:
                unified.append((name, typ))
                seen.add(name)
    tagged = _tag_and_bucket(left, by, "l", num_buckets, unified).union(
        _tag_and_bucket(right, by, "r", num_buckets, unified))

    # output layout mirrors asof_join: left cols, then right cols except
    # the key, suffixed on collision (right ``on`` -> on+suffix)
    out_cols = left_cols + [c + (suffix if c in left_cols else "")
                            for c in right_cols if c != by]
    l_map = dict(zip(lsch.names, lsch.types))
    r_map = dict(zip(rsch.names, rsch.types))
    out_dtypes = {c: _pd_dtype(l_map[c]) for c in left_cols}
    for c in right_cols:
        if c != by:
            out_dtypes[c + (suffix if c in left_cols else "")] = \
                _pd_dtype(r_map[c])

    def typed_empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=out_dtypes[c])
                             for c in out_cols})

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].reindex(columns=left_cols)
        r = g[g["__side"] == "r"].reindex(columns=right_cols)
        if l.empty or r.empty:
            return typed_empty()
        lon = l[on].to_numpy().astype(np.int64)
        # match window for right.on: [lon - upper, lon - lower]
        b0 = np.floor_divide(lon - upper, width)
        b1 = np.floor_divide(lon - lower, width)
        reps = (b1 - b0 + 1).astype(np.int64)  # 1 or 2 bands per row
        idx = np.repeat(np.arange(len(l), dtype=np.int64), reps)
        offs = np.arange(len(idx), dtype=np.int64) - \
            np.repeat(np.cumsum(reps) - reps, reps)
        lrep = l.iloc[idx].copy()
        lrep["__band"] = b0[idx] + offs
        rb = r.copy()
        rb["__band"] = np.floor_divide(
            r[on].to_numpy().astype(np.int64), width)
        out = lrep.merge(rb, on=[by, "__band"], suffixes=("", suffix))
        if out.empty:
            return typed_empty()
        d = out[on].to_numpy().astype(np.int64) - \
            out[on + suffix].to_numpy().astype(np.int64)
        out = out[(d >= lower) & (d <= upper)]
        if out.empty:
            return typed_empty()
        out = out.reindex(columns=out_cols)
        casts = {c: out_dtypes[c] for c in out_cols
                 if out[c].dtype != out_dtypes[c]}
        return out.astype(casts) if casts else out

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")


def propagate_min_labels_ds(pairs: Dataset, nodes: Dataset,
                            node_col: str = "doc_id",
                            max_iters: int = 20,
                            num_buckets: int = 16) -> Dataset:
    """Dataset-native connected components by min-label propagation —
    the label table is a Dataset END TO END. Driver-resident state is
    O(1): per-round scalars (edge count, changed-row count) only; no
    node array, no pandas label frame, no per-round ``ray.put`` of a
    label map. This is the 100-TB path (propagate_min_labels below is
    the legacy pandas-frame variant, kept for small-corpus callers).

    ``pairs``: Dataset with int64 edge columns a, b (repeated edges
    fine — Min is idempotent). ``nodes``: Dataset with a unique int64
    ``node_col`` column. Returns a Dataset (doc_id, cluster_id);
    singletons keep their own id.

    Per round: one partitioned hash join (edges ⋈ labels on dst) + one
    hash-bucket shuffle over (own ∪ neighbor) candidate labels with a
    VECTORIZED pandas min/max per bucket — Ray's native
    groupby(node).aggregate() at ~10⁶+ distinct keys measured ~50×
    slower than the bucket groupby, so the per-node aggregation happens
    inside each of ``num_buckets`` groups instead. The old label rides
    along as max over an ``own`` sentinel column, so the convergence
    check (#changed == 0) falls out of the same shuffle — no extra
    label-vs-label join. Labels only ever decrease, so the fixpoint
    test is exact.
    """

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table({
            "dst": pa.concat_arrays([t["a"].combine_chunks(),
                                     t["b"].combine_chunks()]),
            "src": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()]),
        })

    def tag_edge_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["dst"].combine_chunks()).astype(np.int64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(["dst", "src"])[["dst", "src"]]
                .reset_index(drop=True))

    # materialized once, DEDUPED once: LSH band buckets emit the same
    # pair from up to num_bands bands — paying that duplication in
    # every propagation round's join would multiply round cost
    edges = (pairs.map_batches(symmetrize, batch_format="pyarrow")
             .map_batches(tag_edge_bucket, batch_format="pyarrow")
             .groupby("__bucket").map_groups(dedup_edges,
                                             batch_format="pandas")
             .materialize())

    labels = nodes.map_batches(
        lambda t: pa.table({
            "node": t[node_col].combine_chunks().cast(pa.int64()),
            "label": t[node_col].combine_chunks().cast(pa.int64()),
        }), batch_format="pyarrow").materialize()

    def finish(lbl: Dataset) -> Dataset:
        return lbl.map_batches(
            lambda t: pa.table({
                "doc_id": t["node"].combine_chunks(),
                "cluster_id": t["label"].combine_chunks(),
            }), batch_format="pyarrow")

    if edges.count() == 0:
        return finish(labels)

    # the per-round groupby would otherwise DOUBLE the label table's
    # block count every round (aggregate output partitions = input
    # blocks; own ∪ cand ≈ 2× labels' blocks) — exponential scheduling
    # cost. Pin the block count: enough blocks for parallelism, sized
    # ~4M label rows (64 MB) per block.
    n_label_blocks = max(num_buckets,
                         int(np.ceil(labels.count() / 4_000_000)))

    def tag_bucket(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(t["node"].combine_chunks()).astype(np.int64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets))
                                 .astype(np.int64)))

    def bucket_agg(df: pd.DataFrame) -> pd.DataFrame:
        # per-node min(label) + max(own)=old label, vectorized inside
        # the bucket (C groupby, not a per-key Ray aggregate)
        return (df.groupby("node", sort=False)
                .agg(label=("label", "min"), old=("own", "max"))
                .reset_index()[["node", "label", "old"]])

    for _ in range(max_iters):
        # neighbor candidates: edge dst looks up its current label,
        # propagated to src ("own" = -1 sentinel; real labels are
        # non-negative 63-bit ids, so max(own) recovers the old label
        # from the single own-row per node)
        lbl_dst = labels.map_batches(
            lambda t: pa.table({"dst": t["node"].combine_chunks(),
                                "cand": t["label"].combine_chunks()}),
            batch_format="pyarrow")
        cand = hash_join(edges, lbl_dst, on="dst",
                         num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "node": t["src"].combine_chunks(),
                "label": t["cand"].combine_chunks(),
                "own": pa.array(np.full(t.num_rows, -1, np.int64)),
            }), batch_format="pyarrow")
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"].combine_chunks(),
                                "label": t["label"].combine_chunks(),
                                "own": t["label"].combine_chunks()}),
            batch_format="pyarrow")
        agg = (own.union(cand)
               .map_batches(tag_bucket, batch_format="pyarrow")
               .groupby("__bucket").map_groups(bucket_agg,
                                               batch_format="pandas")
               .repartition(n_label_blocks)
               .materialize())
        # repartition keeps the label table's block count pinned —
        # aggregate output partitioning would otherwise grow it every
        # round (exponential scheduling cost, measured)
        changed = agg.map_batches(
            lambda t: pa.table({"changed": pa.array(
                [int(pc.sum(pc.cast(pc.not_equal(
                    t["label"], t["old"]), pa.int64())).as_py() or 0)],
                pa.int64())}), batch_format="pyarrow").sum("changed")
        labels = agg.select_columns(["node", "label"])
        if not changed:
            break
    return finish(labels)


def propagate_min_labels(pairs: Dataset, node_ids: np.ndarray,
                         max_iters: int = 20,
                         num_buckets: int = 16,
                         lookup: str = "broadcast") -> pd.DataFrame:
    """Distributed connected components by iterative min-label
    propagation: each round, every node's label becomes the min of its
    own and its neighbors' labels (groupby-aggregate over the edge
    list); stop at fixpoint. The scale path for dedup clustering when
    the verified-pair set outgrows the driver (functions/dedup.py uses
    the driver loop below that size).

    ``pairs``: Dataset with int64 columns a, b. Returns pandas
    (doc_id, cluster_id) for all ``node_ids`` (singletons keep own id).

    ``lookup="broadcast"``: the per-round neighbor-label map ships via
    ray.put — fine to ~10⁸ nodes. ``lookup="join"``: the edge list is
    hash-joined against the label table instead (no broadcast) — the
    unbounded path; identical results (tested).
    """
    from ray.data.aggregate import Min

    edges = pairs.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([t["a"].combine_chunks(),
                                     t["b"].combine_chunks()]),
            "dst": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()]),
        }), batch_format="pyarrow").materialize()
    # materialized once: each propagation round re-consumes the edge
    # blocks, not the whole upstream (signature/bucket) pipeline

    labels = pd.DataFrame({"node": np.sort(node_ids),
                           "label": np.sort(node_ids)})
    if edges.count() == 0:
        return labels.rename(columns={"node": "doc_id", "label": "cluster_id"})

    if lookup == "join":
        import ray.data as rd_mod

        for _ in range(max_iters):
            lbl_ds = rd_mod.from_arrow(pa.table({
                "dst": pa.array(labels["node"].to_numpy(), pa.int64()),
                "cand": pa.array(labels["label"].to_numpy(), pa.int64()),
            }))
            cand = (hash_join(edges, lbl_ds, on="dst",
                              num_buckets=num_buckets)
                    .groupby("src").aggregate(Min("cand", alias_name="cand"))
                    .to_pandas().rename(columns={"src": "node"}))
            merged = labels.merge(cand, on="node", how="left")
            new = np.minimum(
                merged["label"],
                merged["cand"].fillna(merged["label"]).astype(np.int64))
            if (new == labels["label"]).all():
                break
            labels = pd.DataFrame({"node": labels["node"], "label": new})
        return labels.rename(columns={"node": "doc_id", "label": "cluster_id"})
    for _ in range(max_iters):
        lbl_ref = ray.put(labels.set_index("node")["label"])

        def neighbor_labels(t: pa.Table) -> pa.Table:
            lbl = ray.get(lbl_ref)
            src = np.asarray(t["src"].combine_chunks())
            dst = np.asarray(t["dst"].combine_chunks())
            return pa.table({"node": src,
                             "cand": lbl.reindex(dst).to_numpy()})

        cand = (edges.map_batches(neighbor_labels, batch_format="pyarrow")
                .groupby("node").aggregate(Min("cand", alias_name="cand"))
                .to_pandas())
        merged = labels.merge(cand, on="node", how="left")
        new = np.minimum(merged["label"],
                         merged["cand"].fillna(merged["label"]).astype(np.int64))
        if (new == labels["label"]).all():
            break
        labels = pd.DataFrame({"node": labels["node"], "label": new})
    return labels.rename(columns={"node": "doc_id", "label": "cluster_id"})
