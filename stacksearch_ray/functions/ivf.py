"""IVF (inverted-file) approximate nearest neighbor — the classic
coarse-quantizer scale path for similarity search (complements the
random-hyperplane LSH in similarity.py): k-means centroids partition
the corpus; a query probes only its ``nprobe`` nearest partitions and
scores exactly inside them.

Distributed k-means with ORDER-INDEPENDENT updates: each iteration
assigns rows to their nearest centroid inside map_batches (centroids
broadcast once per iteration) and emits per-centroid partial sums of
per-row MICROS values (int64 floor(x·1e6 + 0.5) — the repo's float
convention). Integer sums commute, so the trained centroids are
bitwise identical no matter how Ray batches the data — and a pure-NumPy
single-process mirror (``kmeans_numpy``) reproduces them exactly, which
is how the driver entry's DuckDB oracle gets its centroid literals.

``IVFIndex`` persists the corpus as centroid-partitioned parquet
(hive-style ``cid=N`` directories): search reads ONLY the probed
partitions — at 100 TB that is the difference between scanning the
corpus and scanning nprobe/k of it.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data import Dataset

from ..micros import to_micros
from .similarity import _emb_matrix


def centroid_d2(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Squared-L2 distance matrix (n × k) — THE metric expression for
    every centroid consumer (assignment here, partition probing in
    hnsw.py); one definition so assignment and probing can never
    diverge numerically."""
    return ((x * x).sum(axis=1, keepdims=True)
            - 2.0 * (x @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :])


def assign_centroids(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by L2; ties break to the LOWEST centroid id
    (np.argmin returns the first minimum)."""
    return np.argmin(centroid_d2(x, centroids), axis=1).astype(np.int64)


def _init_centroids(k: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, dim))


def _data_seeded_kmeans(x: np.ndarray, k: int, iters: int = 2
                        ) -> np.ndarray:
    """Deterministic Lloyd with DATA-seeded init (evenly spaced rows of
    the id-sorted input) — the in-task splitter for hot SemDeDup
    cells. A standard-normal init (kmeans_numpy) degenerates to one
    cluster when the cell's vectors live far from the origin — which
    is exactly the hot-cell shape (a dense off-center blob) — so the
    splitter seeds from the data itself. Exact int64-micros centroid
    updates via sort + reduceat (no float accumulation order, no
    np.add.at scatter cost on 10⁶-row cells)."""
    x = np.asarray(x, dtype=np.float64)
    sel = np.linspace(0, len(x) - 1, k).astype(np.int64)
    c = x[sel].copy()
    m = to_micros(x)
    for _ in range(iters):
        a = assign_centroids(x, c)
        order = np.argsort(a, kind="stable")
        sa = a[order]
        starts = np.r_[0, np.flatnonzero(np.diff(sa)) + 1]
        sums_g = np.add.reduceat(m[order], starts, axis=0)
        present = sa[starts]
        counts = np.bincount(a, minlength=k).astype(np.int64)
        c = c.copy()
        c[present] = sums_g / (counts[present, None] * 1e6)
    return c


def kmeans_numpy(x: np.ndarray, k: int = 8, iters: int = 4,
                 seed: int = 17) -> np.ndarray:
    """Single-process mirror of the distributed trainer — bitwise
    identical centroids (micros-exact sums commute). Used by tests and
    by the DuckDB oracle to embed centroid literals without Ray."""
    x = np.asarray(x, dtype=np.float64)
    c = _init_centroids(k, x.shape[1], seed)
    m = to_micros(x)
    for _ in range(iters):
        a = assign_centroids(x, c)
        sums = np.zeros((k, x.shape[1]), dtype=np.int64)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        nz = counts > 0
        c = c.copy()
        c[nz] = sums[nz] / (counts[nz, None] * 1e6)
    return c


def train_kmeans(ds: Dataset, k: int = 8, iters: int = 4, seed: int = 17,
                 emb_col: str = "embedding",
                 id_col: str = "vec_id") -> np.ndarray:
    """Distributed Lloyd's: one Dataset pass per iteration, partial
    per-centroid int64 micros-sums per batch, driver applies the exact
    update. Bitwise equal to kmeans_numpy on the same data (tested)."""
    sample = ds.limit(1).take(1)[0][emb_col]
    dim = len(sample)
    c = _init_centroids(k, dim, seed)
    ds = ds.materialize()
    for _ in range(iters):
        c_ref = ray.put(c)

        def partial(batch: pa.Table, _c=c_ref) -> pa.Table:
            cents = ray.get(_c)
            x = _emb_matrix(batch, emb_col)
            if len(x) == 0:
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.int64())),
                    "n": pa.array([], pa.int64())})
            a = assign_centroids(x, cents)
            m = to_micros(x)
            sums = np.zeros((len(cents), x.shape[1]), dtype=np.int64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=len(cents)).astype(np.int64)
            nz = np.flatnonzero(counts)
            return pa.table({
                "cid": pa.array(nz, pa.int64()),
                "s": pa.array([sums[j].tolist() for j in nz],
                              pa.list_(pa.int64())),
                "n": pa.array(counts[nz], pa.int64()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for cid, s, n in zip(parts["cid"], parts["s"], parts["n"]):
            sums[int(cid)] += np.asarray(s, dtype=np.int64)
            counts[int(cid)] += int(n)
        nz = counts > 0
        c = c.copy()
        c[nz] = sums[nz] / (counts[nz, None] * 1e6)
    return c


class IVFIndex:
    """Centroid-partitioned parquet ANN index.

    ``build`` assigns every row to its centroid inside map_batches and
    writes hive-partitioned parquet (``cid=N/``); ``search`` probes the
    ``nprobe`` nearest centroid partitions (predicate-pushdown read of
    only those directories) and scores exact cosine inside them —
    candidates are pruned at the READ, not after it."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "config.json")) as f:
            cfg = json.load(f)
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        self.emb_col = cfg["emb_col"]
        self.id_col = cfg["id_col"]
        self.k = int(cfg["k"])
        # committed append generations (see append()); missing manifest
        # = a pre-append index, zero generations
        mpath = os.path.join(index_dir, "append_manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                self.generations = list(json.load(f)["generations"])
        else:
            self.generations = []
        # tombstoned ids (delete()): SORTED int64 for the search-time
        # membership mask; physically present until compact_to
        tpath = os.path.join(index_dir, "tombstones.json")
        if os.path.exists(tpath):
            with open(tpath) as f:
                self.tombstones = np.asarray(sorted(json.load(f)["ids"]),
                                             dtype=np.int64)
        else:
            self.tombstones = np.empty(0, dtype=np.int64)

    @staticmethod
    def build(ds: Dataset, index_dir: str, k: int = 8, iters: int = 4,
              seed: int = 17, emb_col: str = "embedding",
              id_col: str = "vec_id") -> "IVFIndex":
        centroids = train_kmeans(ds, k, iters, seed, emb_col, id_col)
        os.makedirs(index_dir, exist_ok=True)
        np.save(os.path.join(index_dir, "centroids.npy"), centroids)
        c_ref = ray.put(centroids)

        def tag(batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch, emb_col)
            a = assign_centroids(x, ray.get(c_ref))
            return batch.append_column("cid", pa.array(a))

        (ds.map_batches(tag, batch_format="pyarrow")
         .write_parquet(os.path.join(index_dir, "lists"),
                        partition_cols=["cid"]))
        with open(os.path.join(index_dir, "config.json"), "w") as f:
            json.dump({"k": k, "iters": iters, "seed": seed,
                       "emb_col": emb_col, "id_col": id_col}, f)
        return IVFIndex(index_dir)

    def append(self, ds: Dataset) -> int:
        """Incremental add under the FROZEN coarse quantizer (FAISS
        IVF ``add`` semantics — centroids never retrain on append, so
        existing partition membership is stable and search stays a
        probe of the same cells): new vectors assign to the EXISTING
        centroids and land in a new append GENERATION directory,
        hive-partitioned exactly like the base lists. The manifest
        rewrite (tmp + os.replace) is the commit point: an interrupted
        append leaves an uncommitted gen directory search never reads,
        and a retry replaces it wholesale — appends are idempotent
        under crash-retry. Returns the committed generation number.
        Caller contract: ids disjoint from rows already indexed (same
        as build's)."""
        import shutil

        gen = (max(self.generations) + 1) if self.generations else 1
        gdir = os.path.join(self.index_dir, "appends", f"gen-{gen}")
        if os.path.isdir(gdir):
            shutil.rmtree(gdir)  # crashed earlier attempt: replace
        c_ref = ray.put(self.centroids)
        emb_col = self.emb_col

        def tag(batch: pa.Table) -> pa.Table:
            x = _emb_matrix(batch, emb_col)
            a = assign_centroids(x, ray.get(c_ref))
            return batch.append_column("cid", pa.array(a))

        (ds.map_batches(tag, batch_format="pyarrow")
         .write_parquet(gdir, partition_cols=["cid"]))
        mpath = os.path.join(self.index_dir, "append_manifest.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"generations": self.generations + [gen]}, f)
        os.replace(tmp, mpath)  # COMMIT
        self.generations.append(gen)
        return gen

    def delete(self, ids) -> int:
        """Tombstone delete (the vector twin of the text index's
        delete_from_index): ids stay physically present until
        compact_to, but search masks them via a sorted membership
        probe BEFORE scoring. Cosine has no collection statistics, so
        — unlike BM25's deleted-df correction — surviving scores are
        untouched by construction. Atomic tmp+rename; idempotent (set
        union). Returns the tombstone count after the union."""
        cur = set(int(i) for i in self.tombstones)
        cur.update(int(i) for i in ids)
        arr = sorted(cur)
        tpath = os.path.join(self.index_dir, "tombstones.json")
        tmp = tpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"ids": arr}, f)
        os.replace(tmp, tpath)  # COMMIT
        self.tombstones = np.asarray(arr, dtype=np.int64)
        return len(arr)

    def compact_to(self, dst_dir: str) -> "IVFIndex":
        """Physical rewrite: drop tombstoned rows and fold append
        generations into the base lists — the vector twin of
        compact_index. One Ray task per centroid cell reads the cell's
        base + generation files, filters tombstones, and writes ONE
        parquet file into the new index (work and memory bounded by
        the largest cell, tasks fan out across the cluster); the
        driver writes centroids + config.json LAST, so an interrupted
        compact leaves an unopenable directory — delete and re-run.
        Search results over the compacted index are identical to the
        tombstone-masked source (scores are per-pair cosines)."""
        import shutil

        if os.path.isdir(dst_dir):
            shutil.rmtree(dst_dir)  # crashed earlier attempt
        lists_dir = os.path.join(dst_dir, "lists")
        os.makedirs(lists_dir, exist_ok=True)
        tomb_ref = ray.put(self.tombstones)
        id_col, emb_col = self.id_col, self.emb_col

        @ray.remote
        def compact_cell(cid: int, src_dirs: list[str], out_dir: str,
                         tomb) -> int:
            pa.set_cpu_count(1)  # rule 3: no Arrow pool per fanned task
            ts = ray.get(tomb) if not isinstance(tomb, np.ndarray) else tomb
            tabs = [pq.read_table(d, columns=[id_col, emb_col],
                                  use_threads=False)
                    for d in src_dirs]
            t = pa.concat_tables(tabs)
            ids = np.asarray(t[id_col].combine_chunks()).astype(np.int64)
            if len(ts):
                pos = np.searchsorted(ts, ids)
                dead = pos < len(ts)
                dead[dead] = ts[pos[dead]] == ids[dead]
                t = t.filter(pa.array(~dead))
            if t.num_rows == 0:
                return 0
            cdir = os.path.join(out_dir, f"cid={cid}")
            os.makedirs(cdir, exist_ok=True)
            pq.write_table(t, os.path.join(cdir, "part-0.parquet"))
            return t.num_rows

        futs = []
        for cid in range(len(self.centroids)):
            dirs = self._part_dirs(cid)
            if dirs:
                futs.append(compact_cell.remote(cid, dirs, lists_dir,
                                                tomb_ref))
        ray.get(futs)
        np.save(os.path.join(dst_dir, "centroids.npy"), self.centroids)
        with open(os.path.join(dst_dir, "config.json"), "w") as f:
            json.dump({"k": self.k, "emb_col": emb_col,
                       "id_col": id_col, "compacted_from":
                       os.path.basename(self.index_dir)}, f)
        # config.json written LAST = the commit point
        return IVFIndex(dst_dir)

    def semdedup(self, tau_micros: int, block: int = 1024,
                 max_cell_rows: int = 65536):
        """SemDeDup keep-first pass over this index's cells (Abbas et
        al. 2023, arXiv:2303.09540): ONE Ray task per centroid cell —
        the compact_to fan-out — each reading ONLY its cell's
        partitions (base + committed append generations, tombstones
        masked), sorting by id, and applying the BLOCKED lower-id
        cosine keep mask (functions.similarity.semdedup_keep_mask).
        NO shuffle: the coarse quantizer already partitioned the data
        on disk, so re-grouping through a Dataset groupby would move
        every vector again just to rebuild this layout (measured: the
        task-per-cell path beats the groupby re-shuffle at 500k×64 and
        the gap widens with k — BENCH/semdedup_drill_r4.json). Returns
        a Dataset of (vec_id, cell, keep) assembled from the per-cell
        result refs without driver materialization.

        HOT-CELL BOUND: per-cell work is O(cell²/block), so on a
        skewed embedding distribution one hot cell would stall the
        whole pass (the quadratic law measured in
        BENCH/semdedup_drill_2m_r4.json). A cell with more than
        ``max_cell_rows`` alive rows auto-splits: recursive
        deterministic in-task k-means (_data_seeded_kmeans — data-
        seeded init, no RNG state; kmeans_numpy's standard-normal init
        degenerates on exactly this off-center-blob shape) partitions
        it into worker-sized sub-cells, each deduped in its OWN child
        Ray task, so per-task wall time stays bounded by the cap
        whatever the skew (BENCH/semdedup_skew_r5.json); pieces still
        over the cap at the recursion limit fall back to id-chunks,
        keeping the bound unconditional. Keep-first
        semantics hold WITHIN each sub-cell (ids stay globally sorted;
        the finer granularity is the same approximation dial as
        raising k — SemDeDup never compares across cells to begin
        with). Identical-vector pathologies that k-means cannot split
        fall back to id-ordered chunks of the cap (still bounded, one
        keeper per chunk). The default cap never triggers at
        conformance scale, so the semdedup_corpus oracle sees the
        exact per-cell pass."""
        import ray.data as rd

        from .similarity import semdedup_keep_mask

        tomb_ref = ray.put(self.tombstones)
        id_col, emb_col = self.id_col, self.emb_col

        @ray.remote
        def subcell_keep(ids: np.ndarray, x: np.ndarray) -> tuple:
            keep = semdedup_keep_mask(x, tau_micros, block=block)
            return ids, keep

        @ray.remote
        def dedup_cell(cid: int, src_dirs: list[str], tomb) -> pa.Table:
            pa.set_cpu_count(1)  # rule 3: no Arrow pool per fanned task
            ts = ray.get(tomb) if not isinstance(tomb, np.ndarray) else tomb
            t = pa.concat_tables([
                pq.read_table(d, columns=[id_col, emb_col],
                              use_threads=False)
                for d in src_dirs])
            ids = np.asarray(t[id_col].combine_chunks()).astype(np.int64)
            if len(ts):
                pos = np.searchsorted(ts, ids)
                dead = pos < len(ts)
                dead[dead] = ts[pos[dead]] == ids[dead]
                alive = ~dead
                t = t.filter(pa.array(alive))
                ids = ids[alive]
            order = np.argsort(ids)  # keep-first = lowest id wins
            ids = ids[order]
            x = _emb_matrix(t, emb_col)[order]
            if len(ids) <= max_cell_rows:
                keep = semdedup_keep_mask(x, tau_micros, block=block)
            else:
                # hot cell: recursive deterministic split, then one
                # CHILD task per worker-sized sub-cell (the parent's
                # CPU is released while blocked in ray.get)
                pieces: list[tuple[np.ndarray, np.ndarray]] = []
                work = [(ids, x, 0)]
                while work:
                    pi, px, depth = work.pop()
                    if len(pi) <= max_cell_rows:
                        pieces.append((pi, px))
                        continue
                    if depth >= 8:
                        # recursion limit with the piece still over the
                        # cap (nested heavy tail k-means keeps failing
                        # to halve): id-chunk like the degenerate case
                        # so the per-task bound holds REGARDLESS of
                        # how the geometry splits
                        for s in range(0, len(pi), max_cell_rows):
                            pieces.append((pi[s:s + max_cell_rows],
                                           px[s:s + max_cell_rows]))
                        continue
                    kk = min(int(np.ceil(len(pi) / max_cell_rows)) + 1,
                             64)
                    cents = _data_seeded_kmeans(px, kk, iters=2)
                    a = assign_centroids(px, cents)
                    sizes = np.bincount(a, minlength=kk)
                    if sizes.max() == len(pi):
                        # unsplittable (e.g. identical vectors):
                        # id-order chunks keep the bound; one keeper
                        # per chunk is the documented approximation
                        for s in range(0, len(pi), max_cell_rows):
                            pieces.append((pi[s:s + max_cell_rows],
                                           px[s:s + max_cell_rows]))
                        continue
                    for j in range(kk):
                        sel = a == j
                        if sel.any():
                            work.append((pi[sel], px[sel], depth + 1))
                futs = [subcell_keep.remote(pi, px) for pi, px in pieces]
                parts = ray.get(futs)
                ids = np.concatenate([p[0] for p in parts])
                keep = np.concatenate([p[1] for p in parts])
                order = np.argsort(ids)
                ids, keep = ids[order], keep[order]
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(np.full(len(ids), cid, np.int64)),
                "keep": pa.array(keep.astype(np.int64)),
            })

        futs = []
        for cid in range(len(self.centroids)):
            dirs = self._part_dirs(cid)
            if dirs:
                futs.append(dedup_cell.remote(cid, dirs, tomb_ref))
        return rd.from_arrow_refs(futs)

    def _part_dirs(self, cid: int) -> list[str]:
        """Base partition + every COMMITTED append generation's
        partition for one cell, in commit order."""
        dirs = [os.path.join(self.index_dir, "lists", f"cid={cid}")]
        for g in self.generations:
            dirs.append(os.path.join(self.index_dir, "appends",
                                     f"gen-{g}", f"cid={cid}"))
        return [d for d in dirs if os.path.isdir(d)]

    def probe_order(self, q: np.ndarray) -> np.ndarray:
        d2 = ((self.centroids - q[None, :]) ** 2).sum(axis=1)
        return np.argsort(d2, kind="stable")

    def search(self, q: np.ndarray, k: int = 10,
               nprobe: int = 2) -> pa.Table:
        """(vec_id, sim_micros, rank) — exact cosine inside the probed
        partitions, order (sim desc, vec_id asc)."""
        q = np.asarray(q, dtype=np.float64)
        probes = [int(c) for c in self.probe_order(q)[:nprobe]]
        tabs = []
        for cid in probes:
            for part in self._part_dirs(cid):
                tabs.append(pq.read_table(
                    part, columns=[self.id_col, self.emb_col]))
        if not tabs:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim_micros": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        t = pa.concat_tables(tabs)
        x = _emb_matrix(t, self.emb_col)
        ids = np.asarray(t[self.id_col].combine_chunks()).astype(np.int64)
        nq = float(np.sqrt((q * q).sum()))
        nx = np.sqrt((x * x).sum(axis=1))
        ok = (nx > 0)
        if len(self.tombstones):
            # deleted docs never surface (masked BEFORE scoring; cosine
            # is per-pair so survivors' scores are untouched)
            pos = np.searchsorted(self.tombstones, ids)
            dead = pos < len(self.tombstones)
            dead[dead] = self.tombstones[pos[dead]] == ids[dead]
            ok &= ~dead
        sim = (x[ok] @ q) / (nx[ok] * nq) if nq > 0 else np.zeros(ok.sum())
        ids = ids[ok]
        order = np.lexsort((ids, -sim))[:k]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "sim_micros": pa.array(to_micros(sim[order]), pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })
