"""HNSW approximate nearest neighbor (Malkov & Yashunin 2016) — the
graph-based ANN family, completing the shelf next to LSH
(similarity.py), IVF (ivf.py), PQ (pq.py) and binary quantization
(bq.py). Public-algorithm implementation; no analog in /root/reference
(capability extension for the similarity-search tier).

Deterministic by construction (this repo's reproducibility rule):
- layer assignment hashes the doc id (md5-low64 → uniform U(0,1) →
  geometric ⌊−ln U / ln M⌋) instead of drawing randomness, so the same
  ids always build the same graph;
- every candidate ordering tie-breaks (distance, id);
- insertion order is ascending id.
The result is approximate but REPRODUCIBLE — pytest pins recall against
the brute-force oracle, and reruns cannot flake.

Scale shape: one HNSW graph is a shared mutable structure — the thing
Ray Data cannot (and should not) build as one object at 100 TB. The
distributed form is coarse-partition-then-graph: IVF centroids
partition the corpus (ivf.train_kmeans), ``map_groups`` builds one
graph PER PARTITION inside an actor (bounded memory: partition size,
not corpus size), and a query greedy-searches only its ``nprobe``
nearest partitions' graphs — exactly the IVF read-pruning story with a
sub-linear in-partition search instead of a linear scan.
``hnsw_partitioned_knn`` implements that composition.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from ray.data import Dataset

TWO64F = 18446744073709551616.0


def _levels_for_ids(ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic geometric layer assignment: U = (h+0.5)/2⁶⁴ from
    md5-low64 of the id — the standard ⌊−ln U / ln M⌋ draw with the
    randomness replaced by a hash (rebuilds are identical)."""
    from .dedup import md5_low64

    h = md5_low64(np.char.add("hnsw:", ids.astype(str)))
    u = (h.astype(np.float64) + 0.5) / TWO64F
    return np.floor(-np.log(u) / np.log(float(m))).astype(np.int64)


class HNSW:
    """Cosine-similarity HNSW over L2-normalized vectors (distance =
    1 − cos). Compact numpy/heapq implementation of the public
    algorithm: greedy descent through upper layers, best-first
    ``ef``-bounded search at each construction/query layer, simple
    closest-M neighbor selection with degree pruning (M at upper
    layers, 2M at layer 0)."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray, m: int = 8,
                 ef_construction: int = 64):
        self.ids = np.asarray(ids, dtype=np.int64)
        v = np.asarray(vecs, dtype=np.float64)
        n = np.linalg.norm(v, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        self.vecs = v / n
        self.m = m
        self.efc = ef_construction
        self.levels = _levels_for_ids(self.ids, m)
        # links[layer][node] -> np.ndarray of neighbor node indices
        self.links: list[dict[int, np.ndarray]] = []
        self.entry = -1
        order = np.argsort(self.ids)
        for i in order:
            self._insert(int(i))

    # -- internals ---------------------------------------------------

    def _dist(self, q: np.ndarray, nodes: np.ndarray) -> np.ndarray:
        return 1.0 - self.vecs[nodes] @ q

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Best-first search: returns up to ef (dist, node) ascending."""
        lk = self.links[layer]
        visited = set(eps)
        d0 = self._dist(q, np.array(eps, dtype=np.int64))
        cand = [(float(d), e) for d, e in zip(d0, eps)]
        heapq.heapify(cand)                       # min-heap by distance
        best = [(-d, e) for d, e in cand]          # max-heap (neg dist)
        heapq.heapify(best)
        while len(best) > ef:
            heapq.heappop(best)
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0] and len(best) >= ef:
                break
            neigh = [x for x in lk.get(c, ()) if x not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            nd = self._dist(q, np.array(neigh, dtype=np.int64))
            for dn, nn in sorted(zip(nd, neigh)):
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (float(dn), int(nn)))
                    heapq.heappush(best, (-float(dn), int(nn)))
                    if len(best) > ef:
                        heapq.heappop(best)
        out = [(-d, n) for d, n in best]
        out.sort(key=lambda t: (t[0], self.ids[t[1]]))
        return out

    def _select(self, found: list[tuple[float, int]], m: int
                ) -> np.ndarray:
        return np.array([n for _, n in found[:m]], dtype=np.int64)

    def _insert(self, node: int) -> None:
        lvl = int(self.levels[node])
        while len(self.links) <= lvl:
            self.links.append({})
        q = self.vecs[node]
        if self.entry < 0:
            self.entry = node
            for l in range(lvl + 1):
                self.links[l][node] = np.empty(0, np.int64)
            return
        ep = self.entry
        top = int(self.levels[self.entry])
        for l in range(top, lvl, -1):             # greedy descent
            ep = self._search_layer(q, [ep], 1, l)[0][1]
        for l in range(min(lvl, top), -1, -1):
            found = self._search_layer(q, [ep], self.efc, l)
            m_l = self.m * 2 if l == 0 else self.m
            neigh = self._select(found, m_l)
            self.links[l][node] = neigh
            for nb in neigh:                      # bidirectional + prune
                cur = self.links[l].get(int(nb), np.empty(0, np.int64))
                cur = np.append(cur, node)
                if len(cur) > m_l:
                    d = self._dist(self.vecs[nb], cur)
                    keep = np.lexsort((self.ids[cur], d))[:m_l]
                    cur = cur[keep]
                self.links[l][int(nb)] = cur
            ep = found[0][1]
        if lvl > top:
            self.entry = node

    # -- queries -----------------------------------------------------

    def search(self, q: np.ndarray, k: int = 10, ef: int = 64
               ) -> list[tuple[int, float]]:
        """Top-k (doc_id, cosine) — similarity descending, id ascending
        on ties. ``ef`` bounds layer-0 beam width (recall knob)."""
        if self.entry < 0:
            return []
        qn = np.asarray(q, dtype=np.float64)
        n = np.linalg.norm(qn)
        qn = qn / n if n else qn
        ep = self.entry
        for l in range(int(self.levels[self.entry]), 0, -1):
            ep = self._search_layer(qn, [ep], 1, l)[0][1]
        found = self._search_layer(qn, [ep], max(ef, k), 0)
        return [(int(self.ids[nn]), float(1.0 - d))
                for d, nn in found[:k]]


def hnsw_partitioned_knn(ds: Dataset, queries: np.ndarray, k: int = 10,
                         n_clusters: int = 8, nprobe: int = 2,
                         emb_col: str = "embedding",
                         id_col: str = "vec_id", m: int = 8,
                         ef: int = 64) -> pa.Table:
    """Distributed HNSW: IVF-partition the corpus (bitwise-deterministic
    k-means from ivf.py), build one graph per partition inside
    ``map_groups`` actors, answer each query from its ``nprobe``
    nearest partitions only. Rows: (query_id, vec_id, sim_micros, rank).

    The per-group task is bounded by the PARTITION (graph memory
    O(part·M), build O(part·log part) distance evaluations); the driver
    holds k×dim centroids and Q×k results only. At 100 TB raise
    n_clusters so partitions stay worker-sized — the same knob as
    IVFIndex."""
    from ..micros import to_micros
    from .ivf import assign_centroids, centroid_d2, train_kmeans
    from .similarity import _emb_matrix

    cents = train_kmeans(ds, k=n_clusters)
    qm = np.asarray(queries, dtype=np.float64)
    # per query: the nprobe nearest partitions (same metric expression
    # as vector assignment — centroid_d2 is shared by construction)
    qd = centroid_d2(qm, cents)
    probe = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    cid_to_queries: dict[int, list[int]] = {}
    for qi, row in enumerate(probe):
        for c in row:
            cid_to_queries.setdefault(int(c), []).append(qi)

    def tag(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch, emb_col)
        cid = assign_centroids(x, cents)
        return batch.append_column("cid", pa.array(cid, pa.int64()))

    def per_group(df):
        import pandas as pd

        cid = int(df["cid"].iloc[0])
        qids = cid_to_queries.get(cid, [])
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in ("query_id", "vec_id",
                                        "sim_micros", "rank")})
        if not qids:
            return empty
        ids = df[id_col].to_numpy(dtype=np.int64)
        vecs = np.stack(df[emb_col].to_numpy())
        graph = HNSW(ids, vecs, m=m)
        rows = {"query_id": [], "vec_id": [], "sim_micros": []}
        for qi in qids:
            for vid, sim in graph.search(qm[qi], k, ef=ef):
                rows["query_id"].append(qi)
                rows["vec_id"].append(vid)
                rows["sim_micros"].append(to_micros(sim))
        if not rows["query_id"]:
            return empty
        out = pd.DataFrame({k_: pd.Series(v, dtype="int64")
                            for k_, v in rows.items()})
        out["rank"] = np.int64(0)
        return out

    parts = (ds.map_batches(tag, batch_format="pyarrow")
             .groupby("cid").map_groups(per_group))
    pdf = parts.to_pandas()  # bounded: ≤ n_clusters·|Q|·k tiny rows
    pdf = pdf.sort_values(["query_id", "sim_micros", "vec_id"],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id", group_keys=False).head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.table({
        "query_id": pa.array(pdf["query_id"].astype(np.int64)),
        "vec_id": pa.array(pdf["vec_id"].astype(np.int64)),
        "sim_micros": pa.array(pdf["sim_micros"].astype(np.int64)),
        "rank": pa.array(pdf["rank"].astype(np.int64)),
    })


def hnsw_shortlist_rerank(ds: Dataset, queries: np.ndarray,
                          k: int = 10, candidates: int = 50,
                          n_clusters: int = 8, nprobe: int = 2,
                          emb_col: str = "embedding",
                          id_col: str = "vec_id", m: int = 8,
                          ef: int = 64) -> pa.Table:
    """Two-stage graph ANN: HNSW top-``candidates`` shortlist per query
    (hnsw_partitioned_knn — deterministic graphs, nprobe-bounded) →
    EXACT cosine re-rank of the shortlist union → top-k. Rows:
    (query_id, vec_id, sim_micros, rank) — knn_brute_force's contract.

    This is the knn_bq_rerank / knn_sq8_rerank shape applied to the
    graph family, and it is what makes HNSW *oracle-able*: the graph
    walk itself is not SQL-expressible, but whenever the per-query
    shortlist contains the true top-k (recall@k = 1 — the ef / nprobe
    knob, pinned by pytest at conformance scales), the re-ranked output
    IS the exact brute-force top-k, which a plain SQL window mirrors.
    Re-ranking over the UNION of shortlists is safe: top-k of any
    superset of the true top-k equals the true top-k, so a candidate
    contributed by another query can only be outscored, never wrongly
    promoted. The float column is re-read only for candidate rows
    (broadcast sorted id set — the two-stage-ANN read-pruning story)."""
    import ray

    from ..query import sorted_member_mask
    from .similarity import knn_brute_force

    short = hnsw_partitioned_knn(ds, queries, k=candidates,
                                 n_clusters=n_clusters, nprobe=nprobe,
                                 emb_col=emb_col, id_col=id_col,
                                 m=m, ef=ef)
    cand_ids = np.unique(np.asarray(short[id_col]).astype(np.int64))
    ids_ref = ray.put(cand_ids)

    def keep(batch: pa.Table) -> pa.Table:
        cids = ray.get(ids_ref)
        ids = np.asarray(batch[id_col].combine_chunks()).astype(np.int64)
        if len(ids) == 0:
            return batch
        return batch.filter(pa.array(sorted_member_mask(cids, ids)))

    sub = ds.map_batches(keep, batch_format="pyarrow")
    return knn_brute_force(sub, queries, k=k, emb_col=emb_col,
                           id_col=id_col, max_rows=None)
