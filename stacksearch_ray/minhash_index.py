"""MinHash-LSH *search* index — the reference's actual retrieval path
(/root/reference/index/index_new.py:14-85: insert → LSH bucket query →
Jaccard re-rank → save/load), re-expressed Ray-Data-first.

Instead of a pickled in-memory datasketch LSH, the index is two parquet
tables built by a streaming Dataset pipeline and queried with predicate
pushdown (no full load at query time):

- ``signatures/``  (doc_id, sig<binary>) — one minhash signature per doc
- ``buckets/``     (band, band_hash, doc_id) — the LSH banding table
- ``config.json``  (num_perm, num_bands, shingle_k, seed, size)

``search(text, top_k)``: query signature → candidate doc_ids from the
matching (band, band_hash) buckets (parquet row-group pruning on
band_hash) → signature-Jaccard re-rank (the reference's
``compute_jaccard_sim`` analog, estimated from signature agreement) →
top-k by (jaccard desc, doc_id asc). ``add()`` appends new docs as
additional parquet files (ids must be fresh), matching the reference's
incremental ``insert``.

Shares the dedup signature machinery (functions/dedup.py);
``shingle_k=1`` (word unigrams) mirrors the reference's per-word
MinHash.update loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

from .functions.dedup import (
    _bands_batch,
    _minhash_params,
    minhash_signatures,
    minhash_signatures_batch,
)


def _sig_binary_table(t: pa.Table, num_perm: int) -> pa.Table:
    mat = np.ascontiguousarray(
        np.asarray(t["sig"].combine_chunks().flatten()).reshape(-1, num_perm))
    raw = mat.tobytes()
    w = num_perm * 8
    return pa.table({
        "doc_id": t["doc_id"],
        "sig": pa.array([raw[i * w:(i + 1) * w] for i in range(len(t))],
                        pa.binary()),
    })


class MinHashSearchIndex:
    """Build once (``build``), query many (``search`` /
    ``search_by_doc``), extend incrementally (``add``), reopen from disk
    (constructor) — the MinHashIndex API surface on parquet."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.sig_dir = os.path.join(index_dir, "signatures")
        self.bucket_dir = os.path.join(index_dir, "buckets")
        self.config_path = os.path.join(index_dir, "config.json")
        if os.path.exists(self.config_path):
            with open(self.config_path) as f:
                self.config = json.load(f)
        else:
            self.config = {}

    # ---- build / append ----

    @classmethod
    def build(cls, ds: Dataset, index_dir: str, text_col: str = "text",
              id_col: str = "doc_id", num_perm: int = 128,
              num_bands: int = 16, shingle_k: int = 1,
              seed: int = 7, hash_fn: str = "md5") -> "MinHashSearchIndex":
        idx = cls(index_dir)
        idx.config = {"num_perm": num_perm, "num_bands": num_bands,
                      "shingle_k": shingle_k, "seed": seed, "size": 0,
                      "hash_fn": hash_fn}
        sigs = minhash_signatures(ds, text_col, id_col, num_perm,
                                  shingle_k, seed, hash_fn).materialize()
        # both tables are written SORTED on their lookup key so parquet
        # row-group/file statistics prune the search-time reads
        # (band_hash IN (...) / doc_id IN (...) touch only matching
        # row groups instead of scanning the index)
        sigs.map_batches(
            lambda t: _sig_binary_table(t, num_perm),
            batch_format="pyarrow").sort("doc_id").write_parquet(idx.sig_dir)
        sigs.map_batches(
            lambda t: _bands_batch(t, num_bands, num_perm),
            batch_format="pyarrow").sort("band_hash").write_parquet(
                idx.bucket_dir)
        idx.config["size"] = sigs.count()
        idx._save_config()
        return idx

    def add(self, ds: Dataset, text_col: str = "text",
            id_col: str = "doc_id") -> int:
        """Incremental insert: new docs land as additional parquet files
        (the reference's insert(); caller guarantees fresh ids)."""
        c = self.config
        sigs = minhash_signatures(ds, text_col, id_col, c["num_perm"],
                                  c["shingle_k"], c["seed"],
                                  c.get("hash_fn", "pd")).materialize()
        sigs.map_batches(
            lambda t: _sig_binary_table(t, c["num_perm"]),
            batch_format="pyarrow").sort("doc_id").write_parquet(self.sig_dir)
        sigs.map_batches(
            lambda t: _bands_batch(t, c["num_bands"], c["num_perm"]),
            batch_format="pyarrow").sort("band_hash").write_parquet(
                self.bucket_dir)
        n = sigs.count()
        self.config["size"] += n
        self._save_config()
        return n

    def _save_config(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        with open(self.config_path, "w") as f:
            json.dump(self.config, f)

    def size(self) -> int:
        return int(self.config.get("size", 0))

    # ---- query ----

    def _query_signature(self, text: str) -> np.ndarray:
        c = self.config
        a, b = _minhash_params(c["num_perm"], c["seed"])
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([text], pa.string())})
        sig = minhash_signatures_batch(t, "text", "doc_id", c["num_perm"],
                                       c["shingle_k"], a, b,
                                       c.get("hash_fn", "pd"))
        return np.asarray(sig["sig"].combine_chunks().flatten()).reshape(
            c["num_perm"])

    def search(self, text: str, top_k: int = 10,
               exclude: int | None = None) -> list[tuple[int, float]]:
        """Top-k (doc_id, est_jaccard): LSH candidates → signature
        agreement re-rank, ties broken doc_id asc."""
        c = self.config
        qsig = self._query_signature(text)
        sig_t = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(qsig.reshape(-1)), c["num_perm"]),
        })
        bands = _bands_batch(sig_t, c["num_bands"], c["num_perm"])
        pairs = list(zip(bands["band"].to_pylist(),
                         bands["band_hash"].to_pylist()))
        hashes = [h for _, h in pairs]
        cand_t = pq.read_table(self.bucket_dir,
                               filters=[("band_hash", "in", hashes)])
        want = set(pairs)
        keep = [i for i, (bd, bh) in enumerate(
            zip(cand_t["band"].to_pylist(), cand_t["band_hash"].to_pylist()))
            if (bd, bh) in want]
        cand = np.unique(
            np.asarray(cand_t["doc_id"].take(pa.array(keep))).astype(np.int64)
        ) if keep else np.empty(0, dtype=np.int64)
        if exclude is not None:
            cand = cand[cand != exclude]
        if len(cand) == 0:
            return []
        sig_rows = pq.read_table(
            self.sig_dir, filters=[("doc_id", "in", cand.tolist())])
        ids = np.asarray(sig_rows["doc_id"]).astype(np.int64)
        mats = np.frombuffer(
            b"".join(sig_rows["sig"].to_pylist()),
            dtype=np.uint64).reshape(-1, c["num_perm"])
        est = (mats == qsig[None, :]).mean(axis=1)
        order = np.lexsort((ids, -est))[:top_k]
        return [(int(ids[i]), float(est[i])) for i in order]

    def search_by_doc(self, doc_id: int, text: str,
                      top_k: int = 10) -> list[tuple[int, float]]:
        """'Docs similar to this doc': same path, excluding the doc."""
        return self.search(text, top_k, exclude=doc_id)
