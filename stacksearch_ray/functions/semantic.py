"""Semantic word embeddings trained as a Ray Data pipeline (F3/F5
proper — the reference trains gensim W2V/D2V models,
/root/reference/features/FeatureExtractors.py:77-119,163-188 and
models/train.py:209-223 build_vocab→train; gensim is neither available
nor public-reproducible here, so the public-knowledge equivalent is
count-based: PPMI co-occurrence factorized by truncated SVD, the
classic dense-embedding recipe of Levy & Goldberg 2014 / Bullinaria &
Levy 2007).

Training is distributed where the data is big and driver-side only
where the state is vocab-bounded:

- token counts → vocab:     map-side partial counts + one groupby SUM
                            (corpus-sized work, vocab-sized result)
- skip-gram pair counts:    per-batch vectorized window pairing +
                            np.unique partial counts, one groupby SUM
                            (corpus-sized work, ≤vocab²-sized result)
- PPMI + truncated SVD:     driver-side dense algebra on the V×V
                            co-occurrence matrix (V ≈ 2–20k: MBs, the
                            same scale the reference's in-memory gensim
                            vocab lives at)

The trained artifact (vocab + embedding matrix) persists under the
versioned layout ProjectionEncoder uses (models/api.py restore-latest
semantics) and serves through ``SemanticEncoder`` — an actor-pool
map_batches stage loading the artifact once per actor.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..text import tokenize_array


def _partial_counts(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    u, c = np.unique(keys, return_counts=True)
    return u, c.astype(np.int64)


def build_vocab(ds: Dataset, text_col: str = "text",
                vocab_size: int = 2000, min_count: int = 2) -> pd.DataFrame:
    """Top-``vocab_size`` terms by frequency (ties → lexicographic).
    Map-side partial counts per batch; the shuffle carries (term,
    partial_count), not tokens. Returns pandas (term, count, word_id) —
    vocab-bounded driver state, the one table small enough to broadcast.
    """
    def partials(b: pa.Table) -> pa.Table:
        flat, _, _ = tokenize_array(b[text_col].combine_chunks())
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        d = flat.dictionary_encode()
        cnt = np.bincount(np.asarray(d.indices).astype(np.int64),
                          minlength=len(d.dictionary))
        return pa.table({"term": d.dictionary,
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("n", alias_name="count"))
              .to_pandas())
    counts = counts[counts["count"] >= min_count]
    counts = counts.sort_values(["count", "term"],
                                ascending=[False, True]).head(vocab_size)
    counts = counts.reset_index(drop=True)
    counts["word_id"] = np.arange(len(counts), dtype=np.int64)
    return counts


def cooccurrence_counts(ds: Dataset, vocab: pd.DataFrame,
                        text_col: str = "text",
                        window: int = 4) -> pd.DataFrame:
    """Symmetric skip-gram pair counts over vocab terms, distributed:
    per-batch vectorized window pairing + np.unique partial counts, one
    groupby SUM. The result is ≤ V² rows (sparse, usually far fewer) —
    independent of corpus size, hence safe to return as pandas."""
    v = len(vocab)
    vocab_ref = ray.put(dict(zip(vocab["term"], vocab["word_id"])))

    def pair_partials(b: pa.Table) -> pa.Table:
        flat, doc_idx, _ = tokenize_array(b[text_col].combine_chunks())
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(flat) == 0:
            return empty
        w2i = ray.get(vocab_ref)
        d = flat.dictionary_encode()
        uniq_ids = np.array([w2i.get(t, -1) for t in d.dictionary.to_pylist()],
                            dtype=np.int64)
        ids = uniq_ids[np.asarray(d.indices).astype(np.int64)]
        keys = []
        for off in range(1, window + 1):
            a = ids[:-off]
            bb = ids[off:]
            same = doc_idx[:-off] == doc_idx[off:]
            ok = same & (a >= 0) & (bb >= 0)
            if ok.any():
                aa, bbb = a[ok], bb[ok]
                # symmetric: count both (a,b) and (b,a)
                keys.append(aa * v + bbb)
                keys.append(bbb * v + aa)
        if not keys:
            return empty
        u, c = _partial_counts(np.concatenate(keys))
        return pa.table({"key": pa.array(u), "n": pa.array(c)})

    out = (ds.map_batches(pair_partials, batch_format="pyarrow")
           .groupby("key").aggregate(Sum("n", alias_name="count"))
           .to_pandas())
    if "key" not in out.columns:          # no co-occurrences at all
        return pd.DataFrame({"w": pd.Series(dtype=np.int64),
                             "c": pd.Series(dtype=np.int64),
                             "count": pd.Series(dtype=np.int64)})
    out["w"] = out["key"] // v
    out["c"] = out["key"] % v
    return out[["w", "c", "count"]]


def ppmi_svd_embeddings(vocab: pd.DataFrame, pairs: pd.DataFrame,
                        dim: int = 64) -> np.ndarray:
    """PPMI(w,c) = max(0, log(N·n_wc / (n_w·n_c))) factorized by
    truncated SVD; embedding = U_k·sqrt(S_k) (Levy & Goldberg 2014's
    symmetric weighting). Dense V×V on the driver — vocab-bounded."""
    v = len(vocab)
    m = np.zeros((v, v), dtype=np.float64)
    if len(pairs):
        m[pairs["w"].to_numpy(), pairs["c"].to_numpy()] = \
            pairs["count"].to_numpy().astype(np.float64)
    total = m.sum()
    if total == 0:
        return np.zeros((v, dim), dtype=np.float64)
    row = m.sum(axis=1, keepdims=True)
    col = m.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((m * total) / (row * col))
    ppmi = np.where(np.isfinite(pmi), np.maximum(pmi, 0.0), 0.0)
    u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
    k = min(dim, v)
    emb = u[:, :k] * np.sqrt(s[:k])
    if k < dim:
        emb = np.pad(emb, ((0, 0), (0, dim - k)))
    return emb


def train_semantic_artifact(ds: Dataset, artifact_dir: str,
                            text_col: str = "text",
                            vocab_size: int = 2000, min_count: int = 2,
                            window: int = 4, dim: int = 64,
                            version: int | None = None) -> str:
    """Train vocab→PPMI→SVD embeddings over ``ds`` and persist them
    under ``artifact_dir/v{version}/`` (vocab parquet + matrix .npy +
    config json — the same restore-latest layout as
    save_projection_artifact). Returns the versioned path."""
    from .embedding import latest_artifact  # noqa: F401  (layout parity)

    vocab = build_vocab(ds, text_col, vocab_size, min_count)
    pairs = cooccurrence_counts(ds, vocab, text_col, window)
    emb = ppmi_svd_embeddings(vocab, pairs, dim)

    if version is None:
        version = 1 + max(
            (int(d[1:]) for d in os.listdir(artifact_dir)
             if d.startswith("v") and d[1:].isdigit()),
            default=0) if os.path.isdir(artifact_dir) else 1
    path = os.path.join(artifact_dir, f"v{version}")
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "embeddings.npy"), emb)
    vocab[["term", "word_id", "count"]].to_parquet(
        os.path.join(path, "vocab.parquet"), index=False)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"dim": dim, "vocab_size": len(vocab),
                   "window": window, "min_count": min_count,
                   "version": version, "kind": "ppmi_svd"}, f)
    return path


class SemanticEncoder:
    """Actor-pool doc encoder over a trained semantic artifact: restore
    ONCE per actor in __init__ (the models/api.py NNHashEncoder
    restore-latest pattern), vectorized mean-of-word-vectors per batch
    in __call__. OOV-only docs encode to the zero vector."""

    def __init__(self, artifact_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", normalize: bool = True):
        from .embedding import latest_artifact

        path = artifact_dir
        if not os.path.exists(os.path.join(path, "config.json")):
            path = latest_artifact(artifact_dir)
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        self.dim = int(cfg["dim"])
        self.version = int(cfg["version"])
        self.emb = np.load(os.path.join(path, "embeddings.npy"))
        vocab = pd.read_parquet(os.path.join(path, "vocab.parquet"))
        self.w2i = dict(zip(vocab["term"], vocab["word_id"]))
        self.text_col = text_col
        self.id_col = id_col
        self.normalize = normalize

    def _encode(self, content: pa.Array) -> np.ndarray:
        flat, doc_idx, _ = tokenize_array(content)
        n = len(content)
        vec = np.zeros((n, self.dim), dtype=np.float64)
        if len(flat):
            d = flat.dictionary_encode()
            uniq_ids = np.array(
                [self.w2i.get(t, -1) for t in d.dictionary.to_pylist()],
                dtype=np.int64)
            ids = uniq_ids[np.asarray(d.indices).astype(np.int64)]
            ok = ids >= 0
            if ok.any():
                sel = doc_idx[ok]            # sorted (docs contiguous)
                e = self.emb[ids[ok]]
                bounds = np.concatenate(
                    ([0], np.flatnonzero(np.diff(sel)) + 1))
                sums = np.add.reduceat(e, bounds, axis=0)
                cnt = np.diff(np.concatenate((bounds, [len(sel)])))
                vec[sel[bounds]] = sums / cnt[:, None]
        if self.normalize:
            nrm = np.linalg.norm(vec, axis=1, keepdims=True)
            vec = vec / np.maximum(nrm, 1e-30)
        return vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        vec = self._encode(batch[self.text_col].combine_chunks())
        return pa.table({
            "doc_id": batch[self.id_col].combine_chunks(),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vec.reshape(-1), pa.float64()), self.dim),
        })

    def encode_texts(self, texts: list[str]) -> np.ndarray:
        return self._encode(pa.array(texts, pa.string()))

    def word_vector(self, term: str) -> np.ndarray | None:
        i = self.w2i.get(term)
        return None if i is None else self.emb[i]
