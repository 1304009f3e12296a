"""Text → dense-embedding operators (SURVEY.md §2.3 F2–F6).

The reference's most-used stage family is a stateful text→vector
extractor (W2VFeatureExtractor /root/reference/features/
FeatureExtractors.py:77-119, FeatureExtractor_Temp :122-160,
D2VFeatureExtractor :163-188) feeding an encoder that restores a
persisted model in its constructor (NNHashEncoder,
/root/reference/models/api.py:30-78). gensim/TF aren't available (or
public-reproducible), so the public-knowledge equivalents here are:

- ``HashedTextEncoder`` (F2–F5): feature hashing ("hashing trick",
  Weinberger et al. 2009) over kept tokens — bucket = md5_low64(term)
  mod dim, sign from the hash's top bit, tf-weighted, optionally
  L2-normalized. Deterministic, vocabulary-free, and SQL-oracleable
  (DuckDB md5_number_lower), so the text→vector→kNN loop is
  driver-conformance-checked end to end (entry ``text_knn``).
- ``ProjectionEncoder`` (F6): a persisted random-projection artifact
  (projection matrix + config saved to disk) restored ONCE per actor in
  ``__init__`` — the models/api.py restore-latest pattern — encoding
  batches to dense unit vectors ready for knn_lsh / cosine_pairs_lsh.

Both are callable classes for ``map_batches(Cls, concurrency=N)`` actor
pools: state built/loaded in ``__init__``, per-batch vectorized work in
``__call__``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..text import tokenize_array
from .dedup import md5_low64_arrow


def hashed_embedding_batch(batch: pa.Table, dim: int, text_col: str,
                           id_col: str, normalize: bool) -> pa.Table:
    """(doc_id, embedding): tf-weighted signed feature-hash vectors.
    Unnormalized components are small integers (sums of ±1) — exact in
    float64 and summation-order-independent, which is what makes the
    DuckDB oracle bit-identical."""
    content = batch[text_col].combine_chunks()
    flat, doc_idx, doc_lens = tokenize_array(content)
    n = len(content)
    vec = np.zeros((n, dim), dtype=np.float64)
    if len(flat):
        h = md5_low64_arrow(flat)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = 1.0 - 2.0 * ((h >> np.uint64(63)) & np.uint64(1)).astype(np.float64)
        # one flat bincount instead of a 2-D np.add.at scatter
        vec = np.bincount(doc_idx * dim + bucket, weights=sign,
                          minlength=n * dim).reshape(n, dim)
    if normalize:
        nrm = np.linalg.norm(vec, axis=1, keepdims=True)
        vec = vec / np.maximum(nrm, 1e-30)
    return pa.table({
        "doc_id": batch[id_col].combine_chunks(),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vec.reshape(-1), pa.float64()), dim),
    })


class HashedTextEncoder:
    """Actor-pool stage: config held per actor, batches encoded
    vectorized (F2–F5 stateful-extractor shape)."""

    def __init__(self, dim: int = 64, text_col: str = "text",
                 id_col: str = "doc_id", normalize: bool = True):
        self.dim = dim
        self.text_col = text_col
        self.id_col = id_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        return hashed_embedding_batch(batch, self.dim, self.text_col,
                                      self.id_col, self.normalize)

    def encode_texts(self, texts: list[str]) -> np.ndarray:
        """Driver-side helper: encode a few raw strings (e.g. the query)."""
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        out = hashed_embedding_batch(t, self.dim, "text", "doc_id",
                                     self.normalize)
        return np.asarray(out["embedding"].combine_chunks().flatten()
                          ).reshape(len(texts), self.dim)


# ---------------- persisted encoder artifact (F6) ----------------

def save_projection_artifact(artifact_dir: str, dim_in: int = 256,
                             dim_out: int = 32, seed: int = 23,
                             version: int | None = None) -> str:
    """Persist a random-projection encoder artifact under
    ``artifact_dir/v{version}/`` (projection matrix .npy + config json).
    Returns the versioned path. Mirrors the reference's checkpoint
    layout-with-versions that restore_latest scans
    (/root/reference/models/api.py:60-78)."""
    if version is None:
        version = 1 + max(
            (int(d[1:]) for d in os.listdir(artifact_dir)
             if d.startswith("v") and d[1:].isdigit()),
            default=0) if os.path.isdir(artifact_dir) else 1
    path = os.path.join(artifact_dir, f"v{version}")
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim_out, dim_in)) / np.sqrt(dim_out)
    np.save(os.path.join(path, "projection.npy"), planes)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"dim_in": dim_in, "dim_out": dim_out, "seed": seed,
                   "version": version}, f)
    return path


def latest_artifact(artifact_dir: str) -> str:
    """Highest-version artifact subdir (restore-latest semantics)."""
    versions = [int(d[1:]) for d in os.listdir(artifact_dir)
                if d.startswith("v") and d[1:].isdigit()]
    if not versions:
        raise FileNotFoundError(f"no artifact versions in {artifact_dir}")
    return os.path.join(artifact_dir, f"v{max(versions)}")


class ProjectionEncoder:
    """Actor-pool encode stage restoring a persisted artifact ONCE per
    actor (__init__ reads disk, __call__ is pure vectorized math) — the
    NNHashEncoder.encode_batch analog. Pass ``artifact_dir`` (restores
    latest version) or an explicit versioned path."""

    def __init__(self, artifact_dir: str, text_col: str = "text",
                 id_col: str = "doc_id"):
        path = artifact_dir
        if not os.path.exists(os.path.join(path, "config.json")):
            path = latest_artifact(artifact_dir)
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        self.planes = np.load(os.path.join(path, "projection.npy"))
        self.dim_in = int(cfg["dim_in"])
        self.dim_out = int(cfg["dim_out"])
        self.version = int(cfg["version"])
        self.hasher = HashedTextEncoder(self.dim_in, text_col, id_col,
                                        normalize=False)
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashed = self.hasher(batch)
        mat = np.asarray(hashed["embedding"].combine_chunks().flatten()
                         ).reshape(-1, self.dim_in)
        proj = mat @ self.planes.T
        nrm = np.linalg.norm(proj, axis=1, keepdims=True)
        proj = proj / np.maximum(nrm, 1e-30)
        return pa.table({
            "doc_id": hashed["doc_id"],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(proj.reshape(-1), pa.float64()), self.dim_out),
        })
